"""Z-buffer triangle mesh rasterization (pure XLA, no gradients needed).

Implements the MISSING ``soar.rendering`` module of the reference: both
``preproc/compute_normal.py:24`` and ``preproc/utils.py:16`` import
``get_proj_mat`` / ``render_mesh`` from it, but the module does not exist in
the release (SURVEY §2.4).  Call-site contract reconstructed from
``compute_normal.py:156-192``:

    get_proj_mat(K, img_wh, znear) -> proj
    render_mesh(verts, faces, w2c, proj, img_wh)
        -> {"normal": [H, W, 3] in [0, 1], "mask": [H, W, 1]}

Replaces nvdiffrast's GL rasterizer with the same tile-binned design as the
splat renderer: project triangles, bin their screen bboxes into 16x16 tiles
with a static per-tile capacity, then a dense per-pixel edge-function +
z-buffer arg-min.  Projection/pixel conventions deliberately match
:mod:`soar_tpu.core.camera` so preproc output feeds training consistently.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import ndc2pix, projection_matrix
from .tilegrid import (
    cdiv,
    depth_bits_for,
    quantize_depth,
    slot_tiles,
    tile_ranges,
    untile as _untile,
)


def get_proj_mat(
    K: jnp.ndarray, img_wh: Tuple[int, int], znear: float = 0.1, zfar: float = 1000.0
) -> jnp.ndarray:
    """Projection from pinhole intrinsics, principal point included
    (consumed like ``compute_normal.py:156-160``)."""
    W, H = img_wh
    fovx = 2.0 * jnp.arctan(W / (2.0 * K[0, 0]))
    fovy = 2.0 * jnp.arctan(H / (2.0 * K[1, 1]))
    return projection_matrix(
        znear, zfar, fovx, fovy, cxcy=(K[0, 2], K[1, 2]), img_wh=(W, H)
    )


def _vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    vn = jnp.zeros_like(verts)
    for i in range(3):
        vn = vn.at[faces[:, i]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("img_wh", "tile", "max_per_tile", "dup_side"))
def render_mesh(
    verts: jnp.ndarray,  # [V, 3] world space
    faces: jnp.ndarray,  # [F, 3] int32
    w2c: jnp.ndarray,  # [4, 4] world->camera (column-vector convention)
    proj: jnp.ndarray,  # [4, 4] from get_proj_mat
    img_wh: Tuple[int, int],
    tile: int = 16,
    max_per_tile: int = 64,
    dup_side: int = 8,
) -> Dict[str, jnp.ndarray]:
    W, H = img_wh
    ntx, nty = cdiv(W, tile), cdiv(H, tile)
    NT = ntx * nty
    F = faces.shape[0]

    full_proj = proj @ w2c
    ones = jnp.ones_like(verts[:, :1])
    v_h = jnp.concatenate([verts, ones], axis=-1)
    clip = v_h @ full_proj.T
    ndc = clip[:, :3] / jnp.maximum(clip[:, 3:4], 1e-8)
    vx = ndc2pix(ndc[:, 0], W, 0.5)
    vy = ndc2pix(ndc[:, 1], H, 0.5)
    vz = (v_h @ w2c.T)[:, 2]  # view-space depth (output)
    # Z-test key: NDC depth (screen-affine, so plain barycentric interpolation
    # is exact).  Using the PROJECTED z honors the reference's back-surface
    # trick of flipping the projection's 3rd row (``compute_normal.py:176``):
    # flipped ndc-z reverses the arg-min, rendering the far surface.
    vkey = ndc[:, 2]
    vnorm = _vertex_normals(verts, faces)

    px = vx[faces]  # [F, 3]
    py = vy[faces]
    pz = vz[faces]
    pk = vkey[faces]
    fnorm = vnorm[faces]  # [F, 3, 3]

    valid = jnp.all(pz > 1e-4, axis=-1)

    # Screen bbox -> tile rect, capped at dup_side^2 tiles per face.
    min_x = jnp.clip(jnp.floor(jnp.min(px, -1) / tile), 0, ntx).astype(jnp.int32)
    min_y = jnp.clip(jnp.floor(jnp.min(py, -1) / tile), 0, nty).astype(jnp.int32)
    max_x = jnp.clip(
        jnp.floor((jnp.max(px, -1) + tile) / tile), 0, ntx
    ).astype(jnp.int32)
    max_y = jnp.clip(
        jnp.floor((jnp.max(py, -1) + tile) / tile), 0, nty
    ).astype(jnp.int32)

    S = dup_side
    tile_id = slot_tiles(S, min_x, min_y, max_x, max_y, valid, ntx, NT)

    # Pack (tile, z-key) so the within-tile order is NEAREST-first (by the
    # same vkey the arg-min z-test uses — under the flipped back-surface
    # projection vkey is negated, so truncation then keeps the FARTHEST
    # faces, exactly the ones that pass's arg-min needs).  Without depth in
    # the key the first-K gather kept the lowest-INDEX faces — an arbitrary
    # subset that silently corrupted the z-buffer wherever a tile binned
    # more than max_per_tile faces (dense SMPL-X head/hand regions at
    # bbox-crop resolution).
    depth_bits = depth_bits_for(NT)
    face_key = jnp.min(jnp.where(valid[:, None], pk, jnp.inf), axis=-1)
    dq = quantize_depth(face_key, valid, depth_bits)
    key = (tile_id.astype(jnp.uint32) << depth_bits) | dq[:, None]
    face_idx = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.int32)[:, None], (F, S * S)
    )
    sorted_key, sorted_idx = jax.lax.sort_key_val(
        key.reshape(-1), face_idx.reshape(-1)
    )
    sorted_tile = (sorted_key >> depth_bits).astype(jnp.int32)
    starts, counts = tile_ranges(sorted_tile, NT)

    K = max_per_tile
    k_ar = jnp.arange(K, dtype=jnp.int32)
    entry = jnp.minimum(starts[:, None] + k_ar[None, :], sorted_idx.shape[0] - 1)
    slot_valid = k_ar[None, :] < jnp.minimum(counts, K)[:, None]
    gidx = sorted_idx[entry]  # [NT, K]

    # Capacity canaries (mirrors ``tiled.bin_and_sort``): "dropped" counts
    # per-tile entries past K — with nearest-first ordering these are the
    # FARTHEST faces, which the arg-min z-test ignores, so moderate counts
    # are benign for the front pass and symmetric for the flipped back
    # pass; "capped" counts faces whose bbox exceeded the dup_side grid
    # (real holes — raise dup_side).
    dropped = jnp.sum(jnp.maximum(counts - K, 0))
    capped = jnp.sum(
        (((max_x - min_x) > S) | ((max_y - min_y) > S)) & valid
    )
    overflow = jnp.stack([dropped, capped]).astype(jnp.int32)

    gx = px[gidx]  # [NT, K, 3]
    gy = py[gidx]
    gz = pz[gidx]
    gk = pk[gidx]

    # Per-tile pixel coords [NT, P].
    tx0 = (jnp.arange(NT, dtype=jnp.int32) % ntx) * tile
    ty0 = (jnp.arange(NT, dtype=jnp.int32) // ntx) * tile
    lx = jnp.tile(jnp.arange(tile, dtype=jnp.float32), tile)
    ly = jnp.repeat(jnp.arange(tile, dtype=jnp.float32), tile)
    pxf = tx0[:, None] + lx[None, :]
    pyf = ty0[:, None] + ly[None, :]

    # Edge functions / barycentrics [NT, P, K].
    x0, x1, x2 = gx[..., 0], gx[..., 1], gx[..., 2]
    y0, y1, y2 = gy[..., 0], gy[..., 1], gy[..., 2]
    X = pxf[:, :, None]
    Y = pyf[:, :, None]
    area = (x1 - x0)[:, None] * (y2 - y0)[:, None] - (y1 - y0)[:, None] * (
        x2 - x0
    )[:, None]
    w0 = (x1[:, None] - X) * (y2[:, None] - Y) - (y1[:, None] - Y) * (
        x2[:, None] - X
    )
    w1 = (x2[:, None] - X) * (y0[:, None] - Y) - (y2[:, None] - Y) * (
        x0[:, None] - X
    )
    w2 = (x0[:, None] - X) * (y1[:, None] - Y) - (y0[:, None] - Y) * (
        x1[:, None] - X
    )
    denom = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
    inside = (
        (b0 >= 0.0)
        & (b1 >= 0.0)
        & (b2 >= 0.0)
        & (jnp.abs(area) > 1e-12)
        & slot_valid[:, None, :]
    )

    # Z-test on the screen-affine NDC depth; view-space depth (perspective-
    # correct via 1/z interpolation) is the reported depth.
    zkey = (
        b0 * gk[..., 0][:, None]
        + b1 * gk[..., 1][:, None]
        + b2 * gk[..., 2][:, None]
    )
    zkey = jnp.where(inside, zkey, jnp.inf)
    inv_z = (
        b0 / gz[..., 0][:, None]
        + b1 / gz[..., 1][:, None]
        + b2 / gz[..., 2][:, None]
    )
    depth = 1.0 / jnp.maximum(inv_z, 1e-8)
    depth = jnp.where(inside, depth, jnp.inf)

    best = jnp.argmin(zkey, axis=-1)  # [NT, P]
    hit = jnp.take_along_axis(zkey, best[..., None], axis=-1)[..., 0] < jnp.inf

    def pick(arr):  # [NT, P, K] -> [NT, P]
        return jnp.take_along_axis(arr, best[..., None], axis=2)[..., 0]

    bsel = jnp.stack([pick(b0), pick(b1), pick(b2)], axis=-1)  # [NT, P, 3]
    best_face = jnp.take_along_axis(gidx, best, axis=1)  # [NT, P] face ids
    nsel = fnorm[best_face]  # [NT, P, 3verts, 3]
    normal = jnp.einsum("tpv,tpvc->tpc", bsel, nsel)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )
    normal = jnp.where(hit[..., None], (normal + 1.0) / 2.0, 0.0)
    depth_out = jnp.where(
        hit, jnp.take_along_axis(depth, best[..., None], -1)[..., 0], 0.0
    )

    def untile(img_flat, ch):
        return _untile(img_flat, ch, ntx, nty, tile, H, W)

    return {
        "normal": untile(normal, 3),
        "mask": untile(hit[..., None].astype(jnp.float32), 1),
        "depth": untile(depth_out[..., None], 1)[..., 0],
        # [2] int32 (dropped-past-K, bbox-capped) — see canary comment above.
        "overflow": overflow,
    }
