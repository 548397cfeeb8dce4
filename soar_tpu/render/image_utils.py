"""Multi-camera visibility, pruning helpers, and occupancy-grid splatting.

Pure-XLA rebuilds of ``utils/image_utils.py`` (world2scrn :311-369,
mask_prune :455-470, grid_prune :472-484, depth2wpos, reproject_depth) and of
two CUDA utility kernels (``utils/cuda_utils.cu``):

- ``gaussian2occgrid`` (:779-875, consumed by ``to_occ_grid``,
  ``surfel_base.py:1150-1195``) becomes a scatter-add of surfel alpha into
  voxels — a ``segment_sum`` over voxel ids instead of atomicAdd;
- ``contour_padding`` (:226-301, consumed at ``image_utils.py:317``) becomes
  max-pool mask dilation.

The remaining kernels in that extension (point2tsdf, tsdf_fusion,
spatial_grouping, reprojection_flow) are unused in active reference paths
(SURVEY §2.2) and are deliberately not ported.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera, focal_from_fov, ndc2pix


def contour_padding(mask: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Dilate a [H, W] (or [H, W, 1]) mask by ``pad`` pixels (max-pool)."""
    if pad <= 0:
        return mask
    squeeze = mask.ndim == 2
    m = mask if not squeeze else mask[..., None]
    m4 = m[None].astype(jnp.float32)
    out = jax.lax.reduce_window(
        m4,
        -jnp.inf,
        jax.lax.max,
        (1, 2 * pad + 1, 2 * pad + 1, 1),
        (1, 1, 1, 1),
        "SAME",
    )[0]
    out = out > 0
    return out[..., 0] if squeeze else out


def world2scrn(
    xyz: jnp.ndarray,  # [N, 3]
    cams: Camera,  # batched Camera pytree (leading axis = #cams)
    masks: Optional[jnp.ndarray],  # [C, H, W] float or None (all-visible)
    image_size: Tuple[int, int],
    pad: int = 0,
    znear: float = 0.1,
    zfar: float = 100.0,
):
    """Project points into every camera (``image_utils.py:311-369``).

    Returns (cam_pos [C,N,3], ndc [C,N,2], in_mask [C,N] bool,
    out_view [C,N] bool)."""
    H, W = image_size
    ones = jnp.ones_like(xyz[:, :1])
    xh = jnp.concatenate([xyz, ones], -1)  # [N, 4]

    cam_pos = jnp.einsum("cij,nj->cni", cams.w2c, xh)[..., :3]
    out_z = (cam_pos[..., 2] <= znear) | (cam_pos[..., 2] > zfar)

    proj = jnp.einsum("cij,nj->cni", cams.full_proj, xh)
    ndc3 = proj[..., :3] / (proj[..., 3:] + 1e-7)
    out_xy = (
        (ndc3[..., 0] <= -1)
        | (ndc3[..., 0] > 1)
        | (ndc3[..., 1] <= -1)
        | (ndc3[..., 1] > 1)
    )
    out_view = out_xy | out_z

    px = ndc2pix(ndc3[..., 0], W, cams.prcppoint[:, None, 0])
    py = ndc2pix(ndc3[..., 1], H, cams.prcppoint[:, None, 1])
    ndc = jnp.stack(
        [px / W * 2.0 - 1.0, py / H * 2.0 - 1.0], axis=-1
    )

    if masks is None:
        in_mask = jnp.ones(out_view.shape, bool)
    else:
        if pad > 0:
            masks = jax.vmap(lambda m: contour_padding(m > 0, pad))(masks)
        ix = jnp.clip(px, 0, W - 1).astype(jnp.int32)
        iy = jnp.clip(py, 0, H - 1).astype(jnp.int32)
        cam_idx = jnp.arange(masks.shape[0])[:, None]
        in_mask = masks[cam_idx, iy, ix] > 0

    return cam_pos, ndc, in_mask, out_view


def mask_prune(
    pts: jnp.ndarray,
    cams: Camera,
    masks: Optional[jnp.ndarray],
    image_size: Tuple[int, int],
    pad: int = 4,
) -> jnp.ndarray:
    """Keep points that are never visibly outside every camera mask
    (``image_utils.py:455-470``; driver ``surfel_base.py:1138-1148``)."""
    _, _, in_mask, out_view = world2scrn(pts, cams, masks, image_size, pad)
    remove = jnp.any(~(in_mask | out_view), axis=0)
    unseen = jnp.all(out_view, axis=0)
    return ~(remove | unseen)


def gaussian_to_occgrid(
    xyz: jnp.ndarray,  # [N, 3]
    opacity: jnp.ndarray,  # [N]
    grid_dim: Tuple[int, int, int],
    shift: jnp.ndarray,  # [3] (added before scaling)
    scale: jnp.ndarray,  # scalar or [3]
    splat_radius: int = 1,
) -> jnp.ndarray:
    """Occupancy grid by scatter-adding surfel opacity into voxels (+ a cube
    neighborhood) — the atomicAdd kernel (``cuda_utils.cu:779-875``) as a
    segment-sum."""
    D = jnp.asarray(grid_dim)
    base = jnp.floor((xyz + shift) * scale).astype(jnp.int32)  # [N, 3]
    offs = jnp.arange(-splat_radius, splat_radius + 1)
    ox, oy, oz = jnp.meshgrid(offs, offs, offs, indexing="ij")
    cube = jnp.stack([ox, oy, oz], -1).reshape(-1, 3)  # [K, 3]
    cells = base[:, None, :] + cube[None]  # [N, K, 3]
    ok = jnp.all((cells >= 0) & (cells < D), axis=-1)
    flat = (
        cells[..., 0] * grid_dim[1] * grid_dim[2]
        + cells[..., 1] * grid_dim[2]
        + cells[..., 2]
    )
    total = grid_dim[0] * grid_dim[1] * grid_dim[2]
    flat = jnp.where(ok, flat, total)  # dropped slot
    vals = jnp.broadcast_to(opacity[:, None], flat.shape)
    occ = jnp.zeros((total + 1,)).at[flat.reshape(-1)].add(vals.reshape(-1))
    return occ[:-1].reshape(grid_dim)


def grid_prune(
    grid: jnp.ndarray,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    pts: jnp.ndarray,
    thrsh: float = 1.0,
) -> jnp.ndarray:
    """Keep points inside sufficiently occupied voxels
    (``image_utils.py:472-484``)."""
    D = jnp.asarray(grid.shape)
    cord = jnp.floor((pts + shift) * scale).astype(jnp.int32)
    out = jnp.any((cord <= 0) | (cord > D - 1), axis=-1)
    cord = jnp.clip(cord, 0, D - 1)
    val = grid[cord[:, 0], cord[:, 1], cord[:, 2]]
    return (val > thrsh) & ~out


def depth2wpos(
    depth: jnp.ndarray,  # [H, W]
    mask: jnp.ndarray,  # [H, W]
    camera: Camera,
    image_size: Tuple[int, int],
) -> jnp.ndarray:
    """Back-project a depth map to world positions
    (``image_utils.py`` depth2wpos)."""
    H, W = image_size
    fx = focal_from_fov(camera.fovx, W)
    fy = focal_from_fov(camera.fovy, H)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    x = (px - camera.prcppoint[0] * W) * depth / fx
    y = (py - camera.prcppoint[1] * H) * depth / fy
    cam_pos = jnp.stack([x, y, depth], -1)
    R = camera.w2c[:3, :3]
    t = camera.w2c[:3, 3]
    wpos = (cam_pos - t) @ R  # R^T (p - t), row-vec form
    return wpos * mask[..., None]


def reproject_depth(
    depth: jnp.ndarray,
    cam0: Camera,
    mask0: jnp.ndarray,
    cams: Camera,
    image_size: Tuple[int, int],
):
    """NDC + visibility of cam0's backprojected depth in other cameras
    (``image_utils.py:385-398``)."""
    wpos = depth2wpos(depth, mask0, cam0, image_size).reshape(-1, 3)
    _, ndc, in_mask, out_view = world2scrn(wpos, cams, None, image_size)
    return ndc, in_mask & ~out_view
