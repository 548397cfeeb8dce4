"""Rung-A correctness oracle: every pixel composites over ALL surfels.

O(N * H * W) and therefore test-scale only, but it has exactly the semantics
of the reference pipeline (preprocess -> global depth sort -> front-to-back
blend, ``cuda_rasterizer/rasterizer_impl.cu:188-313``) with none of the tile
machinery, making it the golden model for the production tiled renderer.
Fully differentiable through plain autodiff.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from .composite import composite_weights, finalize, splat_alpha
from .preprocess import depth_differencing, preprocess
from .types import GaussianInputs, RasterConfig, RenderOutputs


def _oracle_chunk_renderer(
    g: GaussianInputs,
    camera: Camera,
    image_size: Tuple[int, int],
    bg_color: jnp.ndarray,
    cfg: RasterConfig,
):
    """Shared preprocess + global sort + per-pixel-chunk compositor.

    Returns ``render_chunk(pix[p, 2]) -> (color, normal, depth, opac, T)``
    — the exact reference semantics at ARBITRARY pixel coordinates, which
    lets :func:`rasterize_oracle_at` bound the tiled rasterizer's
    truncation error from a SUBSAMPLE of pixels at production scale
    (full-image oracle cost is O(N*H*W); a 4k-pixel probe is ~1/64th)."""
    H, W = image_size
    pre = preprocess(g, camera, image_size, cfg)

    # Global depth sort, ascending (front-to-back) or descending for the
    # back-surface pass (``rasterizer_impl.cu:269-289``).  Invalid surfels
    # sort last via +inf keys.
    key = jnp.where(pre.valid, pre.depth, jnp.inf)
    if cfg.sort_descending:
        key = jnp.where(pre.valid, -pre.depth, jnp.inf)
    order = jnp.argsort(key)

    xy = pre.xy[order]
    conic = pre.conic[order]
    opac = pre.opacities[order]
    valid = pre.valid[order]
    colors = pre.colors[order]
    normals = pre.normal_view[order]
    depths = pre.depth[order]
    jinv = pre.jinv[order]
    radius = pre.radius[order]

    # Tile-rect membership: the reference only blends a splat into pixels of
    # tiles inside its 3-sigma rect (``auxiliary.h:53-63`` + binning), so a
    # pixel outside the rect never sees the splat even where alpha >= 1/255.
    tile = cfg.tile
    ntx, nty = -(-W // tile), -(-H // tile)
    rect_min_x = jnp.clip(jnp.floor((xy[:, 0] - radius) / tile), 0, ntx)
    rect_min_y = jnp.clip(jnp.floor((xy[:, 1] - radius) / tile), 0, nty)
    rect_max_x = jnp.clip(jnp.floor((xy[:, 0] + radius + tile - 1) / tile), 0, ntx)
    rect_max_y = jnp.clip(jnp.floor((xy[:, 1] + radius + tile - 1) / tile), 0, nty)

    bg = jnp.asarray(bg_color)

    def render_chunk(pchunk):
        d = xy[None, :, :] - pchunk[:, None, :]  # [p, N, 2]
        ptx = jnp.floor(pchunk[:, 0:1] / tile)
        pty = jnp.floor(pchunk[:, 1:2] / tile)
        in_rect = (
            (ptx >= rect_min_x[None])
            & (ptx < rect_max_x[None])
            & (pty >= rect_min_y[None])
            & (pty < rect_max_y[None])
        )
        alpha = splat_alpha(
            d,
            conic[None],
            opac[None],
            valid[None] & in_rect,
            cfg.alpha_clamp,
            cfg.alpha_min,
        )
        weights, t_final = composite_weights(alpha, cfg.transmittance_min)
        if cfg.surface and cfg.perpix_depth:
            pos_dif = depth_differencing(d, jinv[None])  # [p, N, 3]
            depth_k = depths[None] - pos_dif[..., 2]
        else:
            depth_k = jnp.broadcast_to(depths[None], alpha.shape)
        return finalize(
            weights,
            t_final,
            jnp.broadcast_to(colors[None], (pchunk.shape[0],) + colors.shape),
            jnp.broadcast_to(normals[None], (pchunk.shape[0],) + normals.shape),
            depth_k,
            bg,
            cfg.surface,
            cfg.normalize_depth,
        )

    return render_chunk


def rasterize_oracle_at(
    g: GaussianInputs,
    camera: Camera,
    image_size: Tuple[int, int],
    bg_color: jnp.ndarray,
    pix: jnp.ndarray,
    cfg: RasterConfig = RasterConfig(),
):
    """Exact-composite outputs at arbitrary pixel centers ``pix [P, 2]``
    (x, y float coords).  Returns ``(color[P, C], normal[P, 3], depth[P],
    opac[P], T[P])``."""
    render_chunk = _oracle_chunk_renderer(g, camera, image_size, bg_color, cfg)
    return render_chunk(pix)


def rasterize_oracle(
    g: GaussianInputs,
    camera: Camera,
    image_size: Tuple[int, int],
    bg_color: jnp.ndarray,
    cfg: RasterConfig = RasterConfig(),
    pixel_chunk: int = 4096,
) -> RenderOutputs:
    H, W = image_size
    render_chunk = _oracle_chunk_renderer(g, camera, image_size, bg_color, cfg)

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    pix = jnp.stack([px, py], axis=-1).reshape(-1, 2)  # [P, 2]

    P = pix.shape[0]
    pad = (-P) % pixel_chunk
    pix_padded = jnp.pad(pix, ((0, pad), (0, 0)))
    chunks = pix_padded.reshape(-1, pixel_chunk, 2)

    color, normal, depth, opac_out, T = jax.lax.map(render_chunk, chunks)

    C = color.shape[-1]
    color = color.reshape(-1, C)[:P].reshape(H, W, C)
    normal = normal.reshape(-1, 3)[:P].reshape(H, W, 3)
    depth = depth.reshape(-1)[:P].reshape(H, W)
    opac_out = opac_out.reshape(-1)[:P].reshape(H, W)
    T = T.reshape(-1)[:P].reshape(H, W)
    return RenderOutputs(
        color=color, normal=normal, depth=depth, opac=opac_out, transmittance=T
    )
