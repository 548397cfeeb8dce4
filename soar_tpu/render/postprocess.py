"""Image-space post ops on rendered maps (channel-last jnp).

Equivalents of the torch post-processing in the reference renderer:
``depth2normal`` (``renderer/diff_gaussian_rasterizer.py:359-429``) and
``normal2curv`` (``:432-448``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core.camera import Camera, focal_from_fov
from ..core.transforms import safe_normalize


def _pad_edge(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")


def _cross_sum_neighbors(p: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Shared 4-neighborhood machinery for both post ops."""
    pc = p[1:-1, 1:-1] * mask[1:-1, 1:-1]
    up = (p[:-2, 1:-1] - pc) * mask[:-2, 1:-1]
    left = (p[1:-1, :-2] - pc) * mask[1:-1, :-2]
    down = (p[2:, 1:-1] - pc) * mask[2:, 1:-1]
    right = (p[1:-1, 2:] - pc) * mask[1:-1, 2:]
    return up, left, down, right


def depth2normal(
    depth: jnp.ndarray,  # [H, W]
    mask: jnp.ndarray,  # [H, W] bool
    camera: Camera,
    image_size: Tuple[int, int],
) -> jnp.ndarray:
    """Normals from the rendered depth by cross products of backprojected
    neighbor differences (``renderer/diff_gaussian_rasterizer.py:359-429``).

    NOTE the reference divides the x pixel coordinate by fov2focal(FoVy, H)
    and y by fov2focal(FoVx, W) — focals swapped (``:379-384``).  All SOAR
    cameras are square with (near-)equal focals so this is benign; we keep
    the conventional fx/fy pairing.
    """
    H, W = image_size
    fx = focal_from_fov(camera.fovx, W)
    fy = focal_from_fov(camera.fovy, H)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    x = (px - camera.prcppoint[0] * W) * depth / fx
    y = (py - camera.prcppoint[1] * H) * depth / fy
    cam_pos = jnp.stack([x, y, depth], axis=-1)  # [H, W, 3]

    p = _pad_edge(cam_pos)
    m = _pad_edge(mask[..., None].astype(jnp.float32)) > 0.5

    up, left, down, right = _cross_sum_neighbors(p, m.astype(cam_pos.dtype))
    n = (
        jnp.cross(up, left)
        + jnp.cross(right, up)
        + jnp.cross(down, right)
        + jnp.cross(left, down)
    )
    n = safe_normalize(n)
    return n * mask[..., None]


def normal2curv(normal: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Curvature proxy: L1 norm of the 4-neighborhood normal Laplacian
    (``renderer/diff_gaussian_rasterizer.py:432-448``).  normal [H, W, 3],
    mask [H, W] -> [H, W]."""
    n = _pad_edge(normal)
    m = _pad_edge(mask[..., None].astype(jnp.float32))
    up, left, down, right = _cross_sum_neighbors(n, m)
    curv = (up + left + down + right) * mask[..., None]
    return jnp.sum(jnp.abs(curv), axis=-1)
