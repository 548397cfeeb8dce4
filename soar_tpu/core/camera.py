"""Cameras and projection math.

All matrices here use the standard column-vector convention:
``p_cam = w2c @ [p_world, 1]``, ``p_clip = full_proj @ [p_world, 1]``.  The
reference stores transposed matrices because its CUDA kernel reads row-vector
layouts (``cuda_rasterizer/auxiliary.h:65-84``); we keep clean math internally
and there is no transposed storage anywhere in this package.

The reference's camera-convention chain, reproduced exactly:
  1. dataset flips rows 1:3 of the loaded w2c (``data/uncond_multiview.py:235``,
     handled in :mod:`soar_tpu.data`),
  2. ``convert_pose`` flips the y/z columns of c2w (OpenGL -> COLMAP/OpenCV,
     ``renderer/gaussian_batch_renderer.py:401-406``),
  3. projection with optional principal point
     (``renderer/gaussian_batch_renderer.py:409-436``),
  4. pixel mapping with principal-point shift
     (``cuda_rasterizer/auxiliary.h:42-46`` ``ndc2Pix``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Pytree of per-view camera arrays.

    Image width/height are deliberately NOT part of this pytree — they must be
    static under jit, so render entry points take an ``image_size=(H, W)``
    argument.  Mirrors the reference ``Camera`` NamedTuple
    (``geometry/gaussian_base.py:210-230``) minus the torch tensors.
    """

    fovx: jnp.ndarray  # [] radians
    fovy: jnp.ndarray  # [] radians
    w2c: jnp.ndarray  # [4, 4] world -> camera (column-vector convention)
    full_proj: jnp.ndarray  # [4, 4] world -> clip
    campos: jnp.ndarray  # [3] camera center in world space
    prcppoint: jnp.ndarray  # [2] principal point as a fraction of (W, H)


def convert_pose(c2w: jnp.ndarray) -> jnp.ndarray:
    """Flip the y and z camera axes: ``C2W @ diag(1,-1,-1,1)``
    (``renderer/gaussian_batch_renderer.py:401-406``)."""
    flip = jnp.array([1.0, -1.0, -1.0, 1.0], dtype=c2w.dtype)
    return c2w * flip[None, :]


def projection_matrix(
    znear: float,
    zfar: float,
    fovx: jnp.ndarray,
    fovy: jnp.ndarray,
    cxcy: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    img_wh: Optional[Tuple[int, int]] = None,
    z_sign: float = 1.0,
) -> jnp.ndarray:
    """Perspective projection with optional principal point.

    Mirrors ``get_projection_matrix_gaussian``
    (``renderer/gaussian_batch_renderer.py:409-436``): note P[2,2]/P[2,3] use
    the reference's (slightly non-standard) depth mapping so clip-space w is
    the camera z.  Specifically P[2,2] = z_sign*(zfar+znear)/(zfar-znear)
    (``:425``) — THIS repo's reference, not vanilla 3DGS's
    zfar/(zfar-znear); clip z maps znear -> znear/(zfar-znear), used only as
    a monotonic z-buffer key downstream.
    """
    tan_half_fovy = jnp.tan(fovy / 2.0)
    tan_half_fovx = jnp.tan(fovx / 2.0)

    top = tan_half_fovy * znear
    right = tan_half_fovx * znear

    if cxcy is not None and img_wh is not None:
        cx, cy = cxcy
        w, h = img_wh
        p02 = (2.0 * cx - w) / w
        p12 = (2.0 * cy - h) / h
    else:
        p02 = jnp.zeros(())
        p12 = jnp.zeros(())

    zero = jnp.zeros(())
    P = jnp.stack(
        [
            jnp.stack([znear / right, zero, p02 + zero, zero]),
            jnp.stack([zero, znear / top, p12 + zero, zero]),
            jnp.stack(
                [
                    zero,
                    zero,
                    zero + z_sign * (zfar + znear) / (zfar - znear),
                    zero - (zfar * znear) / (zfar - znear),
                ]
            ),
            jnp.stack([zero, zero, zero + z_sign, zero]),
        ]
    )
    return P


def camera_from_c2w(
    c2w: jnp.ndarray,
    fovx: jnp.ndarray,
    fovy: jnp.ndarray,
    znear: float = 0.1,
    zfar: float = 100.0,
    cxcy: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    img_wh: Optional[Tuple[int, int]] = None,
    prcppoint: Optional[jnp.ndarray] = None,
) -> Camera:
    """Build a :class:`Camera` the way ``get_cam_info_gaussian_cxcy`` does
    (``renderer/gaussian_batch_renderer.py:438-471``): convert_pose, invert,
    compose with the projection."""
    c2w_cv = convert_pose(c2w)
    # Inverse of a rigid transform, explicit to stay cheap under vmap.
    R = c2w_cv[:3, :3]
    t = c2w_cv[:3, 3]
    w2c = jnp.eye(4, dtype=c2w.dtype)
    w2c = w2c.at[:3, :3].set(R.T)
    w2c = w2c.at[:3, 3].set(-R.T @ t)
    P = projection_matrix(znear, zfar, fovx, fovy, cxcy=cxcy, img_wh=img_wh)
    full_proj = P @ w2c
    campos = t  # camera center in world space (un-flipped translation)
    if prcppoint is None:
        prcppoint = jnp.array([0.5, 0.5], dtype=c2w.dtype)
    return Camera(
        fovx=jnp.asarray(fovx),
        fovy=jnp.asarray(fovy),
        w2c=w2c,
        full_proj=full_proj,
        campos=campos,
        prcppoint=prcppoint,
    )


def focal_from_fov(fov: jnp.ndarray, pixels) -> jnp.ndarray:
    """``fov2focal`` (``renderer/diff_gaussian_rasterizer.py:355``)."""
    return pixels / (2.0 * jnp.tan(fov / 2.0))


def fov_from_focal(focal: jnp.ndarray, pixels) -> jnp.ndarray:
    return 2.0 * jnp.arctan(pixels / (2.0 * focal))


def ndc2pix(v: jnp.ndarray, size, prcp: jnp.ndarray) -> jnp.ndarray:
    """``cuda_rasterizer/auxiliary.h:42-46``."""
    return ((v + 1.0) * size - 1.0) * 0.5 + size * (prcp - 0.5)


def get_ray_directions(
    H: int,
    W: int,
    focal: Tuple[jnp.ndarray, jnp.ndarray],
    principal: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Per-pixel ray directions in the OpenGL camera frame (x right, y up,
    looking down -z), pixel centers at +0.5.

    Matches the threestudio helper consumed at
    ``data/uncond_multiview.py:18-31`` (direction = ((i-cx)/fx, -(j-cy)/fy, -1)).
    """
    fx, fy = focal
    if principal is None:
        cx, cy = W / 2.0, H / 2.0
    else:
        cx, cy = principal
    i = jnp.arange(W, dtype=jnp.float32) + 0.5
    j = jnp.arange(H, dtype=jnp.float32) + 0.5
    ii, jj = jnp.meshgrid(i, j, indexing="xy")
    dirs = jnp.stack(
        [(ii - cx) / fx, -(jj - cy) / fy, -jnp.ones_like(ii)], axis=-1
    )
    return dirs  # [H, W, 3]


def get_rays(
    directions: jnp.ndarray, c2w: jnp.ndarray, normalize: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate camera-frame directions into world space; origins from c2w."""
    rays_d = jnp.einsum("...ij,hwj->...hwi", c2w[..., :3, :3], directions)
    if normalize:
        rays_d = rays_d / jnp.maximum(
            jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12
        )
    rays_o = jnp.broadcast_to(c2w[..., None, None, :3, 3], rays_d.shape)
    return rays_o, rays_d


def look_at_c2w(
    camera_position: jnp.ndarray,
    center: jnp.ndarray,
    up: jnp.ndarray,
) -> jnp.ndarray:
    """OpenGL-style c2w: columns (right, up, -lookat | position), as built by
    the dataset sampler (``data/uncond_multiview.py:594-607``)."""
    lookat = center - camera_position
    lookat = lookat / jnp.maximum(jnp.linalg.norm(lookat, axis=-1, keepdims=True), 1e-12)
    right = jnp.cross(lookat, up)
    right = right / jnp.maximum(jnp.linalg.norm(right, axis=-1, keepdims=True), 1e-12)
    up2 = jnp.cross(right, lookat)
    up2 = up2 / jnp.maximum(jnp.linalg.norm(up2, axis=-1, keepdims=True), 1e-12)
    R = jnp.stack([right, up2, -lookat], axis=-1)
    c2w = jnp.concatenate([R, camera_position[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], c2w.dtype), c2w.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([c2w, bottom], axis=-2)
