"""Per-surfel screen-space preprocessing (vectorized over all N surfels).

The pure-XLA, branch-free equivalent of ``preprocessCUDA``
(``cuda_rasterizer/forward.cu:204-385``): projection, frustum/back-face/
grazing culling (as a validity mask instead of early returns), view-space
normals, 3D->2D EWA covariance with low-pass, screen radius, and the
per-pixel-depth local homography ``Jinv``
(``cuda_rasterizer/auxiliary.h:291-397``).

Everything is dense [N]-shaped math on the VPU; culled surfels carry
``valid=False`` and are routed to a sentinel tile by the binning stage.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core.camera import Camera, focal_from_fov, ndc2pix
from ..core.transforms import quat_to_rotmat
from .types import GaussianInputs, Preprocessed, RasterConfig


def _ewa_cov2d(
    p_view: jnp.ndarray,  # [N, 3]
    cov3d: jnp.ndarray,  # [N, 3, 3]
    w_rot: jnp.ndarray,  # [3, 3] rotation part of w2c
    focal: Tuple[jnp.ndarray, jnp.ndarray],
    tan_fov: Tuple[jnp.ndarray, jnp.ndarray],
    low_pass: float,
) -> jnp.ndarray:
    """EWA projection of the 3D covariance to screen space
    (``forward.cu:74-139``): local affine J at the (fov-clamped) view point,
    cov2d = J W Σ Wᵀ Jᵀ + low_pass · I, returned as (a, b, c) packing
    [[a, b], [b, c]]."""
    fx, fy = focal
    tanx, tany = tan_fov
    tz = p_view[:, 2]
    tx = jnp.clip(p_view[:, 0] / tz, -1.3 * tanx, 1.3 * tanx) * tz
    ty = jnp.clip(p_view[:, 1] / tz, -1.3 * tany, 1.3 * tany) * tz

    zero = jnp.zeros_like(tz)
    # J rows: d(pix)/d(view). Third row unused (zeroed in the reference).
    J = jnp.stack(
        [
            jnp.stack([fx / tz, zero, -fx * tx / (tz * tz)], axis=-1),
            jnp.stack([zero, fy / tz, -fy * ty / (tz * tz)], axis=-1),
        ],
        axis=-2,
    )  # [N, 2, 3]
    JW = J @ w_rot  # [N, 2, 3]
    cov = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)  # [N, 2, 2]
    a = cov[:, 0, 0] + low_pass
    b = cov[:, 0, 1]
    c = cov[:, 1, 1] + low_pass
    return jnp.stack([a, b, c], axis=-1)


def _local_homo(
    p_view: jnp.ndarray,  # [N, 3]
    n_view: jnp.ndarray,  # [N, 3]
    ax0_view: jnp.ndarray,  # [N, 3] view-space local x axis
    ax1_view: jnp.ndarray,  # [N, 3] view-space local y axis
    fx: jnp.ndarray,
    fy: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-surfel inverse local homography between the screen plane and the
    surfel's tangent plane (``cuda_rasterizer/auxiliary.h:291-388``).

    Returns (jinv [N, 10], grazing [N] bool).  Layout matches the reference:
    jinv[:4] = 2x2 screen->tangent Jacobian (row-major [du0/dx, du0/dy,
    du1/dx, du1/dy] scaled by S_fix/Svp), jinv[4:7] = u0, jinv[7:10] = u1.
    """
    s_fix = 1000.0
    svp = (fx + fy) / 2.0

    px = p_view[:, 0] / p_view[:, 2]
    py = p_view[:, 1] / p_view[:, 2]
    ones = jnp.ones_like(px)

    def norm3(v):
        mod = jnp.maximum(jnp.linalg.norm(v, axis=-1), 1e-8)
        return v / mod[:, None], mod

    dir_x0, mod_x0 = norm3(jnp.stack([px + 1.0 / s_fix, py, ones], axis=-1))
    dir_x1, mod_x1 = norm3(jnp.stack([px, py + 1.0 / s_fix, ones], axis=-1))

    prj_x0 = jnp.sum(dir_x0 * n_view, axis=-1)
    prj_x1 = jnp.sum(dir_x1 * n_view, axis=-1)
    # Extreme projection angles produce unusable tangent frames; cull
    # (threshold 0.01, ``auxiliary.h:317-321``).  Note the reference divides
    # the already-normalized dot by the direction norm again; replicated.
    grazing = (jnp.abs(prj_x0 / mod_x0) < 0.01) | (jnp.abs(prj_x1 / mod_x1) < 0.01)

    t_temp = jnp.sum(p_view * n_view, axis=-1)
    safe = lambda x: jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)
    t_x0 = t_temp / safe(prj_x0)
    t_x1 = t_temp / safe(prj_x1)
    xu0 = dir_x0 * t_x0[:, None] - p_view
    xu1 = dir_x1 * t_x1[:, None] - p_view

    # Tangent frame = the surfel's own axes in view space
    # (``auxiliary.h:357-363`` overrides the Surface-Splatting construction).
    u0, u1 = ax0_view, ax1_view

    scale = (svp / s_fix)
    j00 = jnp.sum(xu0 * u0, axis=-1) / scale
    j01 = jnp.sum(xu1 * u0, axis=-1) / scale
    j10 = jnp.sum(xu0 * u1, axis=-1) / scale
    j11 = jnp.sum(xu1 * u1, axis=-1) / scale

    jinv = jnp.concatenate(
        [jnp.stack([j00, j01, j10, j11], axis=-1), u0, u1], axis=-1
    )
    return jinv, grazing


def depth_differencing(d: jnp.ndarray, jinv: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel position offset on the surfel plane for a screen offset d
    (``auxiliary.h:390-397``).  d: [..., 2], jinv: [..., 10] -> [..., 3]."""
    du0 = d[..., 0] * jinv[..., 0] + d[..., 1] * jinv[..., 1]
    du1 = d[..., 0] * jinv[..., 2] + d[..., 1] * jinv[..., 3]
    return du0[..., None] * jinv[..., 4:7] + du1[..., None] * jinv[..., 7:10]


def preprocess(
    g: GaussianInputs,
    camera: Camera,
    image_size: Tuple[int, int],
    cfg: RasterConfig,
) -> Preprocessed:
    H, W = image_size
    fx = focal_from_fov(camera.fovx, W)
    fy = focal_from_fov(camera.fovy, H)
    tanx = jnp.tan(camera.fovx * 0.5)
    tany = jnp.tan(camera.fovy * 0.5)

    ones = jnp.ones_like(g.means3d[:, :1])
    p_h = jnp.concatenate([g.means3d, ones], axis=-1)  # [N, 4]

    p_hom = p_h @ camera.full_proj.T
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]
    p_view = (p_h @ camera.w2c.T)[:, :3]

    x_pix = ndc2pix(p_proj[:, 0], W, camera.prcppoint[0])
    y_pix = ndc2pix(p_proj[:, 1], H, camera.prcppoint[1])
    xy = jnp.stack([x_pix, y_pix], axis=-1)

    # Frustum test with 20% border expansion over the full image
    # (``auxiliary.h:146-171``; patch bbox defaults to the whole frame).
    # z >= cfg.near rather than the reference's z >= 0: see the
    # RasterConfig.near docstring (EWA explodes on the 0..znear band).
    ex, ey = 0.2 * W, 0.2 * H
    valid = (
        (p_view[:, 2] >= cfg.near)
        & (x_pix >= -ex)
        & (x_pix < W + ex)
        & (y_pix >= -ey)
        & (y_pix < H + ey)
    )

    R = quat_to_rotmat(g.quats)  # [N, 3, 3], columns are local axes
    w_rot = camera.w2c[:3, :3]

    if cfg.surface:
        n_view = R[..., :, 2] @ w_rot.T  # world normal -> view space
        ax0_view = R[..., :, 0] @ w_rot.T
        ax1_view = R[..., :, 1] @ w_rot.T
        view_dot = jnp.sum(p_view * n_view, axis=-1)
        if cfg.render_front:
            # Cull back-facing surfels (``forward.cu:287-289``,
            # ``auxiliary.h:173-208``: culled when dot > -0.01).
            valid = valid & (view_dot <= -0.01)
        if cfg.perpix_depth:
            jinv, grazing = _local_homo(p_view, n_view, ax0_view, ax1_view, fx, fy)
            valid = valid & ~grazing
        else:
            jinv = jnp.zeros((g.means3d.shape[0], 10), g.means3d.dtype)
    else:
        n_view = jnp.zeros_like(g.means3d)
        view_dot = jnp.full((g.means3d.shape[0],), -1.0, g.means3d.dtype)
        jinv = jnp.zeros((g.means3d.shape[0], 10), g.means3d.dtype)

    # 3D covariance Σ = R S² Rᵀ with z-scale zeroed for flat surfels
    # (``forward.cu:162-202``).
    s = g.scales * cfg.scale_modifier
    if cfg.surface:
        s = s.at[:, 2].set(0.0)
    RS = R * s[:, None, :]  # columns scaled
    cov3d = RS @ jnp.swapaxes(RS, -1, -2)

    cov = _ewa_cov2d(p_view, cov3d, w_rot, (fx, fy), (tanx, tany), cfg.low_pass)
    det = cov[:, 0] * cov[:, 2] - cov[:, 1] ** 2
    valid = valid & (det != 0.0)
    det_inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    conic = jnp.stack(
        [cov[:, 2] * det_inv, -cov[:, 1] * det_inv, cov[:, 0] * det_inv], axis=-1
    )

    mid = 0.5 * (cov[:, 0] + cov[:, 2])
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))
    valid = valid & (radius > 0.0)

    return Preprocessed(
        valid=valid,
        xy=xy,
        depth=p_view[:, 2],
        conic=conic,
        radius=radius,
        normal_view=n_view,
        view_dot=view_dot,
        jinv=jinv,
        colors=g.colors,
        opacities=g.opacities,
    )
