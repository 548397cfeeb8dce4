"""Posed-avatar view rendering: LBS skinning -> field query -> rasterize.

The functional equivalent of ``DiffGaussian.forward``
(``renderer/diff_gaussian_rasterizer.py:52-318``): pose canonical surfels and
their frames via kNN-blended skinning mats, query the attribute field for
colors/scales/offsets, rasterize a main pass plus a stop-gradient occlusion
pass (front-face-culled), and post-process normals/curvature.

Where the reference launches 14 CUDA rasterizations per step from a Python
loop, here each view render is a single jitted function; batching across
views happens one level up (``soar_tpu.train``) via vmap/shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.transforms import quat_to_rotmat, rotmat_to_quat
from ..field.attribute_field import attribute_field_apply
from ..render import GaussianInputs, RasterConfig, rasterize
from ..render.tiled import rasterize_front_back, rasterize_with_occ
from ..render.postprocess import depth2normal, normal2curv
from ..body.skinning import apply_point_mats, point_skinning_mats
from . import state as S
from .state import AvatarModel, AvatarParams


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static per-call switches (mirrors the renderer Config plus the
    forward() kwargs of the reference)."""

    use_explicit: bool = False  # explicit colors/scales vs attribute field
    # Apply field offsets to the POSED points (pre axis-permute), mirroring
    # ``diff_gaussian_rasterizer.py:107-108``.  Every shipped reference
    # config sets ``renderer.offset: false`` (and the per-frame latent_pose
    # feed into the offsets head is commented out upstream,
    # ``:92 #z=pc.latent_pose[idx]``), so production parity is offset=False;
    # the True path exists for the same config surface the reference exposes.
    offset: bool = False
    gen_view: bool = False  # random novel view: zero root + axis permute
    render_front: bool = True  # False => back-surface pass (sort descending)
    # SOAR surfels composite with opacity forced to 1
    # (``diff_gaussian_rasterizer.py:259``).  The GaussianDreamer 3DGS system
    # instead blends with sigmoid(opacity logits) and needs the render
    # gradient on them for its opacity regularizer + densify/prune stats
    # (``system/gaussian_splatting.py``) — it sets force_opaque=False.
    force_opaque: bool = True
    raster: RasterConfig = RasterConfig()
    # lite mode: skip the occlusion pass and the curvature / depth->normal
    # post ops; render/normal/depth/mask values are IDENTICAL to the full
    # render (used by the split-SDS prelude, which only needs those).
    lite: bool = False
    # both_faces: render the front AND back surface passes from ONE shared
    # preprocess/sort (``render.tiled.rasterize_front_back``); render_view
    # then returns a (front_dict, back_dict) tuple.  Used for the GT
    # normal-F/normal-B supervision pair, which shares a camera.
    both_faces: bool = False


# Axis permutation "+z,+x,+y" applied to gen-view points
# (``renderer/diff_gaussian_rasterizer.py:109, 321-352``): column i of T is
# the unit vector named by the i-th direction; points transform as x @ T and
# frames as T^T @ R.
_PERMUTE_T = jnp.array(
    [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=jnp.float32
)


def query_attributes(params: AvatarParams, model: AvatarModel):
    """Query the canonical attribute field at the (stop-gradient) surfel
    positions — camera-independent, so one query serves every view of a
    training step (``renderer/diff_gaussian_rasterizer.py:88-102``)."""
    return attribute_field_apply(
        params.field, jax.lax.stop_gradient(params.xyz), cfg=model.field_cfg
    )


def posed_gaussians(
    params: AvatarParams,
    model: AvatarModel,
    frame_idx: jnp.ndarray,
    settings: RenderSettings = RenderSettings(),
    attrs: Optional[Dict[str, jnp.ndarray]] = None,
    smpl_override: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[GaussianInputs, jnp.ndarray]:
    """LBS-pose the avatar for one frame and assemble the rasterizer inputs.

    The camera-independent first half of :func:`render_view`, exposed so
    analysis tools (``scripts/bench_truncation.py``) can drive the raw
    rasterizer / oracle on the EXACT production inputs.  Returns
    ``(GaussianInputs, occ_colors)``."""
    points = params.xyz
    rot = S.get_rotation(params)

    # LBS: per-point rigid mats from the frame's pose; gen views zero the
    # root orientation/translation (``utils/smpl.py:597-599``).
    live_A = S.live_affines(
        model, frame_idx, zero_root=settings.gen_view, override=smpl_override
    )
    pt_mats = point_skinning_mats(model.skin, live_A)

    if attrs is None:
        # Camera-independent: callers rendering several views per step
        # should compute this once via ``query_attributes`` and pass it in
        # (the reference re-queries tcnn per view, 7x/step).
        attrs = query_attributes(params, model)

    posed = apply_point_mats(pt_mats, points)
    if settings.offset:
        posed = posed + attrs["offsets"]

    # Rotate surfel frames by the (blended, only approximately rigid)
    # skinning rotation exactly as the reference does — multiply matrices
    # first, then convert the product back to a normalized quaternion
    # (``renderer/diff_gaussian_rasterizer.py:110-114``).
    R_surf = quat_to_rotmat(rot)
    R_out = pt_mats[..., :3, :3] @ R_surf
    if settings.gen_view:
        posed = posed @ _PERMUTE_T
        R_out = _PERMUTE_T.T @ R_out
    rot_out = rotmat_to_quat(R_out)  # already unit-norm + sign-canonical

    if settings.use_explicit:
        scale1 = S.get_scaling(params)  # [N, 1]
        colors = S.get_colors(params)
    else:
        scale1 = attrs["scales"]
        colors = attrs["shs"]
    scales = jnp.concatenate([scale1, scale1, jnp.zeros_like(scale1)], axis=-1)

    # Opacities forced to 1 (``renderer/diff_gaussian_rasterizer.py:259``)
    # for SOAR surfels; sigmoid logits for the 3DGS (GaussianDreamer) mode.
    if settings.force_opaque:
        opac = jnp.ones_like(params.opacity[:, 0])
    else:
        opac = S.get_opacity(params)[:, 0]

    g_main = GaussianInputs(
        means3d=posed,
        quats=rot_out,
        scales=scales,
        opacities=opac,
        colors=colors,
    )
    occ_colors = jnp.broadcast_to(S.get_occ(params), (points.shape[0], 3))
    return g_main, occ_colors


def render_view(
    params: AvatarParams,
    model: AvatarModel,
    camera: Camera,
    image_size: Tuple[int, int],
    bg_color: jnp.ndarray,
    frame_idx: jnp.ndarray,
    settings: RenderSettings = RenderSettings(),
    attrs: Optional[Dict[str, jnp.ndarray]] = None,
    smpl_override: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    g_main, occ_colors = posed_gaussians(
        params, model, frame_idx, settings, attrs, smpl_override
    )

    main_cfg = dataclasses.replace(
        settings.raster,
        render_front=False,
        sort_descending=False,
        # Back-surface pass: composite farthest-first WITHOUT re-sorting —
        # equivalent to the reference's descending sort
        # (``rasterizer_impl.cu:269-289``) but sharing the ascending
        # preprocess/sort with the occlusion pass.
        compose_reverse=not (settings.render_front or settings.both_faces),
    )

    def post(out, occ_out):
        mask = out.opac > 1e-5
        # Outside the mask, keep values but stop gradients
        # (``rendered_normal[~normal_mask] = ...detach()``, ``:292-294``).
        normal = jnp.where(
            mask[..., None], out.normal, jax.lax.stop_gradient(out.normal)
        )
        # Flip y/z of the view-space normal (``:295-296``).
        normal = normal * jnp.array([1.0, -1.0, -1.0])
        normal01 = (normal + 1.0) / 2.0

        if settings.lite:
            return {
                "render": out.color,
                "normal": normal01,
                "depth": out.depth,
                "mask": out.opac,
                "overflow": out.overflow,
            }

        curv = normal2curv(normal, jax.lax.stop_gradient(out.opac) > 1e-5)

        dn = depth2normal(
            out.depth,
            jax.lax.stop_gradient(out.opac) > 1e-5,
            camera,
            image_size,
        )
        dn = dn * jnp.array([1.0, -1.0, -1.0])
        dn01 = (dn + 1.0) / 2.0

        return {
            "render": out.color,
            "normal": normal01,
            "depth": out.depth,
            "pred_normal": dn01,
            "mask": out.opac,
            "occ": occ_out.color,
            "curv": curv,
            "overflow": out.overflow,
            # [N] per-surfel culling survival (the reference's radii > 0
            # ``update_filter``) — consumed by the GaussianDreamer system's
            # densification-stat accumulation.
            "visible": out.visible,
        }

    if settings.both_faces:
        # Front + back + occ from ONE preprocess/sort; the occ image is
        # identical for both faces (same camera/colors/ascending order), so
        # it is computed once and shared.
        front, back, occ_out = rasterize_front_back(
            g_main, occ_colors, camera, image_size, bg_color, main_cfg
        )
        return post(front, occ_out), post(back, occ_out)
    if settings.lite:
        out = rasterize(g_main, camera, image_size, bg_color, main_cfg)
        return post(out, None)
    # Main + occlusion pass share one preprocess/sort (the back-surface
    # main composite just walks each tile's run farthest-first).
    out, occ_out = rasterize_with_occ(
        g_main, occ_colors, camera, image_size, bg_color, main_cfg
    )
    return post(out, occ_out)
