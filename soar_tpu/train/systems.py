"""Alternative training systems: GaussianDreamer and MVDream.

Rebuilds of the two secondary systems the plugin registers alongside the
SOAR surfel system:

- :func:`make_gaussiandreamer_step` — the text-to-3D baseline
  (``system/gaussian_splatting.py:18-224``): random multiview renders, SDS +
  position/opacity/scales/tv regularizers, and the densify/prune driver
  (``update_states``, the ONLY caller of the densification machinery).
- :func:`make_mvdream_step` — the earlier SOAR variant
  (``system/gaussian_mvdream.py:29-475``); structurally the SOAR step with
  text-only guidance (no image prompt) and an SD-step-ratio timestep schedule
  (``:123-135``) expressed through ``GuidanceConfig.max_step_percent``.
  Build it by calling ``soar_tpu.train.trainer.make_train_step`` with a
  text-only ``guidance_fn`` — no separate implementation is needed, which is
  the point of the functional design.

TPU notes: densification is NOT inside the jitted loss step (it rewrites
state); it runs as its own jitted call every ``densify_interval`` steps,
operating on the static-capacity ``alive``-mask state
(:mod:`soar_tpu.avatar.densify`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..avatar import RenderSettings, render_view
from ..avatar import state as S
from ..avatar.densify import (
    DensifyState,
    accumulate_stats,
    adaptive_densify,
    adaptive_prune,
)
from ..avatar.state import AvatarModel, AvatarParams
from ..core.camera import camera_from_c2w
from ..data.cameras import CameraSampleConfig, sample_multiview_cameras
from ..render.types import RasterConfig
from . import losses as L
from .config import LossWeights, StageConfig, TrainConfig, scheduled


@dataclasses.dataclass(frozen=True)
class DreamerConfig:
    n_views: int = 4
    image_size: Tuple[int, int] = (256, 256)
    densify_from: int = 100
    densify_until: int = 2000
    densify_interval: int = 100
    prune_from: int = 300
    prune_interval: int = 100
    densify_grad_threshold: float = 0.0001
    min_opac_prune: float = 0.05
    extent: float = 2.0
    loss: LossWeights = LossWeights(
        sds=0.1, position=1.0, opacity=1e-3, scales=1e-3, tv=0.0
    )
    raster: RasterConfig = RasterConfig(surface=False, perpix_depth=False)
    cameras: CameraSampleConfig = CameraSampleConfig()


def make_gaussiandreamer_step(
    model: AvatarModel,
    cfg: DreamerConfig,
    opt: optax.GradientTransformation,
    guidance_fn: Callable,
):
    """Returns (loss_step, maintain) where ``loss_step(params, opt_state,
    dstate, key, step)`` does render+SDS+regularizers+update and accumulates
    densification stats, and ``maintain(params, dstate, key, step)`` applies
    densify/prune on the configured schedule (host-side cadence, jitted
    bodies)."""
    # 3DGS blending: sigmoid opacities composite (and receive the render
    # gradient the opacity regularizer + densify stats depend on) — unlike
    # the SOAR surfel renderer's forced-opaque mode
    # (``system/gaussian_splatting.py`` vs ``diff_gaussian_rasterizer.py:259``).
    settings = RenderSettings(
        use_explicit=True, gen_view=True, force_opaque=False, raster=cfg.raster
    )

    def loss_fn(params, point_weights, key, step):
        mdl = dataclasses.replace(
            model, skin=model.skin._replace(point_weights=point_weights)
        )
        k_cam, k_g = jax.random.split(key)
        c2w, fovy = sample_multiview_cameras(k_cam, cfg.cameras)
        cams = jax.vmap(
            lambda c, f: camera_from_c2w(c, f, f, znear=0.1, zfar=100.0)
        )(c2w, fovy)
        out = jax.vmap(
            lambda cam: render_view(
                params, mdl, cam, cfg.image_size, jnp.zeros(3),
                jnp.asarray(0), settings,
            )
        )(cams)

        metrics = {}
        loss = jnp.zeros(())
        w = cfg.loss

        sds = guidance_fn(out["render"], c2w=c2w, key=k_g, step=step)
        if isinstance(sds, dict):
            # build_guidance closures return {"loss_sds": ..., ...} like
            # the SOAR trainer consumes; plain callables return a scalar.
            sds = sds["loss_sds"]
        loss = loss + scheduled(w.sds, step) * sds
        metrics["loss_sds"] = sds

        pos = jnp.sqrt(jnp.sum(params.xyz**2, -1) + 1e-12)
        loss = loss + scheduled(w.position, step) * jnp.mean(pos)

        scaling = S.get_scaling(params)
        loss = loss + scheduled(w.opacity, step) * jnp.sum(
            jax.lax.stop_gradient(scaling[:, 0:1]) * S.get_opacity(params)
        )
        loss = loss + scheduled(w.scales, step) * jnp.sum(scaling)
        if isinstance(w.tv, tuple) or w.tv > 0:
            loss = loss + scheduled(w.tv, step) * L.tv_loss(out["render"])
        metrics["loss"] = loss
        # Per-surfel visibility across the view batch — the reference's
        # ``radii > 0`` update_filter (``surfel_base.py:1113-1136``): stats
        # only accumulate (and denom only counts) views that actually saw
        # the point, so never-rendered surfels keep denom==0 and are pruned.
        metrics["_visible"] = jnp.any(out["visible"], axis=0)
        return loss, metrics

    @jax.jit
    def loss_step(params, opt_state, dstate: DensifyState, point_weights, key, step):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, point_weights, key, step
        )
        visible = metrics.pop("_visible")
        dstate = accumulate_stats(
            dstate,
            grads.xyz,
            grads.scaling,
            params.opacity,
            visible & dstate.alive,
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dstate, metrics

    densify_jit = jax.jit(
        lambda p, d, k: adaptive_densify(
            p, d, k,
            grad_threshold=cfg.densify_grad_threshold,
            extent=cfg.extent,
            surface=cfg.raster.surface,
        )
    )
    prune_jit = jax.jit(
        lambda p, d: adaptive_prune(
            p, d, min_opacity=cfg.min_opac_prune, extent=cfg.extent
        )
    )

    def maintain(params, dstate, point_weights, key, step: int):
        """``update_states`` cadence (``surfel_base.py:1197-1230``).  Returns
        (params, dstate, point_weights): densify/prune change the point set,
        so the skinning weights are refreshed (the reference recomputes them
        every forward, ``utils/smpl.py:611``)."""
        from ..body.skinning import knn_idw_weights

        changed = False
        if cfg.densify_from <= step <= cfg.densify_until and (
            step % cfg.densify_interval == 0
        ):
            params, dstate = densify_jit(params, dstate, key)
            changed = True
        if cfg.prune_from <= step <= cfg.densify_until and (
            step % cfg.prune_interval == 0
        ):
            params, dstate = prune_jit(params, dstate)
            changed = True
        if changed:
            point_weights = knn_idw_weights(
                params.xyz, model.skin.cano_vertices, model.body.lbs_weights
            )
        return params, dstate, point_weights

    return loss_step, maintain


def make_mvdream_step(
    model,
    cfg: TrainConfig,
    stage: StageConfig,
    opt,
    guidance_fn,
    gen_size: Tuple[int, int] = (512, 512),
    gt_size: Tuple[int, int] = (512, 512),
    normal_size: Tuple[int, int] = (512, 512),
    **kwargs,
):
    """The MVDream system == the SOAR step with text-only guidance
    (``system/gaussian_mvdream.py:29-475``); the render sizes default to the
    reference's 512px so the constructor is callable as-is (exercised by
    ``tests/test_sds_train.py::test_make_mvdream_step``)."""
    from .trainer import make_train_step

    return make_train_step(
        model,
        cfg,
        stage,
        opt,
        gen_size=gen_size,
        gt_size=gt_size,
        normal_size=normal_size,
        guidance_fn=guidance_fn,
        **kwargs,
    )
