"""Two-stage training: pure-functional jitted step.

Functional rebuild of ``SurfelMVDreamSystem.training_step``
(``system/gaussian_surfel_mvdream.py:87-474``).  One jitted function renders
the 4 novel ("gen") SDS views plus the three GT passes (RGB / front-normal /
back-normal), evaluates every explicit loss, and applies one Adam update —
where the reference drives 14 separate CUDA rasterizations, two backward
passes and a Python optimizer loop per step.

SDS guidance plugs in through ``guidance_fn`` (None disables it, matching
BASELINE configs that train without SDS); its gradient is modulated by
exp(-3*occ) via :func:`scale_gradient` instead of a torch backward hook
(``gaussian_surfel_mvdream.py:26-30, 212-254``).

Multi-chip: the gen-view axis is vmapped and can be sharded over a
``jax.sharding.Mesh`` axis; surfel state replicates and XLA inserts the
gradient all-reduce (see ``soar_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..avatar import RenderSettings, render_view
from ..avatar import state as S
from ..avatar.renderer import query_attributes
from ..avatar.optim import make_optimizer
from ..avatar.state import AvatarModel, AvatarParams
from ..core.camera import Camera, camera_from_c2w, get_ray_directions, get_rays
from ..data.cameras import (
    CameraSampleConfig,
    sample_head_cameras,
    sample_multiview_cameras,
)
from ..render.types import RasterConfig
from . import losses as L
from .background import apply_random_aug, background_color, init_background
from .config import StageConfig, TrainConfig, scheduled


class TrainState(NamedTuple):
    params: AvatarParams
    bg_params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def scale_gradient(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Value-preserving gradient scaling: forward x, backward dL/dx * w —
    the functional form of the reference's ``register_hook`` occ modulation
    (``gaussian_surfel_mvdream.py:26-30, 213-218``)."""
    w = jax.lax.stop_gradient(w)
    return x * w + jax.lax.stop_gradient(x * (1.0 - w))


def init_train_state(
    params: AvatarParams,
    cfg: TrainConfig,
    seed: int = 0,
    stage: Optional[StageConfig] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    optim_cfg = stage.optim if (stage is not None and stage.optim) else cfg.optim
    opt = make_optimizer(params, optim_cfg)
    bg = init_background(jax.random.PRNGKey(seed + 7))
    state = TrainState(
        params=params,
        bg_params=bg,
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    # Strip weak_type from every leaf: init leaves built from python
    # scalars (jnp.full / scalar ops) carry weak_type=True, the updated
    # leaves a step returns are strong, and jit treats that as a NEW input
    # signature — measured as TWO full retraces of the 105 MB train-step
    # executable over iterations 1-2 (minutes of cold tunnel compile per
    # run, and the bench's mysterious 40 s "tenancy" first batch).
    state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.dtype(x.dtype)), state
    )
    return state, opt


def gen_camera_config(cfg: TrainConfig, nv: int) -> CameraSampleConfig:
    """Gen-view camera distribution from the train config — every sampling
    knob the reference's ``random_camera`` dataset block exposes
    (``uncond_multiview.py:430-607``) must pass through here."""
    return CameraSampleConfig(
        n_view=nv,
        elevation_range=cfg.elevation_range,
        azimuth_range=cfg.azimuth_range,
        fovy_range=cfg.fovy_range,
        camera_distance_range=cfg.camera_distance_range,
        zoom_range=cfg.zoom_range,
        relative_radius=cfg.relative_radius,
    )


def make_train_step(
    model: AvatarModel,
    cfg: TrainConfig,
    stage: StageConfig,
    opt: optax.GradientTransformation,
    gen_size: Tuple[int, int],
    gt_size: Tuple[int, int],
    normal_size: Tuple[int, int],
    raster: RasterConfig = RasterConfig(),
    raster_gen: Optional[RasterConfig] = None,
    raster_gt: Optional[RasterConfig] = None,
    guidance_fn: Optional[Callable] = None,
    use_explicit: bool = False,
    n_views: Optional[int] = None,
    has_normals: bool = True,
    has_normal_B: bool = True,
    shard_views: Optional[Callable] = None,
    shard_gt: Optional[Callable] = None,
    lpips_fn: Optional[Callable] = None,
    lpips_via_batch: bool = False,
    split_sds: bool = False,
    sds_via_params: bool = False,
    remat_gen: Optional[bool] = None,
    remat_gt: Optional[bool] = None,
    gen_chunk: Optional[int] = None,
):
    """Build the jitted training step for one stage.

    The returned function:  (state, batch, key) -> (state, metrics)
    where batch holds per-frame GT arrays + Camera pytrees (see
    :func:`make_gt_batch`).

    ``guidance_fn(inp, c2w, step, key, ref_rgb, ref_mask, comp_bg, ref_ip) ->
    {"loss_sds": scalar, ...}`` receives the occ-weighted render stack
    [V, H, W, 3], the sampled gen-view c2w [V, 4, 4] (ImageDream camera
    conditioning), the per-frame reference image/mask, the first view's
    neural background, and optionally precomputed ip tokens; build one with
    :func:`soar_tpu.guidance.build.build_guidance`.

    ``split_sds=True`` (requires a build_guidance guidance_fn) keeps only
    the gradient half of SDS (resize + VAE encode + MSE-to-target) inside
    the train step; the frozen-UNet target comes in as ``batch["sds_target"]``,
    produced by ``train_step.sds_prelude(state, batch, key)`` (re-renders the
    gen views forward-only and encodes latents — same RNG, identical values)
    followed by ``guidance_fn.compute_target``.  This is the functional
    mirror of the reference's separate SDS backward
    (``gaussian_surfel_mvdream.py:465-469``) and keeps each XLA program
    small enough for the axon remote-compile transport.
    """
    nv = n_views or cfg.n_views
    # remat default: only when SDS guidance shares HBM with the step (the
    # diffusion weights leave no room for saved composite intermediates);
    # without guidance the un-rematted step is ~40% faster.
    if remat_gen is None:
        remat_gen = guidance_fn is not None
    if remat_gt is None:
        remat_gt = remat_gen
    # Selective remat: save the rasterizer's ~12 MB/view post-sort per-tile
    # gathers (named in ``render/tiled.py``) so the backward recompute skips
    # preprocess binning and the 3M-element sort entirely; only the cheap
    # [tiles, pixels, K] per-pixel expansion is rematerialized.
    raster_policy = jax.checkpoint_policies.save_only_these_names(
        "raster_gather",
        "raster_gidx",
        "raster_slot_valid",
        "raster_overflow",
        "raster_occ_gather",
    )

    def remat(f):
        return jax.checkpoint(f, policy=raster_policy)
    # ``raster_gen``/``raster_gt`` override the shared config per render
    # path.  Measured on the real chip (bench_trainstep A/B, same tenancy
    # window): the two-tier slot budget speeds every render in isolation
    # AND the guidance-free step (~+10%), but the vmapped gen renders
    # inside the HBM-tight SPLIT-SDS program (resident diffusion weights
    # + separate prelude) ran ~13% SLOWER two-tiered — so split mode keeps
    # the single-tier gen grid (fat_budget=0).  Under the FUSED production
    # mode the sign flips back: two-tier gen measured 1.086 vs 1.038
    # steps/s (round 4), so only split_sds forces single-tier.
    if raster_gen is None:
        raster_gen = (
            dataclasses.replace(raster, fat_budget=0)
            if (guidance_fn is not None and split_sds)
            else raster
        )
    gen_settings = RenderSettings(
        use_explicit=use_explicit, gen_view=True, raster=raster_gen
    )
    gt_settings = RenderSettings(
        use_explicit=use_explicit, gen_view=False,
        raster=raster if raster_gt is None else raster_gt,
    )
    cam_cfg = gen_camera_config(cfg, nv)
    w = stage.loss
    # Back-surface supervision is gated like the reference's
    # ``lambda_normal_B > 0.0 and "gt_normal_B" in batch``
    # (``gaussian_surfel_mvdream.py:363``): FS datasets ship no back
    # normals (``uncond_multiview.py`` FS sets gt_normal_B = None and the
    # _fs configs zero the lambda). Statically off -> the reversed
    # back-face composite is never traced.
    nB_w_on = isinstance(w.normal_B, (tuple, list)) or float(w.normal_B) != 0.0
    use_nB = has_normals and has_normal_B and nB_w_on

    def gen_pass(params, bg_params, batch, key, attrs, settings=None):
        """Shared gen-view computation: key split, camera draw (+head
        mixing), V renders, neural-bg composite.  Used by both ``loss_fn``
        and the split-SDS ``prelude`` so the two see byte-identical RNG
        (the prelude passes lite render settings — identical values for
        render/mask/normal, minus the occ pass and curvature post ops)."""
        settings = gen_settings if settings is None else settings
        k_cam, k_head, k_hflag, k_bgaug, k_rand, k_sds = jax.random.split(key, 6)
        frame_idx = batch["frame_idx"]

        # ---- gen views (vmapped over the view axis; shardable) ----
        c2w, fovy = sample_multiview_cameras(k_cam, cam_cfg)
        if cfg.head_prob > 0.0:
            # With prob head_prob the gen batch uses close-up "head" cameras.
            # The reference draws head_flag = random() < 0.4 and samples these
            # cameras every step (``gaussian_surfel_mvdream.py:91``,
            # ``gaussian_batch_renderer.py:264-276``) but the surfel renderer
            # swallows head_c2w/head_flag in ``**kwargs`` — the older MVDream
            # system (``gaussian_mvdream.py:138-177``) shows the intended
            # consumption.  Here the intended behavior is implemented.
            head_c2w, head_fovy = sample_head_cameras(k_head, nv)
            use_head = jax.random.uniform(k_hflag) < cfg.head_prob
            c2w = jnp.where(use_head, head_c2w, c2w)
            fovy = jnp.where(use_head, head_fovy, fovy)
        gen_cams = jax.vmap(
            lambda c, f: camera_from_c2w(c, f, f, znear=0.1, zfar=100.0)
        )(c2w, fovy)
        if shard_views is not None:
            # Constrain the view axis onto the device mesh; GSPMD shards the
            # vmapped render and all-reduces the parameter gradients.
            gen_cams = shard_views(gen_cams)

        def render_gen(cam):
            return render_view(
                params,
                model,
                cam,
                gen_size,
                jnp.zeros(3),
                frame_idx,
                settings,
                attrs=attrs,
            )

        # Batched render over the view axis — single-chip AND sharded.  The
        # round-1 rasterizer hit a catastrophic XLA-TPU scatter-lowering
        # cliff under vmap (commit 1f9b4e5 unrolled views to dodge it); the
        # packed-key-sort + dense-composite redesign has no scatters left,
        # and on the real chip the batched backward now measures FASTER
        # than unrolling (scripts/bench_vmap_render.py: batch-4 = 0.36x of
        # 4x unrolled; batch-1 = 1.07x of one unrolled render, so the
        # GSPMD per-device program is sound too).
        #
        # remat: the composite's [V, NT, P, K] intermediates are ~GBs at
        # 512px x 4 views if saved for the backward; rematerializing the
        # render trades a fwd recompute (cheap VPU work) for that HBM —
        # without it the SDS-on step OOMs next to the 3 GB of resident
        # diffusion weights.  gen_chunk additionally bounds the LIVE view
        # count (lax.map processes chunks sequentially, fwd and bwd), for
        # steps that must coexist with the diffusion weights in HBM.
        fn = remat(render_gen) if remat_gen else render_gen
        if shard_views is None and gen_chunk is not None and gen_chunk < nv:
            gen = jax.lax.map(fn, gen_cams, batch_size=gen_chunk)
        else:
            gen = jax.vmap(fn)(gen_cams)

        # Neural-bg composite over the gen renders
        # (``renderer/gaussian_batch_renderer.py:262, 330-332``).
        Hg, Wg = gen_size
        focal = 0.5 * Hg / jnp.tan(0.5 * fovy)

        def rays_for(c, f):
            dirs = get_ray_directions(Hg, Wg, (f, f))
            _, rays_d = get_rays(dirs, c, normalize=True)
            return rays_d

        rays_d = jax.vmap(rays_for)(c2w, focal)
        bg_rgb = background_color(bg_params, rays_d)
        bg_rgb = apply_random_aug(bg_rgb, k_bgaug, cfg.invert_bg_prob)
        comp_rgb = gen["render"] + (1.0 - gen["mask"][..., None]) * bg_rgb
        return {
            "gen": gen,
            "comp_rgb": comp_rgb,
            "c2w": c2w,
            "fovy": fovy,
            "bg_rgb": bg_rgb,
            "k_rand": k_rand,
            "k_sds": k_sds,
        }

    def loss_fn(params, bg_params, batch, key, step, gparams=None):
        frame_idx = batch["frame_idx"]

        # One field query serves all 7 renders of this step (the reference
        # re-runs tcnn per rasterization).
        attrs = None if use_explicit else query_attributes(params, model)

        gv = gen_pass(params, bg_params, batch, key, attrs)
        gen, comp_rgb, c2w = gv["gen"], gv["comp_rgb"], gv["c2w"]
        bg_rgb, k_rand, k_sds = gv["bg_rgb"], gv["k_rand"], gv["k_sds"]

        # ---- GT passes ----
        rand_bg = jax.random.uniform(k_rand, (3,))
        # GT renders, rematerialized like the gen pass (same HBM argument:
        # each 512px render otherwise saves ~0.5-1 GB of composite
        # intermediates for the backward).
        def _gt_render(size, sett):
            def f(p, a, cam, bg, fi):
                out = render_view(p, model, cam, size, bg, fi, sett, attrs=a)
                if shard_gt is not None:
                    # Row-shard the single-camera GT pass over the mesh:
                    # GSPMD propagates the constraint back through the
                    # untile into the [NT, pixels, K] composite (the bulk
                    # of the pass), partitioning it over tile rows
                    # (``parallel.views.row_sharder``; SURVEY §2.5's
                    # "3 GT passes").
                    out = shard_gt(out)
                return out

            return remat(f) if remat_gt else f

        gt = _gt_render(gt_size, gt_settings)(
            params, attrs, batch["gt_cam"], rand_bg, frame_idx
        )
        if has_normals:
            # The normal-F/normal-B supervision pair shares one camera, so
            # both faces (plus the occ pass) composite from ONE shared
            # preprocess/sort (``RenderSettings.both_faces``) — the
            # reference runs two full CUDA rasterizations with opposite
            # sort orders (``gaussian_surfel_mvdream.py:334-341``).
            if use_nB:
                gt_nF, gt_nB = _gt_render(
                    normal_size,
                    dataclasses.replace(gt_settings, both_faces=True),
                )(params, attrs, batch["normal_cam"], jnp.ones(3), frame_idx)
            else:
                gt_nF = _gt_render(normal_size, gt_settings)(
                    params, attrs, batch["normal_cam"], jnp.ones(3), frame_idx
                )

        metrics = {}
        loss = jnp.zeros(())

        def C(v):
            return scheduled(v, step)

        # --- explicit losses (``gaussian_surfel_mvdream.py:259-460``) ---
        mask = batch["gt_mask"] > 1e-5
        gt_rgb_blended = batch["gt_rgb"] * batch["gt_mask"][..., None] + rand_bg * (
            1.0 - batch["gt_mask"][..., None]
        )

        loss_recon = 0.8 * L.masked_l1(
            gt["render"], batch["gt_rgb"], mask
        ) + 0.2 * (1.0 - L.ssim(gt["render"], gt_rgb_blended))
        loss = loss + C(w.recon) * loss_recon
        metrics["loss_recon"] = loss_recon

        loss_mask = jnp.mean(jnp.abs(gt["mask"] - batch["gt_mask"]))
        loss = loss + C(w.mask) * loss_mask
        metrics["loss_mask"] = loss_mask

        # lpips_via_batch: the VGG16 variables ride in
        # ``batch["lpips_params"]`` as a jit ARGUMENT (lpips_fn signature
        # (a, b, variables)) — closure-captured kernels would bake ~56 MB
        # of constants into the executable (PERFORMANCE.md item 19).
        if lpips_fn is not None and lpips_via_batch:
            _lpips_raw = lpips_fn
            lp = lambda a, b: _lpips_raw(a, b, batch["lpips_params"])  # noqa: E731
        else:
            lp = lpips_fn

        if has_normals:
            nmask = batch["gt_normal_mask"] > 1e-5
            loss_nF = 0.2 * L.cos_loss(
                gt_nF["normal"], batch["gt_normal_F"], nmask, thrsh=0.0
            )
            if use_nB:
                loss_nB = 0.2 * L.cos_loss(
                    gt_nB["normal"], batch["gt_normal_B"], nmask, thrsh=0.0
                )
            if lpips_fn is not None:
                # masked-normal LPIPS, coefficient 1 inside the normal
                # lambdas (``gaussian_surfel_mvdream.py:342-393``): inputs
                # are [0,1] normals times the normal mask, shifted to
                # [-1,1].  Reference quirk kept exactly: the FRONT pass
                # multiplies by the raw float alpha mask, the BACK pass by
                # the BINARIZED mask (``normal_mask_float = (mask >
                # 1e-5).float()``, ``:364,377-387``) — they differ at
                # fractional silhouette-edge alphas.
                nm_raw = batch["gt_normal_mask"][..., None]
                nm_bin = nmask[..., None].astype(nm_raw.dtype)

                def nlp(pred01, gt01, nm):
                    return lp(
                        (pred01 * nm - 0.5) * 2.0, (gt01 * nm - 0.5) * 2.0
                    )

                loss_nF = loss_nF + nlp(
                    gt_nF["normal"], batch["gt_normal_F"], nm_raw
                )
                if use_nB:
                    loss_nB = loss_nB + nlp(
                        gt_nB["normal"], batch["gt_normal_B"], nm_bin
                    )
            loss = loss + C(w.normal_F) * loss_nF
            metrics["loss_normal_F"] = loss_nF
            if use_nB:
                loss = loss + C(w.normal_B) * loss_nB
                metrics["loss_normal_B"] = loss_nB

                # normal-mask supervision is NESTED inside the reference's
                # ``lambda_normal_B > 0 and "gt_normal_B" in batch`` branch
                # (``gaussian_surfel_mvdream.py:394-399``): FS runs (which
                # zero lambda_normal_B) compute NO normal-mask loss.
                loss_nmask = jnp.mean(
                    jnp.abs(gt_nF["mask"] - batch["gt_normal_mask"])
                )
                loss = loss + C(w.normal_mask) * loss_nmask
                metrics["loss_normal_mask"] = loss_nmask

        # VGG/LPIPS RGB loss, lambda_vgg > 0 only in the _fs configs
        # (``gaussian_surfel_mvdream.py:401-410``).  Deviation: the reference
        # nests this under ``lambda_normal_B > 0`` — which the _fs configs
        # set to 0, silently disabling the vgg term they enable.  Here it is
        # an independent term, gated only by its own weight (statically:
        # two 512px VGG16 forwards are not worth tracing for a 0 weight).
        vgg_on = isinstance(w.vgg, (tuple, list)) or float(w.vgg) != 0.0
        if lpips_fn is not None and vgg_on:
            loss_vgg = lp(
                (gt["render"] - 0.5) * 2.0, (gt_rgb_blended - 0.5) * 2.0
            )
            loss = loss + C(w.vgg) * loss_vgg
            metrics["loss_vgg"] = loss_vgg

        # occ supervision: visible (masked) pixels should predict occ -> 1
        # (``gaussian_surfel_mvdream.py:412-417``).
        occ_gt = gt["occ"][..., 0]
        m = mask.astype(occ_gt.dtype)
        loss_occ = jnp.sum((1.0 - occ_gt) * m) / jnp.maximum(jnp.sum(m), 1.0)
        loss = loss + C(w.occ) * loss_occ
        metrics["loss_occ"] = loss_occ

        # normal consistency: rendered vs depth-derived normals
        # (``gaussian_surfel_mvdream.py:429-453``).
        loss_nc = L.cos_loss(
            gt["pred_normal"], gt["normal"], thrsh=np.pi / 10000.0
        )
        gen_nc = L.cos_loss(
            gen["pred_normal"], gen["normal"], thrsh=np.pi / 10000.0
        )
        after_sds = (step > stage.sds_start).astype(loss_nc.dtype)
        loss_nc = (loss_nc + after_sds * gen_nc) / (1.0 + after_sds)
        nc_w = C(w.normal_consistency) + 0.1 * jnp.minimum(
            2.0 * step / 2000.0, 1.0
        )
        loss = loss + nc_w * loss_nc
        metrics["loss_normal_consistency"] = loss_nc

        loss_curv = jnp.mean(jnp.abs(gen["curv"]))
        loss = loss + C(w.curv) * loss_curv
        metrics["loss_curv"] = loss_curv

        if use_explicit:
            scales_mean = jnp.mean(S.get_scaling(params))
        else:
            scales_mean = jnp.mean(attrs["scales"])
        loss = loss + C(w.scales) * scales_mean
        metrics["loss_scales"] = scales_mean

        # eps-safe norm: at init xyz == original_pos and the exact L2 norm has
        # a NaN gradient at 0 (torch's norm subgradient there is 0).
        dvec = params.xyz - model.original_pos
        loss_delta = jnp.mean(jnp.sqrt(jnp.sum(dvec * dvec, -1) + 1e-12))
        loss = loss + C(w.delta) * loss_delta
        metrics["loss_delta"] = loss_delta

        # ---- SDS guidance (optional) ----
        # Matches ``gaussian_surfel_mvdream.py:180-254``: the occ-weighted
        # gradient hook exp(-3*occ) on the guidance input, the stage-dependent
        # input (RGB composite in stage 1, rendered normals in stage 0), and
        # the ImageDream reference image (GT RGB crop in stage 1, ECON
        # normal_F in stage 0) + the first gen view's neural background.
        if guidance_fn is not None:
            # The hook is gated on lambda_occ > 0 in the reference
            # (``:213-218,234-239``) — statically here (all SOAR configs
            # set it > 0; a schedule counts as "on").
            occ_on = isinstance(w.occ, (tuple, list)) or float(w.occ) != 0.0
            if occ_on:
                occ_w = jnp.exp(-3.0 * jax.lax.stop_gradient(gen["occ"]))
                hook = lambda x: scale_gradient(x, occ_w)  # noqa: E731
            else:
                hook = lambda x: x  # noqa: E731
            if stage.training_stage == 1:
                guidance_inp = hook(comp_rgb)
                ref_rgb = batch.get("gt_rgb_crop")
                ref_mask = batch.get("gt_mask_crop")
            else:
                guidance_inp = hook(gen["normal"])
                ref_rgb = batch.get("gt_normal_F")
                ref_mask = batch.get("gt_normal_mask")
            if sds_via_params:
                # Full SDS inside the step; weights arrive as the jit
                # argument ``gparams`` (see build_guidance.apply_with_params).
                sds_out = guidance_fn.apply_with_params(
                    gparams,
                    guidance_inp,
                    c2w,
                    step,
                    k_sds,
                    ref_mask=ref_mask,
                    comp_bg=bg_rgb[0],
                    ref_ip=batch.get("ref_ip"),
                )
            elif split_sds:
                # Grad half only: the no-grad UNet target was computed in
                # its own program (see docstring).  When the caller rides
                # the VAE variables in the batch, use the closure-free
                # encoder so they stay jit ARGUMENTS — a closure-captured
                # VAE bakes ~75 MB of constants into this step's serialized
                # executable (scripts/audit_executable.py --sds).
                if "guidance_vae" in batch and getattr(
                    guidance_fn, "encode_latents_p", None
                ) is not None:
                    lat = guidance_fn.encode_latents_p(
                        batch["guidance_vae"], guidance_inp, k_sds
                    )
                else:
                    lat = guidance_fn.encode_latents(guidance_inp, k_sds)
                target = jax.lax.stop_gradient(batch["sds_target"])
                sds_out = {
                    "loss_sds": 0.5 * jnp.sum((lat - target) ** 2)
                    / lat.shape[0],
                    # /B: the reference's grad_norm is the autograd of the
                    # /B-scaled recon loss (SOAR runs recon_loss=true; see
                    # sds.py __call__ for the plain-SDS convention).
                    "grad_norm": jnp.linalg.norm(lat - target)
                    / lat.shape[0],
                }
            else:
                sds_out = guidance_fn(
                    guidance_inp,
                    c2w=c2w,
                    step=step,
                    key=k_sds,
                    ref_rgb=ref_rgb,
                    ref_mask=ref_mask,
                    comp_bg=bg_rgb[0],
                    ref_ip=batch.get("ref_ip"),
                )
            if not isinstance(sds_out, dict):
                sds_out = {"loss_sds": sds_out}
            sds = sds_out["loss_sds"]
            sds_on = (step > stage.sds_start).astype(loss.dtype)
            loss = loss + sds_on * C(w.sds) * sds
            metrics["loss_sds"] = sds
            if "grad_norm" in sds_out:
                metrics["sds_grad_norm"] = sds_out["grad_norm"]

        # Capacity-truncation canaries (VERDICT r1 weak #3).  "dropped" =
        # splats beyond max_per_tile — they are the FARTHEST in their tile,
        # which a saturated front-to-back composite (opacity forced 1)
        # ignores, so moderate counts are benign.  "capped" = surfels whose
        # tile footprint exceeded dup_side^2 — these leave visible holes;
        # raise dup_side if nonzero.
        ov = gen["overflow"].reshape(-1, 2).sum(0) + gt["overflow"]
        if has_normals:
            # The normal-F/B pair composites from ONE shared binning, so its
            # counter appears once (gt_nB carries the same tensor).
            ov = ov + gt_nF["overflow"]
        metrics["raster_dropped"] = ov[0].astype(jnp.float32)
        metrics["raster_capped"] = ov[1].astype(jnp.float32)

        metrics["loss"] = loss
        return loss, metrics

    def sds_prelude(state: TrainState, batch, key, encode_latents=None):
        """Forward-only gen pass + latents for the split-SDS target program:
        returns (latents [V,h,w,4], c2w [V,4,4], k_sds).  Shares ``gen_pass``
        with ``loss_fn`` so the RNG (cameras, bg aug, encoder noise) is
        byte-identical to the step that will consume the target.
        ``encode_latents`` overrides the guidance's encoder so the caller
        can pass the VAE weights as jit arguments (build_guidance's
        ``make_fused_prelude``)."""
        params = state.params
        attrs = None if use_explicit else query_attributes(params, model)
        gv = gen_pass(
            params, state.bg_params, batch, key, attrs,
            settings=dataclasses.replace(gen_settings, lite=True),
        )
        if stage.training_stage == 1:
            inp = gv["comp_rgb"]
        else:
            inp = gv["gen"]["normal"]
        enc = encode_latents or guidance_fn.encode_latents
        lat = enc(inp, gv["k_sds"])
        return lat, gv["c2w"], gv["k_sds"]

    def train_step(state: TrainState, batch, key, gparams=None):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, argnums=0, has_aux=True
        )(state.params, state.bg_params, batch, key, state.step, gparams)
        # NOTE: the background MLP is intentionally NOT optimized — the
        # reference builds a bg optimizer but never returns it
        # (``gaussian_surfel_mvdream.py:59-66``), so bg stays at init.
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=params,
                bg_params=state.bg_params,
                opt_state=opt_state,
                step=state.step + 1,
            ),
            metrics,
        )

    train_step.sds_prelude = sds_prelude if (
        split_sds and guidance_fn is not None
    ) else None
    return train_step


def make_gt_batch(ds, model: AvatarModel, frame_idx: int) -> Dict:
    """Host-side assembly of the per-frame GT batch (device arrays +
    Camera pytrees), mirroring the ~35-key batch dict of the dataset
    (``uncond_multiview.py:635-681``) reduced to what the step consumes."""
    H, W = ds.image_size
    fov = ds.frame_fovs(frame_idx)
    c2w = jnp.asarray(ds.gt_c2w(frame_idx))

    # GT RGB camera: principal point enters via prcppoint (projection built
    # without cxcy), matching ``gaussian_batch_renderer.py:29-37, 59-83``.
    gt_cam = camera_from_c2w(
        c2w,
        jnp.asarray(fov["fovx"]),
        jnp.asarray(fov["fovy"]),
        znear=0.1,
        zfar=100.0,
        prcppoint=jnp.asarray([fov["cx"] / W, fov["cy"] / H], dtype=jnp.float32),
    )
    # Normal cameras: principal point inside the projection, prcp=(.5,.5)
    # (``gaussian_batch_renderer.py:40-58, 84-103``).
    nres = ds.normal_F.shape[1] if ds.normal_F.size else ds.images_crop.shape[1]
    normal_cam = camera_from_c2w(
        c2w,
        jnp.asarray(fov["normal_fovx"]),
        jnp.asarray(fov["normal_fovy"]),
        znear=0.1,
        zfar=100.0,
        cxcy=(jnp.asarray(fov["normal_cx"]), jnp.asarray(fov["normal_cy"])),
        img_wh=(nres, nres),
    )
    batch = {
        "frame_idx": jnp.asarray(frame_idx, jnp.int32),
        "gt_rgb": jnp.asarray(ds.images[frame_idx]),
        "gt_mask": jnp.asarray(ds.masks[frame_idx]),
        "gt_cam": gt_cam,
        "normal_cam": normal_cam,
        # ImageDream reference crop (``uncond_multiview.py:246-314`` crops,
        # consumed at ``gaussian_surfel_mvdream.py:187-189``).
        "gt_rgb_crop": jnp.asarray(ds.images_crop[frame_idx]),
        "gt_mask_crop": jnp.asarray(ds.masks_crop[frame_idx]),
    }
    if ds.normal_F.size:
        batch["gt_normal_F"] = jnp.asarray(ds.normal_F[frame_idx])
        batch["gt_normal_mask"] = jnp.asarray(ds.normal_mask[frame_idx])
        if ds.normal_B.size:
            # FS sequences ship no back normals (reference FS sets
            # gt_normal_B = None); key absent -> the nB loss is untraced.
            batch["gt_normal_B"] = jnp.asarray(ds.normal_B[frame_idx])
    return batch


# Image-like batch keys eligible for uint8 pinned storage.  8-bit-sourced
# data (video frames, masks, normal-map pngs) round-trips EXACTLY through
# round(x*255)/255; synthetic float data changes by <= 1/510.
_GT_U8_KEYS = (
    "gt_rgb",
    "gt_mask",
    "gt_rgb_crop",
    "gt_mask_crop",
    "gt_normal_F",
    "gt_normal_B",
    "gt_normal_mask",
)


def make_gt_batch_stack(
    ds,
    model: AvatarModel,
    frames,
    store_u8: bool = False,
    ip_table=None,
):
    """Pin EVERY per-frame GT batch in HBM as one stacked pytree and return
    ``(stacked, select_fn, pos_of)``.

    The reference workload samples ~400 frames uniformly at random; an LRU
    device cache of 32 hits ~8% and most steps re-pay host-side batch
    assembly + H2D upload (round-2 verdict #5).  Pinning turns the per-step
    batch cost into one tiny on-device gather program:
    ``select_fn(stacked, pos)`` with ``pos = pos_of[frame_idx]``.

    ``store_u8=True`` stores the image-like keys (``_GT_U8_KEYS``) as uint8
    (4x smaller; exact at 8-bit precision for 8-bit-sourced data, modulo a
    <=1-ulp float residue from XLA's reciprocal-multiply dequantization)
    and dequantizes inside the select program.  ``ip_table`` ([F_total, n_tok, D] numpy) rides along as
    a stacked ``ref_ip`` key.

    Assembly runs on the host CPU backend so the (possibly multi-GB) stack
    crosses to the accelerator in ONE transfer."""
    import contextlib

    frames = [int(f) for f in frames]
    pos_of = {f: i for i, f in enumerate(frames)}

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        per_frame = [make_gt_batch(ds, model, f) for f in frames]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *per_frame
        )
        u8_keys = ()
        if store_u8:
            u8_keys = tuple(k for k in _GT_U8_KEYS if k in stacked)
            for k in u8_keys:
                # Clamp before the cast: composited renders can exceed 1.0
                # by an ulp and 256 would WRAP to 0 in uint8.
                stacked[k] = jnp.clip(
                    jnp.round(stacked[k] * 255.0), 0.0, 255.0
                ).astype(jnp.uint8)
        if ip_table is not None:
            stacked["ref_ip"] = jnp.stack(
                [jnp.asarray(ip_table[f]) for f in frames]
            )
    stacked = jax.device_put(stacked)

    @jax.jit
    def select(stacked, pos):
        out = {}
        for k, v in stacked.items():
            x = jax.tree_util.tree_map(lambda a: a[pos], v)
            if k in u8_keys:
                x = x.astype(jnp.float32) / 255.0
            out[k] = x
        return out

    return stacked, select, pos_of


def gt_stack_nbytes(ds, model: AvatarModel, n_frames: int,
                    store_u8: bool = False, ip_table=None) -> int:
    """Estimated device bytes of :func:`make_gt_batch_stack` for
    ``n_frames`` frames (one host probe batch, no device traffic)."""
    import contextlib

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        probe = make_gt_batch(ds, model, 0)
    total = 0
    for k, v in probe.items():
        for leaf in jax.tree_util.tree_leaves(v):
            n = leaf.size * leaf.dtype.itemsize
            if store_u8 and k in _GT_U8_KEYS:
                n = leaf.size
            total += n
    if ip_table is not None:
        total += ip_table[0].size * 4
    return total * n_frames
