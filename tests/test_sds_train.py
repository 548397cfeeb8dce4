"""Trainer-level SDS guidance tests (VERDICT r1 #1).

Covers the full plumbing the reference exercises per training step
(``system/gaussian_surfel_mvdream.py:180-254``): the sampled gen-view c2w
reaches the guidance (ImageDream camera conditioning), the per-stage
reference image (GT crop / normal_F) and comp_bg are delivered, the
occ-weighted exp(-3*occ) gradient hook modulates the SDS gradient at the
parameter level, and a stage-0 -> stage-1 run with the real (tiny-config)
UNet/VAE/CLIP architectures completes with finite losses.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soar_tpu.avatar import init_avatar
from soar_tpu.body import make_test_body
from soar_tpu.data.dataset import make_synthetic_sequence
from soar_tpu.field.attribute_field import AttributeFieldConfig
from soar_tpu.field.hashgrid import HashGridConfig
from soar_tpu.guidance.build import build_guidance
from soar_tpu.render.types import RasterConfig
from soar_tpu.train.config import LossWeights, StageConfig, TrainConfig
from soar_tpu.train.trainer import (
    init_train_state,
    make_gt_batch,
    make_train_step,
)

TINY_FIELD = AttributeFieldConfig(
    grid=HashGridConfig(num_levels=4, min_res=4, max_res=64, log2_hashmap_size=12),
    hidden_dim=16,
)


@pytest.fixture(scope="module")
def setup():
    ds, _ = make_synthetic_sequence(num_frames=3, image_size=(64, 64))
    body = make_test_body(num_joints=4, segments_per_bone=3, ring=8)
    params, model = init_avatar(
        body,
        {k: jnp.asarray(v) for k, v in ds.smpl_params.items()},
        num_subdiv=1,
        field_cfg=TINY_FIELD,
        distill_steps=0,
    )
    return ds, params, model


def _make_step(setup, stage, guidance_fn, head_prob=0.0, n_views=2):
    ds, params, model = setup
    cfg = TrainConfig(n_views=n_views, head_prob=head_prob)
    state, opt = init_train_state(params, cfg)
    step_fn = jax.jit(
        make_train_step(
            model,
            cfg,
            stage,
            opt,
            gen_size=(32, 32),
            gt_size=(64, 64),
            normal_size=(32, 32),
            raster=RasterConfig(max_per_tile=64, dup_side=3),
            use_explicit=True,
            has_normals=False,
            guidance_fn=guidance_fn,
        )
    )
    return state, step_fn, ds, model


@pytest.mark.slow
def test_guidance_receives_cameras_and_refs(setup):
    """The guidance must see [V,4,4] gen c2w, the per-stage ref image/mask,
    and the first view's background — shapes pinned at trace time."""
    received = {}

    def spy_guidance(inp, c2w, step, key, ref_rgb=None, ref_mask=None,
                     comp_bg=None, ref_ip=None):
        received["inp"] = inp.shape
        received["c2w"] = c2w.shape
        received["ref_rgb"] = None if ref_rgb is None else ref_rgb.shape
        received["ref_mask"] = None if ref_mask is None else ref_mask.shape
        received["comp_bg"] = None if comp_bg is None else comp_bg.shape
        return {"loss_sds": jnp.mean(inp**2), "grad_norm": jnp.zeros(())}

    stage = StageConfig(
        training_stage=1,
        sds_start=0,
        loss=LossWeights(normal_F=0.0, normal_B=0.0, normal_mask=0.0),
    )
    state, step_fn, ds, model = _make_step(setup, stage, spy_guidance)
    batch = make_gt_batch(ds, model, 0)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))

    assert received["inp"] == (2, 32, 32, 3)
    assert received["c2w"] == (2, 4, 4)
    # stage 1 ref = GT crop (``gaussian_surfel_mvdream.py:187-189``)
    assert received["ref_rgb"] == tuple(ds.images_crop.shape[1:])
    assert received["ref_mask"] == tuple(ds.masks_crop.shape[1:])
    assert received["comp_bg"] == (32, 32, 3)
    assert np.isfinite(float(metrics["loss_sds"]))
    assert "sds_grad_norm" in metrics


@pytest.mark.slow
def test_occ_hook_modulates_sds_gradient(setup):
    """With occ forced high, exp(-3*occ) must shrink the SDS pull on the
    params relative to occ == 0 — the trainer-level check of the reference's
    backward hook (``gaussian_surfel_mvdream.py:26-30, 213-218``)."""
    ds, params, model = setup

    def sds_only_guidance(inp, c2w, step, key, **kw):
        # Pull renders toward zero; grad magnitude prop. to the occ weight.
        return {"loss_sds": jnp.sum(inp**2)}

    stage = StageConfig(
        training_stage=1,
        sds_start=0,
        loss=LossWeights(
            sds=1.0, recon=0.0, mask=0.0, normal_F=0.0, normal_B=0.0,
            normal_mask=0.0, normal_consistency=0.0, curv=0.0, scales=0.0,
            # occ=1: the hook is gated on lambda_occ > 0 exactly like the
            # reference (``:213-218``); the occ loss term itself only
            # gradients params.occ, so the colors-delta measured below
            # still isolates the SDS pull.
            delta=0.0, occ=1.0,
        ),
    )

    import optax

    from soar_tpu.train.background import init_background
    from soar_tpu.train.trainer import TrainState, make_train_step as mts

    grads = {}
    for name, occ_val in [("low", -10.0), ("high", 10.0)]:
        p = params._replace(occ=jnp.full_like(params.occ, occ_val))
        cfg = TrainConfig(n_views=2, head_prob=0.0)
        # SGD(1) so the parameter delta IS the gradient (Adam would
        # normalize the magnitude away).
        opt = optax.sgd(1.0)
        # step=1: SDS is gated ``step > sds_start`` (reference ``:441``).
        state = TrainState(
            params=p,
            bg_params=init_background(jax.random.PRNGKey(0)),
            opt_state=opt.init(p),
            step=jnp.ones((), jnp.int32),
        )
        step_fn = jax.jit(
            mts(
                model, cfg, stage, opt,
                gen_size=(32, 32), gt_size=(64, 64), normal_size=(32, 32),
                raster=RasterConfig(max_per_tile=64, dup_side=3),
                use_explicit=True, has_normals=False,
                guidance_fn=sds_only_guidance,
            )
        )
        batch = make_gt_batch(ds, model, 0)
        new_state, _ = step_fn(state, batch, jax.random.PRNGKey(3))
        grads[name] = float(
            jnp.linalg.norm(new_state.params.colors - state.params.colors)
        )
    # occ -> sigmoid -> ~1 => weight exp(-3) ~ 0.05 ; occ ~ 0 => weight ~1.
    assert grads["high"] < grads["low"] * 0.5, grads


@pytest.mark.slow
def test_tiny_imagedream_stage0_stage1(setup):
    """Stage-0 (normal SDS) -> stage-1 (RGB SDS) with the real tiny-config
    UNet + VAE + CLIP/Resampler image conditioning: finite losses, params
    move."""
    ds, params, model = setup
    for training_stage in (0, 1):
        stage = StageConfig(
            training_stage=training_stage,
            sds_start=0,
            loss=LossWeights(normal_F=0.0, normal_B=0.0, normal_mask=0.0),
        )
        guidance_fn = build_guidance(
            "imagedream", stage, key=jax.random.PRNGKey(5), tiny=True,
            image_size=32, n_view=2,
        )
        state, step_fn, ds_, model_ = _make_step(
            setup, stage, guidance_fn, head_prob=0.4
        )
        key = jax.random.PRNGKey(7 + training_stage)
        for it in range(2):
            key, k = jax.random.split(key)
            batch = make_gt_batch(ds_, model_, it % 3)
            state, metrics = step_fn(state, batch, k)
        assert np.isfinite(float(metrics["loss"])), metrics
        assert np.isfinite(float(metrics["loss_sds"])), metrics


@pytest.mark.slow
def test_mvdream_guidance_text_only(setup):
    stage = StageConfig(
        training_stage=0, sds_start=0,
        loss=LossWeights(normal_F=0.0, normal_B=0.0, normal_mask=0.0),
    )
    guidance_fn = build_guidance(
        "mvdream", stage, key=jax.random.PRNGKey(11), tiny=True,
        image_size=32, n_view=2,
    )
    state, step_fn, ds, model = _make_step(setup, stage, guidance_fn)
    batch = make_gt_batch(ds, model, 1)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(12))
    assert np.isfinite(float(metrics["loss_sds"]))


@pytest.mark.slow
def test_split_sds_matches_fused(setup):
    """split-SDS (prelude + separate UNet-target program + grad-half step)
    must reproduce the fused single-program step: same RNG path, same
    loss_sds, same parameter update."""
    ds, params, model = setup
    stage = StageConfig(
        training_stage=1, sds_start=0,
        loss=LossWeights(normal_F=0.0, normal_B=0.0, normal_mask=0.0),
    )
    guidance_fn = build_guidance(
        "imagedream", stage, key=jax.random.PRNGKey(5), tiny=True,
        image_size=32, n_view=2,
    )
    from soar_tpu.train.trainer import TrainState

    results = {}
    for mode in ("fused", "split", "split_fused_prelude", "split_vae_args"):
        cfg = TrainConfig(n_views=2, head_prob=0.4)
        state, opt = init_train_state(params, cfg)
        # step=1 so the SDS gate (step > sds_start) is open
        state = state._replace(step=jnp.ones((), jnp.int32))
        raw = make_train_step(
            model, cfg, stage, opt,
            gen_size=(32, 32), gt_size=(64, 64), normal_size=(32, 32),
            raster=RasterConfig(max_per_tile=64, dup_side=3),
            use_explicit=True, has_normals=False,
            guidance_fn=guidance_fn, split_sds=(mode != "fused"),
        )
        step_fn = jax.jit(raw)
        batch = make_gt_batch(ds, model, 0)
        key = jax.random.PRNGKey(9)
        if mode == "split":
            prelude = jax.jit(raw.sds_prelude)
            lat, c2w, k_sds = prelude(state, batch, key)
            batch["sds_target"] = guidance_fn.compute_target(
                lat, c2w, k_sds, state.step
            )
        elif mode == "split_fused_prelude":
            # The production one-program no-grad half (cli.train / bench).
            fused_prelude = guidance_fn.make_fused_prelude(raw.sds_prelude)
            batch["sds_target"] = fused_prelude(state, batch, key)
        elif mode == "split_vae_args":
            # Production transport shape: the grad half's VAE variables
            # ride in batch["guidance_vae"] (jit argument, not a closure
            # constant) — must be the identical computation.
            fused_prelude = guidance_fn.make_fused_prelude(raw.sds_prelude)
            batch["sds_target"] = fused_prelude(state, batch, key)
            batch["guidance_vae"] = guidance_fn.vae_params
        new_state, metrics = step_fn(state, batch, key)
        results[mode] = (new_state, metrics)

    m_f = results["fused"][1]
    for mode in ("split", "split_fused_prelude", "split_vae_args"):
        np.testing.assert_allclose(
            float(results[mode][1]["loss_sds"]),
            float(m_f["loss_sds"]),
            rtol=1e-4,
            atol=1e-6,
        )
        # Same threshold-flip tolerance as test_sds_via_params_matches_fused:
        # the modes compile as DIFFERENT XLA programs, and a splat exactly on
        # the alpha keep-threshold can flip in/out by 1 ulp of fusion
        # reordering, flipping the sign of that surfel's first-step +-lr
        # update.  >=99.5% exact elementwise equality + tiny mean drift.
        cm = np.asarray(results[mode][0].params.colors)
        cf = np.asarray(results["fused"][0].params.colors)
        match = np.isclose(cm, cf, atol=1e-5)
        assert match.mean() > 0.995, (
            f"{mode}: only {match.mean():.4f} elements equal"
        )
        assert np.abs(cm - cf).mean() < 1e-4
    # The two split variants are the same math modulo program boundaries.
    np.testing.assert_allclose(
        np.asarray(results["split_fused_prelude"][1]["loss_sds"]),
        np.asarray(results["split"][1]["loss_sds"]),
        rtol=1e-6,
    )


@pytest.mark.slow
def test_sds_via_params_matches_fused(setup):
    """The fused-args mode (weights as a jit argument pytree) must equal the
    closure-fused step.  Image conditioning goes through precomputed ref_ip
    in both."""
    ds, params, model = setup
    stage = StageConfig(
        training_stage=1, sds_start=0,
        loss=LossWeights(normal_F=0.0, normal_B=0.0, normal_mask=0.0),
    )
    guidance_fn = build_guidance(
        "imagedream", stage, key=jax.random.PRNGKey(5), tiny=True,
        image_size=32, n_view=2,
    )
    batch0 = None
    results = {}
    for mode in ("fused", "args"):
        cfg = TrainConfig(n_views=2, head_prob=0.0)
        state, opt = init_train_state(params, cfg)
        state = state._replace(step=jnp.ones((), jnp.int32))
        raw = make_train_step(
            model, cfg, stage, opt,
            gen_size=(32, 32), gt_size=(64, 64), normal_size=(32, 32),
            raster=RasterConfig(max_per_tile=64, dup_side=3),
            use_explicit=True, has_normals=False,
            guidance_fn=guidance_fn,
            sds_via_params=(mode == "args"),
        )
        step_fn = jax.jit(raw)
        batch = make_gt_batch(ds, model, 0)
        batch["ref_ip"] = guidance_fn.embed_ref(batch["gt_rgb_crop"])
        key = jax.random.PRNGKey(9)
        if mode == "args":
            new_state, metrics = step_fn(state, batch, key,
                                         guidance_fn.arg_params)
        else:
            new_state, metrics = step_fn(state, batch, key)
        results[mode] = (new_state, metrics)

    m_f, m_a = results["fused"][1], results["args"][1]
    np.testing.assert_allclose(
        float(m_a["loss_sds"]), float(m_f["loss_sds"]), rtol=1e-4, atol=1e-6
    )
    # The two modes compile as DIFFERENT XLA programs; a splat sitting
    # exactly on the alpha keep-threshold can flip in/out by 1 ulp of
    # fusion reordering, flipping the sign of that surfel's first-step
    # update (+-lr).  Require elementwise equality on >=99.5% of entries
    # and a tiny mean drift, instead of exact allclose.
    ca = np.asarray(results["args"][0].params.colors)
    cf = np.asarray(results["fused"][0].params.colors)
    match = np.isclose(ca, cf, atol=1e-5)
    assert match.mean() > 0.995, f"only {match.mean():.4f} elements equal"
    assert np.abs(ca - cf).mean() < 1e-4


def test_for_stage_rebinds_without_reconverting(setup):
    """guidance.for_stage(stage') must reuse the already-converted,
    device-committed weights (a --stage both run must not torch.load and
    convert the multi-GB checkpoint twice) while binding the new stage's
    scalars."""
    ds, params, model = setup
    s0 = StageConfig(
        training_stage=0, sds_start=0, guidance_scale=5.0,
        loss=LossWeights(normal_F=0.0, normal_B=0.0, normal_mask=0.0),
    )
    s1 = StageConfig(
        training_stage=1, sds_start=0, guidance_scale=2.5,
        min_step_percent=0.1, max_step_percent=0.6,
        loss=LossWeights(normal_F=0.0, normal_B=0.0, normal_mask=0.0),
    )
    g0 = build_guidance(
        "imagedream", s0, key=jax.random.PRNGKey(5), tiny=True,
        image_size=32, n_view=2,
    )
    g1 = g0.for_stage(s1)
    # Weight arrays are the SAME buffers, not copies/reconversions.
    l0 = jax.tree_util.tree_leaves(g0.arg_params)
    l1 = jax.tree_util.tree_leaves(g1.arg_params)
    assert all(a is b for a, b in zip(l0, l1))
    # The CLIP holder is shared too: embed once, release once, both notice.
    ip = g1.embed_ref(jnp.zeros((16, 16, 3)))
    assert np.isfinite(np.asarray(ip)).all()
    g1.release_image_encoder()
    import pytest

    with pytest.raises(RuntimeError, match="released"):
        g0.embed_ref(jnp.zeros((16, 16, 3)))
    # And the rebound guidance carries the NEW stage's scalars: identical
    # latents at the same raw key must produce different targets under the
    # different CFG scale / timestep window.
    lat = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 4))
    c2w = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    step = jnp.zeros((), jnp.int32)
    t0 = g0.compute_target(lat, c2w, jax.random.PRNGKey(7), step)
    t1 = g1.compute_target(lat, c2w, jax.random.PRNGKey(7), step)
    assert not np.allclose(np.asarray(t0), np.asarray(t1))


@pytest.mark.slow
def test_make_mvdream_step(setup):
    """The registry constructor must be callable with defaults overridden
    (VERDICT r1 weak #2)."""
    import optax

    from soar_tpu.train.systems import make_mvdream_step

    ds, params, model = setup
    stage = StageConfig(
        training_stage=0, sds_start=0,
        loss=LossWeights(normal_F=0.0, normal_B=0.0, normal_mask=0.0),
    )
    guidance_fn = build_guidance(
        "mvdream", stage, key=jax.random.PRNGKey(1), tiny=True,
        image_size=32, n_view=2,
    )
    cfg = TrainConfig(n_views=2, head_prob=0.0)
    from soar_tpu.train.trainer import init_train_state

    state, opt = init_train_state(params, cfg)
    step_fn = jax.jit(
        make_mvdream_step(
            model, cfg, stage, opt, guidance_fn,
            gen_size=(32, 32), gt_size=(64, 64), normal_size=(32, 32),
            raster=RasterConfig(max_per_tile=64, dup_side=3),
            use_explicit=True, has_normals=False,
        )
    )
    batch = make_gt_batch(ds, model, 0)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_head_camera_mixing():
    """With head_prob=1 every gen camera draw is the close-up distribution
    (distance 0.28/tan(fov/2)); with 0 it is the body distribution."""
    from soar_tpu.data.cameras import (
        CameraSampleConfig,
        sample_head_cameras,
        sample_multiview_cameras,
    )

    dists = []
    for i in range(50):
        c2w, fovy = sample_head_cameras(jax.random.PRNGKey(i), 4)
        d = jnp.linalg.norm(c2w[:, :3, 3], axis=-1)
        # relative-radius: dist = 0.28 / tan(fovy_base/2); undo the zoom-free
        # fovy to check the draw is the head distribution
        dists.append(float((d * jnp.tan(0.5 * fovy)).mean()))
    assert np.allclose(dists, 0.28, atol=1e-5), (min(dists), max(dists))

    body_c2w, _ = sample_multiview_cameras(
        jax.random.PRNGKey(0), CameraSampleConfig(n_view=4)
    )
    d_body = float(jnp.linalg.norm(body_c2w[:, :3, 3], axis=-1).mean())
    assert d_body > 1.0  # body cameras are far; head cameras close

@pytest.mark.slow
def test_warm_step_matches_sds_program_before_sds_start(setup):
    """cli.train runs a separate guidance-free program for stage-0 steps
    <= sds_start (no prelude/UNet work).  That is only sound if the SDS
    program's ``sds_on`` gate makes it EXACTLY equivalent there: same
    loss, same parameter update."""
    stage = StageConfig(training_stage=0, sds_start=2)

    def mock_guidance(inp, c2w, step, key, **kw):
        return {"loss_sds": 7.0 * jnp.sum(inp ** 2)}

    state, sds_step, ds, model = _make_step(setup, stage, mock_guidance)
    state2, warm_step, _, _ = _make_step(setup, stage, None)
    batch = make_gt_batch(ds, model, 0)
    key = jax.random.PRNGKey(0)
    s1, m1 = sds_step(state, batch, key)
    s2, m2 = warm_step(state2, batch, key)
    assert float(m1["loss_sds"]) > 0.0  # guidance ran, contribution gated
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s1.params.xyz), np.asarray(s2.params.xyz), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(s1.params.colors), np.asarray(s2.params.colors), atol=1e-7
    )
