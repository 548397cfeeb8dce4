"""Sharded-vs-single-device equivalence of the training step.

The multi-chip story (SURVEY §2.5 TPU-native plan) is: replicate surfel
state, shard the gen-view axis over a 1-D mesh, let GSPMD insert the
gradient all-reduce.  These tests pin that the sharded step computes the
SAME update as the unsharded one (same key -> same cameras -> identical
math, modulo f32 reduction order)."""

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
from soar_tpu.parallel import make_view_mesh, replicate, view_sharder
from soar_tpu.render.types import RasterConfig
from soar_tpu.train.config import LossWeights, StageConfig, TrainConfig
from soar_tpu.train.trainer import (
    init_train_state,
    make_gt_batch,
    make_train_step,
)

N_DEV = 4


@pytest.fixture(scope="module")
def setup():
    ds, _ = make_synthetic_sequence(num_frames=2, image_size=(48, 48))
    body = make_test_body(num_joints=4, segments_per_bone=2, ring=6)
    fc = AttributeFieldConfig(
        grid=HashGridConfig(
            num_levels=2, min_res=4, max_res=16, log2_hashmap_size=10
        ),
        hidden_dim=8,
    )
    params, model = init_avatar(
        body,
        {k: jnp.asarray(v) for k, v in ds.smpl_params.items()},
        num_subdiv=0,
        field_cfg=fc,
        distill_steps=0,
    )
    return ds, params, model


def _make_step(model, opt, shard_views=None, shard_gt=None):
    cfg = TrainConfig(n_views=N_DEV)
    stage = StageConfig(
        training_stage=0,
        loss=LossWeights(normal_F=0.0, normal_B=0.0, normal_mask=0.0),
    )
    return make_train_step(
        model,
        cfg,
        stage,
        opt,
        gen_size=(32, 32),
        gt_size=(48, 48),
        normal_size=(32, 32),
        raster=RasterConfig(max_per_tile=32, dup_side=3),
        use_explicit=True,
        has_normals=False,
        n_views=N_DEV,
        shard_views=shard_views,
        shard_gt=shard_gt,
    )


@pytest.mark.slow
def test_sharded_step_matches_unsharded(setup):
    ds, params, model = setup
    assert len(jax.devices()) >= N_DEV, "conftest must force 8 CPU devices"

    cfg = TrainConfig(n_views=N_DEV)
    state0, opt = init_train_state(params, cfg)
    batch = make_gt_batch(ds, model, ds.train_idx[0])
    key = jax.random.PRNGKey(3)

    # Single-device (unrolled) step.
    step_single = jax.jit(_make_step(model, opt))
    s1, m1 = step_single(state0, batch, key)

    # Sharded (vmapped + GSPMD) step over a 4-device mesh: gen views over
    # the view axis AND the single-camera GT pass row-sharded over the
    # same axis (SURVEY §2.5's "4 SDS views + 3 GT passes").
    from soar_tpu.parallel import row_sharder

    mesh = make_view_mesh(jax.devices()[:N_DEV])
    step_sharded = jax.jit(
        _make_step(model, opt, view_sharder(mesh), row_sharder(mesh))
    )
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        st = replicate(mesh, state0)
        bt = replicate(mesh, batch)
        kt = replicate(mesh, key)
        s2, m2 = step_sharded(st, bt, kt)

    assert np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )
    # Updated parameters agree (f32 reduction-order tolerance).
    np.testing.assert_allclose(
        np.asarray(s1.params.xyz), np.asarray(s2.params.xyz), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.params.colors), np.asarray(s2.params.colors), atol=1e-5
    )


def test_gen_views_actually_sharded(setup):
    """The rendered gen batch must land sharded over the view axis, not
    replicated (catches a silently-ignored sharding constraint)."""
    ds, params, model = setup
    mesh = make_view_mesh(jax.devices()[:N_DEV])
    sharder = view_sharder(mesh)

    x = jnp.zeros((N_DEV, 8, 8, 3))
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        y = jax.jit(lambda a: sharder(a) * 2.0)(replicate(mesh, x))
    shard_shapes = {s.data.shape for s in y.addressable_shards}
    assert shard_shapes == {(1, 8, 8, 3)}, shard_shapes


@pytest.fixture(scope="module")
def prod_setup():
    """Tiny scene with the PRODUCTION batch shape: field-driven attributes
    (use_explicit=False), front AND back GT normal maps, LPIPS on — the
    configuration ``cli.train --multichip`` actually runs (round-2 verdict:
    the sharded step had only ever been traced with explicit attrs and no
    normal passes)."""
    from soar_tpu.data.dataset import AvatarDataset

    body = make_test_body(num_joints=4, segments_per_bone=2, ring=6)
    F = 2
    rng = np.random.RandomState(0)
    sp = {
        "betas": np.zeros((1, body.num_betas), np.float32),
        "body_pose": (rng.randn(F, (body.num_joints - 1) * 3) * 0.05).astype(
            np.float32
        ),
        "global_orient": np.zeros((F, 3), np.float32),
        "transl": np.tile([[0.0, 0.2, -1.8]], (F, 1)).astype(np.float32),
    }
    fc = AttributeFieldConfig(
        grid=HashGridConfig(
            num_levels=2, min_res=4, max_res=16, log2_hashmap_size=10
        ),
        hidden_dim=8,
    )
    params, model = init_avatar(
        body,
        {k: jnp.asarray(v) for k, v in sp.items()},
        num_subdiv=0,
        field_cfg=fc,
        distill_steps=0,
    )
    H = W = 64  # 4x4 tiles at 16px -> exactly 1 tile-row per device
    NR = 32
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32)
    NK = np.array(
        [[40.0, 0, NR / 2], [0, 40.0, NR / 2], [0, 0, 1]], np.float32
    )
    ds = AvatarDataset(
        images=rng.rand(F, H, W, 3).astype(np.float32),
        masks=(rng.rand(F, H, W) > 0.5).astype(np.float32),
        normal_F=rng.rand(F, NR, NR, 3).astype(np.float32),
        normal_B=rng.rand(F, NR, NR, 3).astype(np.float32),
        normal_mask=(rng.rand(F, NR, NR) > 0.5).astype(np.float32),
        images_crop=rng.rand(F, NR, NR, 3).astype(np.float32),
        masks_crop=(rng.rand(F, NR, NR) > 0.5).astype(np.float32),
        smpl_params=sp,
        w2c=np.eye(4, dtype=np.float32),
        Ks=np.tile(K[None], (F, 1, 1)),
        normal_Ks=np.tile(NK[None], (F, 1, 1)),
        train_idx=list(range(F)),
        val_idx=[],
        test_idx=[],
    )
    return ds, params, model


def _tiny_lpips_fn():
    from soar_tpu.train.lpips import LPIPS

    net = LPIPS(dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 3))
    variables = net.init(jax.random.PRNGKey(0), x, x)

    def fn(a, b):
        return jnp.mean(net.apply(variables, a[None], b[None]))

    return fn


def _make_prod_step(model, opt, shard_views=None, shard_gt=None):
    """The production step configuration (mirrors cli.train's
    make_train_step call): field-driven attrs, both-faces GT normal pass,
    LPIPS, selective remat on both render paths."""
    cfg = TrainConfig(n_views=N_DEV)
    stage = StageConfig(training_stage=0)
    return make_train_step(
        model,
        cfg,
        stage,
        opt,
        gen_size=(32, 32),
        gt_size=(64, 64),
        normal_size=(32, 32),
        raster=RasterConfig(max_per_tile=32, dup_side=3),
        use_explicit=False,
        has_normals=True,
        has_normal_B=True,
        lpips_fn=_tiny_lpips_fn(),
        n_views=N_DEV,
        shard_views=shard_views,
        shard_gt=shard_gt,
        remat_gen=True,
        remat_gt=True,
    )


@pytest.mark.slow
def test_sharded_production_step_matches_unsharded(prod_setup):
    """Sharded == unsharded on the PRODUCTION step shape: hash-field query,
    both-faces normal composite, LPIPS, selective remat — all under GSPMD."""
    from soar_tpu.parallel import row_sharder

    ds, params, model = prod_setup
    cfg = TrainConfig(n_views=N_DEV)
    state0, opt = init_train_state(params, cfg)
    batch = make_gt_batch(ds, model, ds.train_idx[0])
    key = jax.random.PRNGKey(3)

    step_single = jax.jit(_make_prod_step(model, opt))
    s1, m1 = step_single(state0, batch, key)

    mesh = make_view_mesh(jax.devices()[:N_DEV])
    step_sharded = jax.jit(
        _make_prod_step(model, opt, view_sharder(mesh), row_sharder(mesh))
    )
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        st = replicate(mesh, state0)
        bt = replicate(mesh, batch)
        kt = replicate(mesh, key)
        s2, m2 = step_sharded(st, bt, kt)

        assert np.isfinite(float(m2["loss"]))
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(s1.params.xyz), np.asarray(s2.params.xyz), atol=1e-5
        )
        # Field (hash table + MLP head) updates agree too — the field
        # gradient flows through the sharded composites of every pass.
        t1 = jax.tree_util.tree_leaves(s1.params.field)
        t2 = jax.tree_util.tree_leaves(s2.params.field)
        for a, b in zip(t1, t2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            )

        # The compiled program must PARTITION the GT-pass composite over
        # tile rows, not replicate it: the full 16-tile [NT, pixels, K]
        # tensors may not appear (4x4 tiles / 4 devices = 4 per device).
        txt = (
            step_sharded.lower(st, bt, kt).compile().as_text()
        )
        assert "f32[16,256,32" not in txt, "replicated GT composite found"


def test_gt_render_actually_sharded(setup):
    """A real GT render under ``row_sharder`` must land row-sharded AND its
    compiled program must partition the [NT, pixels, K] composite over tile
    rows — the work split, not just a final reshard of replicated work."""
    from soar_tpu.avatar import RenderSettings, render_view
    from soar_tpu.core.camera import camera_from_c2w
    from soar_tpu.parallel import row_sharder

    ds, params, model = setup
    mesh = make_view_mesh(jax.devices()[:N_DEV])
    sharder = row_sharder(mesh)
    # 64px / 16px tiles = 4x4 tiles; N_DEV=4 devices -> 1 tile-row each.
    HW = (64, 64)
    cam = camera_from_c2w(jnp.eye(4), jnp.asarray(0.7), jnp.asarray(0.7))
    sett = RenderSettings(
        use_explicit=True, raster=RasterConfig(max_per_tile=32, dup_side=3)
    )

    def f(p):
        out = render_view(
            p, model, cam, HW, jnp.zeros(3), jnp.asarray(0), sett
        )
        return sharder(out)

    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        jf = jax.jit(f)
        out = jf(replicate(mesh, params))
        shard_shapes = {s.data.shape for s in out["render"].addressable_shards}
        assert shard_shapes == {(64 // N_DEV, 64, 3)}, shard_shapes
        # The composite runs on [NT/N_DEV, pixels=256, K] slices per device:
        # the full 16-tile axis must not appear with the 256-pixel axis.
        txt = jf.lower(replicate(mesh, params)).compile().as_text()
        assert "f32[4,256,32" in txt, "composite not partitioned over tiles"
        assert "f32[16,256,32" not in txt, "replicated composite found"


def test_gen_render_composite_partitioned_over_views(setup):
    """The vmapped gen render under ``view_sharder`` must partition the
    [V, NT, pixels, K] composite over the VIEW axis in the compiled
    program — one view per device, not a replicated 4-view render with a
    final reshard (VERDICT r4 weak #5: placement was docstring-verified
    only for this path)."""
    from soar_tpu.avatar import RenderSettings, render_view
    from soar_tpu.core.camera import camera_from_c2w

    ds, params, model = setup
    mesh = make_view_mesh(jax.devices()[:N_DEV])
    sharder = view_sharder(mesh)
    HW = (32, 32)  # 2x2 tiles of 16px -> NT=4, P=256
    K = 32
    sett = RenderSettings(
        use_explicit=True, raster=RasterConfig(max_per_tile=K, dup_side=3)
    )

    def f(p, c2w):
        cams = jax.vmap(
            lambda c: camera_from_c2w(c, jnp.asarray(0.7), jnp.asarray(0.7))
        )(c2w)
        cams = sharder(cams)
        out = jax.vmap(
            lambda cam: render_view(
                p, model, cam, HW, jnp.zeros(3), jnp.asarray(0), sett
            )
        )(cams)
        return out

    c2w = jnp.broadcast_to(jnp.eye(4), (N_DEV, 4, 4))
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        jf = jax.jit(f)
        out = jf(replicate(mesh, params), replicate(mesh, c2w))
        # Output images land view-sharded: one view per device.
        shard_shapes = {
            s.data.shape for s in out["render"].addressable_shards
        }
        assert shard_shapes == {(1, 32, 32, 3)}, shard_shapes
        # Compiled program: the per-device composite carries ONE view
        # ([1, NT=4, P=256, K]); a replicated 4-view composite must not
        # appear anywhere.
        txt = jf.lower(
            replicate(mesh, params), replicate(mesh, c2w)
        ).compile().as_text()
        assert f"f32[1,4,256,{K}" in txt, "per-view composite not found"
        assert f"f32[4,4,256,{K}" not in txt, "replicated gen composite"
