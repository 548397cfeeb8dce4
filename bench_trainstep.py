"""Full no-SDS training step at production scale (the driver's headline
metric via bench.py, which calls :func:`run`; also runnable directly:
    python bench_trainstep.py
First run populates the persistent compile cache; re-run for timings).

Baseline: the reference trains 2000 steps in ~40 min on an RTX A5000
(SURVEY §6) = 0.83 steps/s; each step here does the same work (7 renders at
512px over ~125k surfels, all losses, Adam) as one reference step minus the
weight-gated SDS UNet.
"""

import json
import time


def run():
    """Returns the result dict (does not print)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from soar_tpu.avatar import init_avatar
    from soar_tpu.body import make_test_body
    from soar_tpu.data.dataset import AvatarDataset
    from soar_tpu.field.attribute_field import AttributeFieldConfig
    from soar_tpu.field.hashgrid import HashGridConfig
    from soar_tpu.render.types import RasterConfig
    from soar_tpu.train.config import StageConfig, TrainConfig
    from soar_tpu.train.trainer import (
        init_train_state,
        make_gt_batch,
        make_train_step,
    )

    body = make_test_body(num_joints=10, segments_per_bone=7, ring=28)
    F = 8
    rng = np.random.RandomState(0)
    sp = {
        "betas": np.zeros((1, body.num_betas), np.float32),
        "body_pose": (rng.randn(F, (body.num_joints - 1) * 3) * 0.05).astype(
            np.float32
        ),
        "global_orient": np.zeros((F, 3), np.float32),
        "transl": np.tile([[0.0, 0.9, -2.8]], (F, 1)).astype(np.float32),
    }
    fc = AttributeFieldConfig(
        grid=HashGridConfig(
            num_levels=16, min_res=16, max_res=2048, log2_hashmap_size=18
        )
    )
    params, model = init_avatar(
        body,
        {k: jnp.asarray(v) for k, v in sp.items()},
        num_subdiv=3,
        field_cfg=fc,
        distill_steps=0,
    )
    n = int(params.xyz.shape[0])

    H = W = 512
    K = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
    ds = AvatarDataset(
        images=rng.rand(F, H, W, 3).astype(np.float32),
        masks=(rng.rand(F, H, W) > 0.5).astype(np.float32),
        normal_F=rng.rand(F, 512, 512, 3).astype(np.float32),
        normal_B=rng.rand(F, 512, 512, 3).astype(np.float32),
        normal_mask=(rng.rand(F, 512, 512) > 0.5).astype(np.float32),
        images_crop=np.zeros((F, 64, 64, 3), np.float32),
        masks_crop=np.zeros((F, 64, 64), np.float32),
        smpl_params=sp,
        w2c=np.eye(4, dtype=np.float32),
        Ks=np.tile(K[None], (F, 1, 1)),
        normal_Ks=np.tile(K[None], (F, 1, 1)),
        train_idx=list(range(F)),
        val_idx=[],
        test_idx=[],
    )

    cfg = TrainConfig(n_views=4)
    state, opt = init_train_state(params, model, cfg)
    step_fn = jax.jit(
        make_train_step(
            model,
            cfg,
            StageConfig(training_stage=0),
            opt,
            gen_size=(512, 512),
            gt_size=(H, W),
            normal_size=(512, 512),
            raster=RasterConfig(max_per_tile=96, dup_side=3),
            use_explicit=False,
            has_normals=True,
        ),
        # NOTE: donate_argnums=(0,) would halve state memory, but the axon
        # remote transport host-copies donated buffers and races their
        # deletion ("Array has been deleted"); leave undonated here.
    )

    key = jax.random.PRNGKey(0)
    batch = make_gt_batch(ds, model, 0)
    t0 = time.time()
    state, metrics = step_fn(state, batch, key)
    l = float(metrics["loss"])
    import sys

    print(
        f"compile+1st: {time.time()-t0:.1f}s loss={l:.4f}", file=sys.stderr
    )

    # Best of 3 batches (same protocol as bench.py: the shared TPU tenancy
    # shows ~3-7x run-to-run variance; single batches under-report badly).
    iters = 10
    dt = float("inf")
    for _rep in range(3):
        t0 = time.time()
        for _ in range(iters):
            key, k1 = jax.random.split(key)
            state, metrics = step_fn(state, batch, k1)
        l = float(metrics["loss"])
        assert l == l, "loss is NaN"
        dt = min(dt, time.time() - t0)
    return {
        "metric": f"train_step_no_sds_512px_{n}surfels",
        "value": round(iters / dt, 3),
        "unit": "steps/s",
        "vs_baseline": round((iters / dt) / 0.83, 3),
        "minutes_per_2000_steps": round(dt / iters * 2000 / 60, 1),
    }


if __name__ == "__main__":
    print(json.dumps(run()))
