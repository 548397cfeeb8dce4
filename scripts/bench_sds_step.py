"""A/B one SDS-step execution config on the real chip.

Usage:
    python scripts/bench_sds_step.py [--gen-chunk N|none] [--remat-gen 0|1]
        [--remat-gt 0|1] [--iters N] [--no-sds]

Runs the EXACT ``bench_trainstep.build_scene()`` headline scene (125k
surfels, 512px, full-shape mock ImageDream weights in bf16) with ONE knob
combination and prints its steps/s — for sweeping memory/schedule configs
(selective remat, chunk size, GT saved vs rematted) without editing the
production defaults.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _small_scene():
    """Tiny analogue of ``bench_trainstep.build_scene`` for --small runs."""
    import jax.numpy as jnp
    import numpy as np

    from soar_tpu.avatar import init_avatar
    from soar_tpu.body import make_test_body
    from soar_tpu.data.dataset import AvatarDataset
    from soar_tpu.field.attribute_field import AttributeFieldConfig
    from soar_tpu.field.hashgrid import HashGridConfig
    from soar_tpu.train.config import TrainConfig

    body = make_test_body(num_joints=3, segments_per_bone=2, ring=6)
    F = 2
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
        grid=HashGridConfig(num_levels=2, min_res=4, max_res=8,
                            log2_hashmap_size=8),
        hidden_dim=8,
    )
    params, model = init_avatar(
        body,
        {k: jnp.asarray(v) for k, v in sp.items()},
        num_subdiv=0,
        field_cfg=fc,
        distill_steps=0,
    )
    H = W = 64
    K = np.array([[75.0, 0, W / 2], [0, 75.0, H / 2], [0, 0, 1]], np.float32)
    ds = AvatarDataset(
        images=rng.rand(F, H, W, 3).astype(np.float32),
        masks=(rng.rand(F, H, W) > 0.5).astype(np.float32),
        normal_F=rng.rand(F, H, W, 3).astype(np.float32),
        normal_B=rng.rand(F, H, W, 3).astype(np.float32),
        normal_mask=(rng.rand(F, H, W) > 0.5).astype(np.float32),
        images_crop=rng.rand(F, H, W, 3).astype(np.float32),
        masks_crop=(rng.rand(F, H, W) > 0.5).astype(np.float32),
        smpl_params=sp,
        w2c=np.eye(4, dtype=np.float32),
        Ks=np.tile(K[None], (F, 1, 1)),
        normal_Ks=np.tile(K[None], (F, 1, 1)),
        train_idx=list(range(F)),
        val_idx=[],
        test_idx=[],
    )
    return params, model, ds, TrainConfig(n_views=2, head_prob=0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen-chunk", default="2")
    ap.add_argument("--remat-gen", type=int, default=1)
    ap.add_argument("--remat-gt", type=int, default=0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-sds", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny scene + tiny guidance for quick CPU smoke "
                    "of a knob combination (timings meaningless)")
    ap.add_argument("--sds-mode", choices=["split", "fused"], default="split",
                    help="split: prelude program computes the no-grad UNet "
                    "target (production default); fused: the whole SDS "
                    "traces inside the train step with the weights as a jit "
                    "argument (removes the duplicate gen render + VAE but "
                    "compiles one much larger program)")
    args = ap.parse_args()
    chunk = None if args.gen_chunk.lower() == "none" else int(args.gen_chunk)

    import jax
    import jax.numpy as jnp

    import bench_trainstep as B
    from soar_tpu.render.types import RasterConfig
    from soar_tpu.train.config import StageConfig
    from soar_tpu.train.trainer import (
        init_train_state,
        make_gt_batch,
        make_train_step,
    )

    if args.small:
        params, model, ds, cfg = _small_scene()
        gen_size = 64
        guidance_kw = dict(tiny=True, image_size=64, n_view=cfg.n_views)
    else:
        params, model, ds, cfg = B.build_scene()
        # Gen render resolution A/B (SOAR_BENCH_GEN_RES, default 512): 256
        # renders the gen views AT the guidance resolution (see
        # bench_trainstep.build_step).  The normal-supervision pass stays at
        # the stored maps' 512.
        gen_size = int(os.environ.get("SOAR_BENCH_GEN_RES", "512"))
        guidance_kw = dict(mock=True, image_size=256, n_view=4)
    H, W = ds.images.shape[1:3]
    normal_size = 512 if not args.small else gen_size
    lpips_fn, lpips_vars = B._random_lpips_fn()
    # Shared knob surface with the headline bench (SOAR_BENCH_COMPOSITE /
    # _MAX_PER_TILE / _DUP_SIDE / _FAT_*).
    raster, raster_gen, raster_gt = B._rasters()

    guidance_fn = None
    stage = StageConfig(training_stage=0)
    if not args.no_sds:
        from soar_tpu.guidance.build import build_guidance

        stage = StageConfig(training_stage=0, sds_start=0)
        guidance_fn = build_guidance(
            "imagedream",
            stage,
            key=jax.random.PRNGKey(1),
            dtype=jnp.bfloat16,
            **guidance_kw,
        )

    state, opt = init_train_state(params, cfg, stage=stage)
    raw = make_train_step(
        model,
        cfg,
        stage,
        opt,
        gen_size=(gen_size, gen_size),
        gt_size=(H, W),
        normal_size=(normal_size, normal_size),
        raster=raster,
        raster_gen=raster_gen,
        raster_gt=raster_gt,
        use_explicit=False,
        has_normals=True,
        lpips_fn=lpips_fn,
        lpips_via_batch=True,
        guidance_fn=guidance_fn,
        split_sds=guidance_fn is not None and args.sds_mode == "split",
        sds_via_params=guidance_fn is not None and args.sds_mode == "fused",
        gen_chunk=chunk,
        remat_gen=bool(args.remat_gen),
        remat_gt=bool(args.remat_gt),
    )
    fn = jax.jit(raw)
    prelude = (
        guidance_fn.make_fused_prelude(raw.sds_prelude)
        if raw.sds_prelude is not None
        else None
    )
    gparams = (
        guidance_fn.arg_params
        if guidance_fn is not None and args.sds_mode == "fused"
        else None
    )

    key = jax.random.PRNGKey(0)
    batch = make_gt_batch(ds, model, 0)
    batch["lpips_params"] = lpips_vars
    ref_ip = None
    if guidance_fn is not None and guidance_fn.embed_ref is not None:
        ref_ip = jax.block_until_ready(
            guidance_fn.embed_ref(jnp.asarray(ds.normal_F[0]))
        )
        guidance_fn.release_image_encoder()
    if gparams is not None and ref_ip is not None:
        # fused mode reads the precomputed ip tokens from the batch
        # (cli.train attaches them per-frame the same way).
        batch = dict(batch)
        batch["ref_ip"] = ref_ip

    def one_step(state, batch, k):
        if prelude is not None:
            batch = dict(batch)
            batch["sds_target"] = prelude(state, batch, k, ref_ip=ref_ip)
        if gparams is not None:
            return fn(state, batch, k, gparams)
        return fn(state, batch, k)

    t0 = time.time()
    state, metrics = one_step(state, batch, key)
    print(
        f"compile+1st: {time.time()-t0:.1f}s loss={float(metrics['loss']):.4f}",
        file=sys.stderr,
    )
    best = float("inf")
    for _rep in range(3):
        t0 = time.time()
        for _ in range(args.iters):
            key, k1 = jax.random.split(key)
            state, metrics = one_step(state, batch, k1)
        l = float(metrics["loss"])
        assert l == l
        best = min(best, time.time() - t0)
    capped = float(metrics["raster_capped"])
    if capped:
        print(f"WARNING: {capped} footprint-capped surfels (headline bench "
              "asserts 0 — this knob combination renders holes)",
              file=sys.stderr)
    print(
        f"gen_chunk={chunk} remat_gen={args.remat_gen} remat_gt={args.remat_gt}"
        f" sds={guidance_fn is not None} mode={args.sds_mode}:"
        f" {args.iters/best:.3f} steps/s"
        f" ({best/args.iters*1000:.0f} ms/step)"
    )


if __name__ == "__main__":
    main()
