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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen-chunk", default="2")
    ap.add_argument("--remat-gen", type=int, default=1)
    ap.add_argument("--remat-gt", type=int, default=0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-sds", action="store_true")
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

    params, model, ds, cfg = B.build_scene()
    H, W = ds.images.shape[1:3]
    lpips_fn = B._random_lpips_fn()
    raster = RasterConfig(max_per_tile=96, dup_side=5)

    guidance_fn = None
    stage = StageConfig(training_stage=0)
    if not args.no_sds:
        from soar_tpu.guidance.build import build_guidance

        stage = StageConfig(training_stage=0, sds_start=0)
        guidance_fn = build_guidance(
            "imagedream",
            stage,
            key=jax.random.PRNGKey(1),
            mock=True,
            image_size=256,
            n_view=4,
            dtype=jnp.bfloat16,
        )

    state, opt = init_train_state(params, cfg, stage=stage)
    raw = make_train_step(
        model,
        cfg,
        stage,
        opt,
        gen_size=(512, 512),
        gt_size=(H, W),
        normal_size=(512, 512),
        raster=raster,
        use_explicit=False,
        has_normals=True,
        lpips_fn=lpips_fn,
        guidance_fn=guidance_fn,
        split_sds=guidance_fn is not None,
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

    key = jax.random.PRNGKey(0)
    batch = make_gt_batch(ds, model, 0)
    ref_ip = None
    if prelude is not None and guidance_fn.embed_ref is not None:
        ref_ip = jax.block_until_ready(
            guidance_fn.embed_ref(jnp.asarray(ds.normal_F[0]))
        )
        guidance_fn.release_image_encoder()

    def one_step(state, batch, k):
        if prelude is not None:
            batch = dict(batch)
            batch["sds_target"] = prelude(state, batch, k, ref_ip=ref_ip)
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
        f" sds={guidance_fn is not None}: {args.iters/best:.3f} steps/s"
        f" ({best/args.iters*1000:.0f} ms/step)"
    )


if __name__ == "__main__":
    main()
