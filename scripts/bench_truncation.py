"""Image-space error bound for the static-capacity truncation (+ the bf16
composite knob) at PRODUCTION knobs — VERDICT r4 missing #4 / task 3.

The reference composite is exact given its sort (``cuda_rasterizer/
forward.cu:497-633``); our tiled rasterizer drops each tile's
farthest-beyond-K splats (benign under saturated front-to-back compositing
— they sit behind ~K opaque surfels) and footprint-caps surfels wider than
their slot grid.  The standing "dropped is benign" claim was only ever a
one-step total-loss scalar; this script measures the claim where it
matters: IMAGE space, at the production 512px / ~125k-surfel shape.

For each config (K=96 default, K=64 fast knob, two-tier gen grid, bf16
composite) it renders the bench scene's GT camera + a gen-view camera with
the production tiled rasterizer and with :mod:`soar_tpu.render.oracle`
(every pixel composites over ALL surfels in exact depth order — the
reference semantics, no tile capacity at all), and reports per-channel
image PSNR of the difference plus the overflow counters.

Run ON the TPU chip (the oracle at 512px x 125k surfels is O(N*P); the
tiled renders take ~50 ms, the oracle ~minutes):

    python scripts/bench_truncation.py [--out docs/bench_runs/...json]

CPU smoke (tiny scene, sanity only): --small.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b, mask=None):
    import numpy as np

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if mask is not None:
        m = np.asarray(mask, bool)
        if a.ndim == 3:
            m = np.broadcast_to(m[..., None], a.shape)
        a, b = a[m], b[m]
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(1.0 / mse))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny CPU smoke instead of the production scene")
    ap.add_argument("--ckpt", type=str, default=None,
                    help="orbax avatar checkpoint (cli.train output dir) to "
                    "measure at a TRAINED state — the representative "
                    "number: the fresh-init scene is a translucent cloud "
                    "hundreds of splats deep where past-K splats still "
                    "carry real light, while a trained avatar saturates "
                    "at the surface")
    ap.add_argument("--out", type=str, default=None,
                    help="also append the JSON result to this file")
    ap.add_argument("--oracle-chunk", type=int, default=256,
                    help="oracle pixel chunk (memory vs dispatch tradeoff)")
    ap.add_argument("--dataroot", type=str, default=None,
                    help="measure on a capture scene (with --smpl-model/"
                    "--num-subdiv) instead of the 125k bench scene — for "
                    "--ckpt files trained at other shapes")
    ap.add_argument("--smpl-model", type=str, default="test:10,7,28")
    ap.add_argument("--num-subdiv", type=int, default=2)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from soar_tpu.avatar import RenderSettings
    from soar_tpu.avatar.renderer import posed_gaussians, query_attributes
    from soar_tpu.core.camera import camera_from_c2w
    from soar_tpu.data.cameras import CameraSampleConfig, sample_multiview_cameras
    from soar_tpu.render.oracle import rasterize_oracle
    from soar_tpu.render.tiled import rasterize
    from soar_tpu.render.types import RasterConfig
    from soar_tpu.train.trainer import make_gt_batch

    if args.small:
        from soar_tpu.cli.common import synthetic_setup

        ds, params, model = synthetic_setup(distill_steps=0)
        H = W = 128
    elif args.dataroot:
        from soar_tpu.cli.common import real_setup

        ds, params, model = real_setup(
            args.dataroot, args.smpl_model, num_subdiv=args.num_subdiv,
            distill_steps=0,
        )
        H, W = ds.image_size
    else:
        from bench_trainstep import build_scene

        params, model, ds, _cfg = build_scene()
        H = W = 512
    if args.ckpt:
        from soar_tpu.io.checkpoint import load_avatar

        params, step = load_avatar(args.ckpt, params)
        print(f"[trunc] loaded {args.ckpt} @ step {step}", file=sys.stderr)

    settings = RenderSettings(use_explicit=False)
    attrs = query_attributes(params, model)

    # Production cameras: the frame-0 GT camera and one sampled gen view
    # (gen uses the "+z,+x,+y" permuted frame — posed_gaussians handles it).
    batch = make_gt_batch(ds, model, 0)
    gt_cam = batch["gt_cam"]
    c2w, fovy = sample_multiview_cameras(
        jax.random.PRNGKey(3), CameraSampleConfig(n_view=4)
    )
    gen_cam = camera_from_c2w(c2w[0], fovy[0], fovy[0], znear=0.1, zfar=100.0)

    g_gt, _ = posed_gaussians(
        params, model, jnp.asarray(0), settings, attrs=attrs
    )
    g_gen, _ = posed_gaussians(
        params, model, jnp.asarray(0),
        dataclasses.replace(settings, gen_view=True), attrs=attrs,
    )
    bg = jnp.zeros(3)

    base = RasterConfig()  # production defaults
    configs = {
        "K96": dataclasses.replace(base, max_per_tile=96),
        "K64": dataclasses.replace(base, max_per_tile=64),
        "K96_bf16": dataclasses.replace(
            base, max_per_tile=96, composite_dtype="bf16"
        ),
        "K64_bf16": dataclasses.replace(
            base, max_per_tile=64, composite_dtype="bf16"
        ),
    }
    views = {"gt": (g_gt, gt_cam), "gen": (g_gen, gen_cam)}

    result = {
        "shape": f"{H}px_{int(params.xyz.shape[0])}surfels",
        "state": args.ckpt or "fresh-init",
    }
    for vname, (g, cam) in views.items():
        t0 = time.time()
        oracle = rasterize_oracle(
            g, cam, (H, W), bg, base, pixel_chunk=args.oracle_chunk
        )
        o_color = np.asarray(oracle.color)
        o_normal = np.asarray(oracle.normal)
        o_opac = np.asarray(oracle.opac)
        print(f"[{vname}] oracle: {time.time()-t0:.1f}s", file=sys.stderr)
        # Error inside the rendered silhouette: a mostly-background image
        # would inflate PSNR with trivially-identical empty pixels.
        m = o_opac > 1e-3
        result[f"{vname}_coverage_frac"] = round(float(m.mean()), 4)
        for cname, cfg in configs.items():
            t0 = time.time()
            out = rasterize(g, cam, (H, W), bg, cfg)
            ov = np.asarray(out.overflow)
            r = {
                "color_psnr": round(psnr(out.color, o_color, m), 2),
                "normal_psnr": round(
                    psnr(
                        (np.asarray(out.normal) + 1) / 2,
                        (o_normal + 1) / 2,
                        m,
                    ),
                    2,
                ),
                "opac_mae": round(
                    float(np.abs(np.asarray(out.opac) - o_opac).mean()), 6
                ),
                "dropped": int(ov[0]),
                "capped": int(ov[1]),
            }
            result[f"{vname}_{cname}"] = r
            print(
                f"[{vname}/{cname}] {json.dumps(r)} "
                f"({time.time()-t0:.1f}s)",
                file=sys.stderr,
            )

    print(json.dumps(result))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    main()
