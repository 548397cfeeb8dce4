"""Run the reference eval protocol (test split PSNR/SSIM[/LPIPS] +
psnrs/ssims/average.txt + test.mp4) on a saved avatar checkpoint.

cli.train --eval only evaluates at the END of its last stage; this tool
evaluates ANY checkpoint (e.g. the candidate run's stage-0 ckpt against a
stage-0-only baseline run — the aligned A/B eval gate compare_runs needs).

    python scripts/eval_ckpt.py --dataroot /tmp/mockcap20 \
        --smpl-model test:10,7,28 --num-subdiv 2 \
        --ckpt outputs/evidence_r5/candidate/stage0 \
        --out outputs/evidence_r5/candidate/test_stage0
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--smpl-model", required=True)
    ap.add_argument("--num-subdiv", type=int, default=2)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--use-explicit", action="store_true")
    ap.add_argument("--max-per-tile", type=int, default=None)
    ap.add_argument("--composite-dtype", type=str, default=None)
    args = ap.parse_args(argv)

    import dataclasses as dc

    from soar_tpu.avatar import RenderSettings
    from soar_tpu.cli.common import real_setup
    from soar_tpu.io.checkpoint import load_avatar
    from soar_tpu.render.types import RasterConfig
    from soar_tpu.train.evaluate import evaluate

    # distill_steps=0: the field comes from the checkpoint, not fresh init.
    ds, params, model = real_setup(
        args.dataroot, args.smpl_model, num_subdiv=args.num_subdiv,
        distill_steps=0,
    )
    params, step = load_avatar(args.ckpt, params)
    print(f"loaded {args.ckpt} @ step {step}", file=sys.stderr)
    raster = RasterConfig()
    if args.max_per_tile is not None:
        raster = dc.replace(raster, max_per_tile=args.max_per_tile)
    if args.composite_dtype is not None:
        raster = dc.replace(raster, composite_dtype=args.composite_dtype)
    res = evaluate(
        params, model, ds, save_dir=args.out,
        settings=RenderSettings(use_explicit=args.use_explicit, raster=raster),
    )
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
