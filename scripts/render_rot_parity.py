"""Reference-parity harness for render_rot (round-2 verdict next-step #10).

Takes a REAL reference Lightning checkpoint + preprocessed sequence, runs our
full import pipeline (``import_reference_ckpt`` + the attribute-field import)
through ``cli.render_rot``'s turntable, and reports per-view + mean PSNR
against frames rendered by the reference's own ``test/render_rot.py``
(``/root/reference/soar/threestudio-soar/test/render_rot.py:116-197``, which
writes ``<out>/rgb/{i:05d}.png`` etc. with the mask in the alpha channel).

Zero-egress environment: no reference checkpoint exists here, so this script
is the ready-to-execute harness — point it at real artifacts the moment they
are available:

    python scripts/render_rot_parity.py \
        --ckpt /path/to/last.ckpt --dataroot data/custom/dance_0 \
        --smpl-model /path/to/SMPLX_NEUTRAL.npz \
        --ref-frames /path/to/reference_out/rgb \
        --out outputs/rot_parity

Exit code 1 if mean PSNR < --min-psnr (default 30 dB).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def load_png(path):
    import numpy as np

    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise IOError(path)
        if img.ndim == 3 and img.shape[-1] >= 3:
            img = img[..., [2, 1, 0] + ([3] if img.shape[-1] == 4 else [])]
    except ImportError:
        import imageio.v2 as imageio

        img = imageio.imread(path)
    return np.asarray(img, np.float32) / 255.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="reference Lightning .ckpt (geometry.* state_dict)")
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--smpl-model", required=True)
    ap.add_argument("--ref-frames", required=True,
                    help="directory of reference-rendered rgb pngs "
                    "({i:05d}.png, the reference render_rot layout)")
    ap.add_argument("--out", default="outputs/rot_parity")
    ap.add_argument("--num-views", type=int, default=36)
    ap.add_argument("--num-subdiv", type=int, default=2)
    ap.add_argument("--use-explicit", action="store_true")
    ap.add_argument("--ref-alpha-composite", default="white",
                    choices=["white", "black", "none"],
                    help="how to flatten the reference's RGBA frames before "
                    "comparison (our turntable composites over white)")
    ap.add_argument("--min-psnr", type=float, default=30.0)
    args = ap.parse_args(argv)

    import numpy as np

    # 1) Our turntable from the imported reference checkpoint.
    from soar_tpu.cli.render_rot import main as render_rot_main

    rr_args = [
        "--dataroot", args.dataroot,
        "--smpl-model", args.smpl_model,
        "--ckpt", args.ckpt,
        "--out", args.out,
        "--num-views", str(args.num_views),
        "--num-subdiv", str(args.num_subdiv),
    ]
    if args.use_explicit:
        rr_args.append("--use-explicit")
    render_rot_main(rr_args)

    # 2) Pair frames: ours rgb_{i:03d}.png vs reference {i:05d}.png.
    ref_paths = sorted(glob.glob(os.path.join(args.ref_frames, "*.png")))
    ref_paths = [p for p in ref_paths if "video" not in os.path.basename(p)]
    if not ref_paths:
        print(f"no reference frames under {args.ref_frames}", file=sys.stderr)
        return 2

    psnrs = []
    report = []
    for i in range(min(args.num_views, len(ref_paths))):
        ours = load_png(os.path.join(args.out, f"rgb_{i:03d}.png"))[..., :3]
        ref = load_png(ref_paths[i])
        if ref.shape[-1] == 4 and args.ref_alpha_composite != "none":
            a = ref[..., 3:]
            bg = 1.0 if args.ref_alpha_composite == "white" else 0.0
            ref = ref[..., :3] * a + bg * (1.0 - a)
        else:
            ref = ref[..., :3]
        if ref.shape != ours.shape:
            # Reference renders at the capture resolution; resize ours only
            # if the harness was run at a different size.
            import cv2

            ours = cv2.resize(
                ours, (ref.shape[1], ref.shape[0]),
                interpolation=cv2.INTER_AREA,
            )
        mse = float(np.mean((ours - ref) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-10))
        psnrs.append(psnr)
        report.append({"view": i, "psnr": round(psnr, 2)})

    mean_psnr = float(np.mean(psnrs))
    result = {
        "mean_psnr": round(mean_psnr, 2),
        "min_psnr": round(float(np.min(psnrs)), 2),
        "views": report,
        "pass": mean_psnr >= args.min_psnr,
    }
    with open(os.path.join(args.out, "parity.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "views"}))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
