"""Generate a synthetic on-disk capture in the production data layout.

Writes ``<out>/images/*.png``, ``masks/``, ``normal_F/``, ``normal_B``
(RGBA, mask in alpha) and ``smplx/params.pth`` — the exact directory
structure ``preproc/preprocess_custom.py`` produces and
``cli.train --dataroot`` consumes (``/root/reference/README.md:131-143``).

Used with the ``--smpl-model test:J,S,R`` procedural body to drive the
FULL production command path (512px GT, both-faces normals, ImageDream
mock SDS) in this zero-egress environment where no real capture or SMPL-X
npz exists:

    python scripts/make_mock_capture.py --out /tmp/mockcap \
        --frames 8 --size 512 --joints 10
    python -m soar_tpu.cli.train --dataroot /tmp/mockcap \
        --smpl-model test:10,7,28 --num-subdiv 3 --mock-guidance \
        --guidance imagedream --stage both --steps 25 --sds-start 5 \
        --out outputs/evidence_r3
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--joints", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import cv2
    import numpy as np
    import torch

    rng = np.random.RandomState(args.seed)
    F, S = args.frames, args.size
    for sub in ("images", "masks", "normal_F", "normal_B", "smplx"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    # A centered soft blob as the "person": deterministic, non-trivial
    # gradients for every loss term.
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    for i in range(F):
        cx = S / 2 + 30 * np.sin(2 * np.pi * i / F)
        cy = S / 2
        r = ((xx - cx) ** 2 / (S * 0.18) ** 2 + (yy - cy) ** 2 / (S * 0.38) ** 2)
        mask = (r < 1.0).astype(np.uint8) * 255
        img = np.stack(
            [
                (0.5 + 0.5 * np.sin(xx / 37 + i)) * 255,
                (0.5 + 0.5 * np.cos(yy / 29)) * 255,
                np.full_like(xx, 140.0),
            ],
            -1,
        ).astype(np.uint8)
        img[mask == 0] = 0
        cv2.imwrite(os.path.join(args.out, f"images/{i:05d}.png"), img[..., ::-1])
        cv2.imwrite(os.path.join(args.out, f"masks/{i:05d}.png"), mask)
        # Normal maps: RGBA with the mask in alpha (preproc layout).
        nrm = np.stack(
            [
                np.full_like(xx, 127.0),
                np.full_like(xx, 127.0),
                np.full_like(xx, 255.0),
                mask.astype(np.float32),
            ],
            -1,
        ).astype(np.uint8)
        cv2.imwrite(
            os.path.join(args.out, f"normal_F/{i:05d}.png"),
            nrm[..., [2, 1, 0, 3]],
        )
        cv2.imwrite(
            os.path.join(args.out, f"normal_B/{i:05d}.png"),
            nrm[..., [2, 1, 0, 3]],
        )

    J = args.joints
    K = np.array(
        [[1.1 * S, 0, S / 2], [0, 1.1 * S, S / 2], [0, 0, 1]], np.float32
    )
    params = {
        "betas": torch.zeros(1, 4),
        "body_pose": torch.from_numpy(
            (rng.randn(F, (J - 1) * 3) * 0.05).astype(np.float32)
        ),
        "global_orient": torch.zeros(F, 3),
        "transl": torch.from_numpy(
            np.tile([[0.0, 0.9, -2.8]], (F, 1)).astype(np.float32)
        ),
        "w2c": torch.from_numpy(np.eye(4, dtype=np.float32)),
        "Ks": torch.from_numpy(np.tile(K[None], (F, 1, 1))),
        "normal_Ks": torch.from_numpy(np.tile(K[None], (F, 1, 1))),
        "img_wh": torch.tensor([S, S]),
    }
    torch.save(params, os.path.join(args.out, "smplx", "params.pth"))
    print(f"wrote {F} frames @ {S}px + smplx/params.pth under {args.out}")


if __name__ == "__main__":
    main()
