"""Keypoints + person-mask CLI (``preproc/compute_kp_and_mask.py`` parity).

Stage 1: OpenPose binary subprocess (body+hand+face json), gated on the
user-supplied ``--openpose-dir`` (external C++ tool, exactly as the
reference shells out to it).

Stage 2: segmentation prompted by the >0.5-confidence body keypoints,
followed by the reference's cleanup (5x5 morphological open/close + largest
connected component).  Backends:

- ``sam``: SAM ViT-H via the flax port (weights must be supplied —
  this image has no network egress to fetch ``sam_vit_h_4b8939.pth``);
- ``alpha``: use an existing alpha channel in the frames;
- ``bbox``: keypoint-bbox fallback (GrabCut initialized from the keypoint
  bounding box) — lets the pipeline run end-to-end without SAM weights.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import subprocess
from glob import glob

import numpy as np


def cleanup_mask(mask_u8: "np.ndarray") -> "np.ndarray":
    """Morph open/close + largest component (``compute_kp_and_mask.py:70-76``)."""
    import cv2

    kernel = np.ones((5, 5), np.uint8)
    mask = cv2.morphologyEx(mask_u8, cv2.MORPH_OPEN, kernel)
    mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(mask, connectivity=8)
    if n <= 1:
        return mask > 0
    largest = np.argmax(stats[1:, cv2.CC_STAT_AREA]) + 1
    return labels == largest


def grabcut_from_kps(img_bgr, kps) -> "np.ndarray":
    """GrabCut seeded by the keypoint bbox — the no-SAM fallback."""
    import cv2

    conf = kps[kps[:, 2] > 0.5, :2]
    if len(conf) < 4:
        return np.zeros(img_bgr.shape[:2], bool)
    x0, y0 = np.maximum(conf.min(0) - 30, 0).astype(int)
    x1, y1 = conf.max(0) + 30
    x1 = min(int(x1), img_bgr.shape[1] - 1)
    y1 = min(int(y1), img_bgr.shape[0] - 1)
    mask = np.zeros(img_bgr.shape[:2], np.uint8)
    bgd, fgd = np.zeros((1, 65), np.float64), np.zeros((1, 65), np.float64)
    rect = (int(x0), int(y0), int(x1 - x0), int(y1 - y0))
    cv2.grabCut(img_bgr, mask, rect, bgd, fgd, 3, cv2.GC_INIT_WITH_RECT)
    return np.isin(mask, (cv2.GC_FGD, cv2.GC_PR_FGD))


def main(argv=None):
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--openpose-dir", default=None)
    ap.add_argument(
        "--mask-backend", default="bbox", choices=["sam", "alpha", "bbox"]
    )
    ap.add_argument("--sam-checkpoint-path", default=None)
    args = ap.parse_args(argv)

    img_dir = osp.join(args.data_dir, "images")
    kp_dir = osp.join(args.data_dir, "keypoints")
    mask_dir = osp.join(args.data_dir, "masks")
    img_paths = sorted(glob(osp.join(img_dir, "*.png")))

    # --- keypoints via OpenPose (idempotent, ``:29-43``) ---
    have_kps = osp.exists(kp_dir) and len(glob(osp.join(kp_dir, "*.json"))) >= len(
        img_paths
    )
    if have_kps:
        print("Keypoints already computed.")
    elif args.openpose_dir:
        os.makedirs(kp_dir, exist_ok=True)
        cmd = [
            "./build/examples/openpose/openpose.bin",
            "--image_dir", osp.abspath(img_dir),
            "--write_json", osp.abspath(kp_dir),
            "--write_images", osp.abspath(kp_dir),
            "--display", "0", "--hand", "--face",
        ]
        print("Running command:", subprocess.list2cmdline(cmd))
        subprocess.run(cmd, cwd=args.openpose_dir, check=True)
    else:
        raise SystemExit(
            "no keypoints found and --openpose-dir not given: OpenPose is an "
            "external binary the reference also shells out to "
            "(compute_kp_and_mask.py:33-43)"
        )

    if osp.exists(mask_dir) and len(os.listdir(mask_dir)) >= len(img_paths):
        print("Masks already computed.")
        return
    os.makedirs(mask_dir, exist_ok=True)

    from .keypoints import load_keypoints

    keypoints = load_keypoints(kp_dir)

    predictor = None
    if args.mask_backend == "sam":
        from .sam import load_sam_predictor

        predictor = load_sam_predictor(args.sam_checkpoint_path)

    for i, img_path in enumerate(img_paths):
        img = cv2.imread(img_path, cv2.IMREAD_UNCHANGED)
        kps = keypoints[i][:25]
        if args.mask_backend == "alpha":
            if img.shape[-1] != 4:
                raise SystemExit("--mask-backend alpha needs RGBA frames")
            mask = img[..., 3] > 0
        elif args.mask_backend == "sam":
            conf = kps[kps[:, 2] > 0.5, :2]
            raw = predictor(img[..., :3][..., ::-1], conf)
            mask = cleanup_mask((raw > 0).astype(np.uint8) * 255)
        else:
            raw = grabcut_from_kps(img[..., :3], kps)
            mask = cleanup_mask(raw.astype(np.uint8) * 255)
        cv2.imwrite(
            osp.join(mask_dir, f"{i:05d}.png"), mask.astype(np.uint8) * 255
        )
    print(f"wrote {len(img_paths)} masks ({args.mask_backend})")


if __name__ == "__main__":
    main()
