"""SMPL-X fitting CLI (``preproc/compute_smplx.py`` parity).

Stage 1: SMPLer-X inference subprocess (external model in its own env, gated
on ``--smplerx-dir`` exactly as the reference, ``compute_smplx.py:37-53``).
Stage 2: SMPLify keypoint refinement (our JAX L-BFGS,
:mod:`soar_tpu.preproc.smplify`).  Writes ``smplx/params.pth`` in the
reference layout (betas/poses/transl + Ks + w2c + img_wh; torch container for
drop-in compatibility with reference-trained pipelines).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import subprocess
from glob import glob

import numpy as np


def load_smplerx_results(result_dir: str) -> dict:
    """``preproc/utils.py:38-...`` load_smplerx: per-frame npz files."""
    paths = sorted(glob(osp.join(result_dir, "*_0.npz")))
    data = [np.load(p) for p in paths]

    def cat(key, reshape=None):
        arr = np.concatenate([np.asarray(d[key], np.float32).reshape(1, -1) for d in data], 0)
        return arr

    return {
        "betas": cat("betas"),
        "global_orient": cat("global_orient"),
        "body_pose": cat("body_pose"),
        "left_hand_pose": cat("left_hand_pose"),
        "right_hand_pose": cat("right_hand_pose"),
        "jaw_pose": cat("jaw_pose"),
        "leye_pose": cat("leye_pose"),
        "reye_pose": cat("reye_pose"),
        "expression": cat("expression"),
        "transl": cat("transl"),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--smplerx-dir", default=None)
    ap.add_argument("--smpl-model", required=True, help="SMPLX_*.npz path")
    ap.add_argument("--preserve-weight", type=float, default=60.0)
    ap.add_argument("--smooth-weight", type=float, default=10000.0)
    args = ap.parse_args(argv)

    img_dir = osp.join(args.data_dir, "images")
    kp_dir = osp.join(args.data_dir, "keypoints")
    smplx_dir = osp.join(args.data_dir, "smplx")
    smplerx_result_dir = osp.join(smplx_dir, "smplx")
    img_paths = sorted(glob(osp.join(img_dir, "*.png")))
    N = len(img_paths)

    n_results = len(glob(osp.join(smplerx_result_dir, "*_0.npz")))
    if osp.exists(smplerx_result_dir) and N == n_results:
        print("SMPLER-X already computed.")
    elif args.smplerx_dir:
        cmd = [
            "python", "inference.py", "--num_gpus", "1",
            "--pretrained_model", "smpler_x_h32",
            "--agora_benchmark", "agora_model",
            "--img_path", osp.abspath(img_dir),
            "--output_folder", osp.abspath(smplx_dir),
            "--show_verts", "--show_bbox",
        ]
        print("Running command:", subprocess.list2cmdline(cmd))
        subprocess.run(cmd, cwd=osp.join(args.smplerx_dir, "main"), check=True)
    else:
        raise SystemExit(
            "no SMPLer-X results and --smplerx-dir not given: SMPLer-X is an "
            "external model the reference also shells out to "
            "(compute_smplx.py:37-53)"
        )

    if osp.exists(osp.join(smplx_dir, "params.pth")):
        print("SMPL-X already optimized.")
        return

    import cv2
    import jax.numpy as jnp

    from ..body.model import load_smplx_npz
    from .keypoints import load_keypoints
    from .smplify import (
        SMPLify,
        SMPLifyConfig,
        smplx_to_openpose25,
        smplx_to_openpose_hands,
    )

    body = load_smplx_npz(args.smpl_model)
    init = load_smplerx_results(smplerx_result_dir)

    def load_K(i):
        with open(osp.join(smplx_dir, f"meta/{i:05d}_0.json")) as f:
            data = json.load(f)
        K = np.eye(3, dtype=np.float32)
        K[0, 0], K[1, 1] = data["focal"]
        K[0, 2], K[1, 2] = data["princpt"]
        return K

    Ks = np.stack([load_K(i) for i in range(N)])
    w2c = np.eye(4, dtype=np.float32)
    h, w = cv2.imread(img_paths[0]).shape[:2]
    img_wh = (w, h)

    keypoints = load_keypoints(kp_dir)
    keypoints[..., :2] /= np.asarray(img_wh, np.float32)
    cfg = SMPLifyConfig(
        preserve_weight=args.preserve_weight,
        smooth_weight=args.smooth_weight,
    )
    if body.lmk_faces_idx is not None:
        # Full reference mapping: all 137 OpenPose columns (body + hands +
        # face contour/landmarks) against the smplx 144-joint output with
        # vertex landmarks (``preproc/utils.py:180-592``); stage 1 zeroes
        # the hand confidences (``kp_confs[:, 25:-70] = 0``).
        target = keypoints
        fitter = SMPLify(
            body, cfg=cfg, hand_kp_slice=(25, 67), openpose137=True
        )
    else:
        # Reduced kinematic-joint mapping for bodies without landmark
        # tables (legacy SMPL pkl): body-25 + hand-21 blocks only.
        target = keypoints[:, :67]
        fitter = SMPLify(
            body,
            np.concatenate(
                [smplx_to_openpose25(), smplx_to_openpose_hands()]
            ),
            cfg,
            hand_kp_slice=(25, 67),
        )
    fitted = fitter.fit(
        {k: jnp.asarray(v) for k, v in init.items()},
        jnp.asarray(Ks),
        jnp.asarray(w2c),
        target,
        img_wh,
    )

    import torch

    out = {k: torch.from_numpy(np.asarray(v)) for k, v in fitted.items()}
    # Reference stores body/hand poses as [F, J, 3].
    for k, j in (("body_pose", 21), ("left_hand_pose", 15), ("right_hand_pose", 15)):
        out[k] = out[k].reshape(N, j, 3)
    out.update(
        {
            "Ks": torch.from_numpy(Ks),
            "w2c": torch.from_numpy(w2c),
            "img_wh": img_wh,
        }
    )
    os.makedirs(smplx_dir, exist_ok=True)
    torch.save(out, osp.join(smplx_dir, "params.pth"))
    print(f"wrote {osp.join(smplx_dir, 'params.pth')}")


if __name__ == "__main__":
    main()
