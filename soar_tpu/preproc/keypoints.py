"""OpenPose keypoint JSON loading (``preproc/utils.py:19-35``)."""

from __future__ import annotations

import json
import os.path as osp
from glob import glob

import numpy as np


def load_keypoints(kp_dir: str) -> np.ndarray:
    """Stack pose + left/right hand + face keypoints -> [F, 137, 3]."""
    kp_paths = sorted(glob(osp.join(kp_dir, "*.json")))
    keypoints = []
    for path in kp_paths:
        with open(path) as f:
            data = json.load(f)
        if not data["people"]:
            # OpenPose found nobody in this frame (occlusion / out of
            # view): zero-filled keypoints with zero confidence, so every
            # downstream consumer weights the frame out instead of the
            # whole sequence dying on an IndexError.
            keypoints.append(np.zeros((137, 3), np.float32))
            continue
        person = data["people"][0]
        keypoints.append(
            np.array(
                person["pose_keypoints_2d"]
                + person["hand_left_keypoints_2d"]
                + person["hand_right_keypoints_2d"]
                + person["face_keypoints_2d"],
                dtype=np.float32,
            ).reshape(-1, 3)
        )
    return np.stack(keypoints, axis=0)
