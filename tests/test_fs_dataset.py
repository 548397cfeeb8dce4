import os
import os.path as osp

import numpy as np
import pytest

from soar_tpu.data.dataset import circle_poses, load_fs_sequence


def test_circle_poses_look_at_origin():
    c2w = circle_poses(np.full(4, 3.0), np.full(4, 90.0), np.arange(4) * 90.0)
    assert c2w.shape == (4, 4, 4)
    for p in c2w:
        # Camera forward (-z column) points toward the origin.
        fwd = -p[:3, 2]
        to_origin = -p[:3, 3] / np.linalg.norm(p[:3, 3])
        np.testing.assert_allclose(fwd, to_origin, atol=1e-5)


def test_load_fs_sequence(tmp_path):
    import cv2

    root = str(tmp_path)
    for d in ("basecolor", "mask", "normal"):
        os.makedirs(osp.join(root, d))
    F, H, W = 6, 64, 64
    rng = np.random.RandomState(0)
    for i in range(F):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        mask = np.zeros((H, W), np.uint8)
        mask[16:48, 16:48] = 255
        nrm = rng.randint(0, 255, (H, W, 3), np.uint8)
        cv2.imwrite(osp.join(root, "basecolor", f"{i:03d}.png"), img)
        cv2.imwrite(osp.join(root, "mask", f"{i:03d}.png"), mask)
        cv2.imwrite(osp.join(root, "normal", f"{i:03d}.png"), nrm)

    ds = load_fs_sequence(root, train_views=(0, 4))
    assert ds.images.shape == (F, H, W, 3)
    assert ds.w2c.shape == (F, 4, 4)  # per-view extrinsics
    assert ds.train_idx == [0, 4]
    assert len(ds.val_idx) + len(ds.test_idx) == F - 2
    # Normals got rotated + normalized into [0,1].
    assert ds.normal_F.min() >= 0.0 and ds.normal_F.max() <= 1.0
    # gt_c2w differs per frame.
    assert not np.allclose(ds.gt_c2w(0), ds.gt_c2w(3))
