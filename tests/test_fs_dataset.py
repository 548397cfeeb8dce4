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


def test_circle_poses_reference_rig_exactly():
    """Pin the reference construction (``uncond_multiview.py:2399-2413``):
    right = cross(forward, up) with forward = normalize(center) — an
    IMPROPER frame (det -1, the world x-mirror the FS GT images follow) —
    and x-column = that cross product, not its negation (regression: a
    proper look-at rendered every FS view horizontally mirrored vs GT)."""
    r, th = 3.2, 90.0
    phis = np.array([0.0, -45.0, -90.0])  # reference range(0, -360, -45)
    c2w = circle_poses(np.full(3, r), np.full(3, th), phis)
    for p, phi in zip(c2w, np.deg2rad(phis)):
        pos = np.array([r * np.sin(phi), 0.0, r * np.cos(phi)])
        np.testing.assert_allclose(p[:3, 3], pos, atol=1e-5)
        assert np.linalg.det(p[:3, :3]) < 0  # improper, like the reference
        fwd = pos / np.linalg.norm(pos)
        np.testing.assert_allclose(p[:3, 2], fwd, atol=1e-6)
        right = np.cross(fwd, [0.0, 1.0, 0.0])
        right = right / np.linalg.norm(right)
        np.testing.assert_allclose(p[:3, 0], right, atol=1e-6)
    # Frontal view (phi=0): the x-column must be -x̂ (cross(+ẑ, ŷ)).
    np.testing.assert_allclose(c2w[0][:3, 0], [-1.0, 0.0, 0.0], atol=1e-6)


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
    # Normals got rotated + normalized into [0,1], resized onto the 512²
    # supervision grid with a matching camera.
    assert ds.normal_F.shape == (F, 512, 512, 3)
    assert ds.normal_mask.shape == (F, 512, 512)
    assert abs(ds.normal_Ks[0][0, 0] - ds.Ks[0][0, 0] * 512.0 / H) < 1e-4
    assert ds.normal_F.min() >= 0.0 and ds.normal_F.max() <= 1.0
    # FS ships no back normals: marked absent (empty), never zero images
    # that the normal_B loss would supervise against (reference FS sets
    # gt_normal_B = None and the _fs configs zero lambda_normal_B).
    assert ds.normal_B.size == 0
    from soar_tpu.train.trainer import make_gt_batch

    class _M:  # make_gt_batch only touches ds fields
        pass

    batch = make_gt_batch(ds, _M(), 0)
    assert "gt_normal_F" in batch and "gt_normal_B" not in batch
    # gt_c2w differs per frame.
    assert not np.allclose(ds.gt_c2w(0), ds.gt_c2w(3))


def test_load_insav_smpl_params(tmp_path):
    """insav_wild param layout (``utils/smpl.py:193-205``): beta [1, 10],
    body_pose [F, 72] w/ global orient in the first 3, trans [F, 3]."""
    import os

    import numpy as np
    import torch

    from soar_tpu.data.dataset import load_insav_smpl_params

    F = 5
    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "train")
    torch.save(
        {
            "beta": torch.from_numpy(rng.randn(1, 10).astype(np.float32)),
            "body_pose": torch.from_numpy(
                rng.randn(F, 72).astype(np.float32)
            ),
            "trans": torch.from_numpy(rng.randn(F, 3).astype(np.float32)),
        },
        str(tmp_path / "train" / "smpl_parms.pth"),
    )
    p = load_insav_smpl_params(str(tmp_path))
    assert p["betas"].shape == (1, 10)
    assert p["global_orient"].shape == (F, 3)
    assert p["body_pose"].shape == (F, 69)
    assert p["transl"].shape == (F, 3)

    # a 24-joint test body consumes these params end-to-end (SMPL-24 mode)
    import jax.numpy as jnp

    from soar_tpu.avatar import init_avatar
    from soar_tpu.body import make_test_body
    from soar_tpu.field.attribute_field import AttributeFieldConfig
    from soar_tpu.field.hashgrid import HashGridConfig

    body = make_test_body(num_joints=24, segments_per_bone=1, ring=4)
    params, model = init_avatar(
        body,
        {k: jnp.asarray(v) for k, v in p.items()},
        num_subdiv=0,
        field_cfg=AttributeFieldConfig(
            grid=HashGridConfig(num_levels=2, min_res=4, max_res=8,
                                log2_hashmap_size=8),
            hidden_dim=8,
        ),
        distill_steps=0,
    )
    assert params.xyz.shape[0] > 0
