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


def test_insav_end_to_end_real_setup_and_train_step(tmp_path):
    """Full insav_wild path (round-2 verdict next-step #9): a synthetic
    insav-layout capture (images/masks under ``train/``, SMPL-24 params in
    ``train/smpl_parms.pth``, cameras in the standard ``smplx/params.pth``)
    flows through ``real_setup`` and ONE guidance-free train step.  Matches
    the reference's insav support surface: only the body-parameter source
    changes (``utils/smpl.py:182-205``); images/cameras use the custom
    pipeline layout."""
    import os

    import cv2
    import jax
    import jax.numpy as jnp
    import torch

    from soar_tpu.body import make_test_body
    from soar_tpu.cli.common import real_setup
    from soar_tpu.render.types import RasterConfig
    from soar_tpu.train.config import StageConfig, TrainConfig
    from soar_tpu.train.trainer import (
        init_train_state,
        make_gt_batch,
        make_train_step,
    )

    F = 4
    H = W = 48
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "train" / "images"
    mask_dir = tmp_path / "train" / "masks"
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    for i in range(F):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        mask = np.zeros((H, W), np.uint8)
        mask[8:40, 12:36] = 255
        cv2.imwrite(str(img_dir / f"{i:05d}.png"), img)
        cv2.imwrite(str(mask_dir / f"{i:05d}.png"), mask)

    torch.save(
        {
            "beta": torch.from_numpy(rng.randn(1, 10).astype(np.float32) * 0.1),
            "body_pose": torch.from_numpy(
                (rng.randn(F, 72) * 0.05).astype(np.float32)
            ),
            "trans": torch.from_numpy(
                np.tile([[0.0, 0.2, -1.8]], (F, 1)).astype(np.float32)
            ),
        },
        str(tmp_path / "train" / "smpl_parms.pth"),
    )
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    os.makedirs(tmp_path / "train" / "smplx")
    torch.save(
        {
            "w2c": torch.from_numpy(np.eye(4, dtype=np.float32)),
            "Ks": torch.from_numpy(np.tile(K[None], (F, 1, 1))),
            "normal_Ks": torch.from_numpy(np.tile(K[None], (F, 1, 1))),
        },
        str(tmp_path / "train" / "smplx" / "params.pth"),
    )

    body = make_test_body(num_joints=24, segments_per_bone=2, ring=6)
    ds, params, model = real_setup(
        str(tmp_path), smpl_model=None, num_subdiv=0, distill_steps=0,
        body=body,
    )
    # SMPL-24 params reached the avatar: 23 non-root joints.
    assert model.smpl_params["body_pose"].shape == (F, 69)
    assert len(ds.images) == F and ds.image_size == (H, W)

    cfg = TrainConfig(n_views=2)
    state, opt = init_train_state(params, cfg)
    step = jax.jit(
        make_train_step(
            model,
            cfg,
            StageConfig(training_stage=0),
            opt,
            gen_size=(32, 32),
            gt_size=(H, W),
            normal_size=(32, 32),
            raster=RasterConfig(max_per_tile=32, dup_side=3),
            use_explicit=True,
            has_normals=False,
            n_views=2,
        )
    )
    batch = make_gt_batch(ds, model, ds.train_idx[0])
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    assert loss == loss, "loss is NaN"
    assert not np.allclose(
        np.asarray(state2.params.xyz), np.asarray(state.params.xyz)
    )
