import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_normal_net_tiny_shapes():
    from soar_tpu.preproc.normal_net import GlobalGenerator, NormalNet

    gen = GlobalGenerator(ngf=8, n_downsampling=2, n_blocks=2)
    x = jnp.zeros((1, 64, 64, 6))
    params = gen.init(jax.random.PRNGKey(0), x)
    y = gen.apply(params, x)
    assert y.shape == (1, 64, 64, 3)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh range


def test_normal_net_dual_heads_and_mask():
    import flax.linen as nn

    from soar_tpu.preproc import normal_net as N

    class TinyNormalNet(nn.Module):
        @nn.compact
        def __call__(self, image, t_f, t_b):
            nmlF = N.GlobalGenerator(ngf=4, n_downsampling=1, n_blocks=1, name="netF")(
                jnp.concatenate([image, t_f], -1)
            )
            nmlB = N.GlobalGenerator(ngf=4, n_downsampling=1, n_blocks=1, name="netB")(
                jnp.concatenate([image, t_b], -1)
            )
            mask = (jnp.sum(jnp.abs(image), -1, keepdims=True) != 0).astype(
                image.dtype
            )
            return nmlF * mask, nmlB * mask

    net = TinyNormalNet()
    img = jnp.zeros((1, 32, 32, 3)).at[:, 8:24, 8:24].set(0.5)
    t = jnp.zeros((1, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(0), img, t, t)
    f, b = net.apply(params, img, t, t)
    assert f.shape == (1, 32, 32, 3)
    # masked outside the foreground
    np.testing.assert_allclose(f[0, 0, 0], 0.0, atol=1e-6)


def test_sam_tiny_forward():
    from soar_tpu.preproc.sam import SAM, SAMConfig

    cfg = SAMConfig(
        img_size=64,
        patch_size=16,
        embed_dim=32,
        depth=2,
        num_heads=4,
        global_attn_layers=(1,),
        window_size=2,
        out_chans=16,
        decoder_dim=16,
        decoder_depth=1,
    )
    sam = SAM(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    pts = jnp.asarray([[[0.5, 0.5], [0.2, 0.8]]])
    lbl = jnp.asarray([[1, 1]])
    params = sam.init(jax.random.PRNGKey(0), img, pts, lbl)
    masks, iou = sam.apply(params, img, pts, lbl)
    assert masks.shape == (1, 4, 16, 16)  # 4 mask tokens, 4x upscale of 4x4
    assert iou.shape == (1, 4)


def test_transform_K_by_bbox():
    from soar_tpu.preproc.compute_normal import crop_grid, transform_K_by_bbox

    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    bbox = (100, 80, 356, 336)  # 256x256 crop
    Kc = transform_K_by_bbox(K, bbox, (512, 512))
    # scale = 2: focal doubles, principal shifts into crop frame
    # (half-pixel convention: (cx - x0 + 0.5)*s - 0.5).
    assert abs(Kc[0, 0] - 1000.0) < 1e-4
    assert abs(Kc[0, 2] - ((320 - 100 + 0.5) * 2 - 0.5)) < 1e-4

    # The resample grid must be the exact inverse of the K transform: a
    # source coordinate u_src projected through Kc lands on crop pixel u,
    # and crop pixel u samples the source at u_src.
    mx, my = crop_grid(bbox, (512, 512))
    sx = 512 / (bbox[2] - bbox[0])
    for u in (0, 1, 255, 511):
        u_src = mx[0, u]
        u_crop = (u_src - bbox[0] + 0.5) * sx - 0.5
        assert abs(u_crop - u) < 1e-4, (u, u_crop)


def test_mask_cleanup_keeps_largest_component():
    from soar_tpu.preproc.compute_kp_and_mask import cleanup_mask

    m = np.zeros((64, 64), np.uint8)
    m[10:40, 10:40] = 255  # big blob
    m[50:54, 50:54] = 255  # small blob
    out = cleanup_mask(m)
    assert out[20, 20] and not out[51, 51]


def test_extract_frames_cv2(tmp_path):
    import cv2

    from soar_tpu.preproc.extract_frames import main as extract_main

    vid = osp.join(str(tmp_path), "seq.mp4")
    vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    if not vw.isOpened():
        pytest.skip("no mp4 encoder available")
    for i in range(12):
        frame = np.full((48, 64, 3), i * 20, np.uint8)
        vw.write(frame)
    vw.release()

    extract_main(
        [
            "--video-path", vid,
            "--data-root", str(tmp_path),
            "--skip-time", "3",
        ]
    )
    imgs = sorted(os.listdir(osp.join(str(tmp_path), "seq", "images")))
    assert len(imgs) == 4  # every 3rd of 12
