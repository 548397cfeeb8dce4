"""Converters vs upstream-transcribed key manifests (VERDICT r2 missing #3).

Round-trip tests validate each converter against OUR inverse layout; these
tests validate them against an INDEPENDENT transcription of the public
upstream state_dict inventory (``soar_tpu/guidance/manifest.py``): a
zero-filled state_dict built from the manifest must convert with ZERO
missing keys (no KeyError) and ZERO unconsumed keys (no silently dropped
weights), and the converted tree must match the flax module's own variable
structure and shapes (via ``jax.eval_shape`` — no FLOPs, so the FULL-SHAPE
320-ch UNet / ViT-H configs are tested, not tiny stand-ins).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soar_tpu.guidance.manifest import (
    TrackedStateDict,
    clip_vit_h_key_manifest,
    resampler_key_manifest,
    unet_key_manifest,
    vae_encoder_key_manifest,
)


def _zeros_sd(manifest):
    return {k: np.zeros(s, np.float32) for k, s in manifest.items()}


def _assert_same_shapes(tree, shape_tree, where):
    la = jax.tree_util.tree_flatten_with_path(tree)[0]
    lb = jax.tree_util.tree_flatten_with_path(shape_tree)[0]
    assert jax.tree_util.tree_structure(tree) == jax.tree_util.tree_structure(
        shape_tree
    ), f"{where}: converted tree structure != flax init structure"
    for (pa, a), (_, b) in zip(la, lb):
        assert tuple(a.shape) == tuple(b.shape), (where, pa, a.shape, b.shape)


def _no_warnings(record):
    msgs = [str(w.message) for w in record]
    assert not msgs, msgs


def test_unet_manifest_fully_consumed_ipmv():
    from soar_tpu.guidance.build import NetworkShapes, _mock_unet_vae_shapes
    from soar_tpu.guidance.networks import convert_unet_torch_params

    shapes = NetworkShapes.full()
    sd = TrackedStateDict(_zeros_sd(unet_key_manifest(ipmv=True)), "unet")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = convert_unet_torch_params(sd, shapes.unet)
    _no_warnings(rec)
    assert sd.unconsumed() == []
    unet_shapes, _ = _mock_unet_vae_shapes(shapes, n_view=4, with_ip=True)
    _assert_same_shapes(out, unet_shapes, "unet-ipmv")


def test_unet_manifest_fully_consumed_text_only():
    from soar_tpu.guidance.build import NetworkShapes, _mock_unet_vae_shapes
    from soar_tpu.guidance.networks import convert_unet_torch_params

    shapes = NetworkShapes.full()
    sd = TrackedStateDict(_zeros_sd(unet_key_manifest(ipmv=False)), "unet")
    out = convert_unet_torch_params(sd, shapes.unet)
    assert sd.unconsumed() == []
    unet_shapes, _ = _mock_unet_vae_shapes(shapes, n_view=4, with_ip=False)
    _assert_same_shapes(out, unet_shapes, "unet-mvdream")


def test_unet_missing_key_reports_near_miss():
    from soar_tpu.guidance.networks import convert_unet_torch_params

    m = unet_key_manifest(ipmv=False)
    sd = _zeros_sd(m)
    del sd["middle_block.0.in_layers.0.weight"]
    with pytest.raises(KeyError) as ei:
        convert_unet_torch_params(sd)
    msg = str(ei.value)
    assert "middle_block.0.in_layers.0.weight" in msg
    assert "nearest" in msg


def test_vae_manifest_fully_consumed():
    from soar_tpu.guidance.build import NetworkShapes, _mock_unet_vae_shapes
    from soar_tpu.guidance.networks import convert_vae_torch_params

    sd = TrackedStateDict(_zeros_sd(vae_encoder_key_manifest()), "vae")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = convert_vae_torch_params(sd)
    _no_warnings(rec)
    assert sd.unconsumed() == []
    _, vae_shapes = _mock_unet_vae_shapes(
        NetworkShapes.full(), n_view=4, with_ip=False
    )
    _assert_same_shapes(out, vae_shapes, "vae")


def test_vae_decoder_keys_are_expected_leftovers():
    """A FULL AutoencoderKL dict carries the decoder; the converter must not
    warn about it (encoder-only use is by design) but must warn about an
    unexpected encoder leftover."""
    from soar_tpu.guidance.networks import convert_vae_torch_params

    sd = _zeros_sd(vae_encoder_key_manifest())
    sd["decoder.conv_in.weight"] = np.zeros((512, 4, 3, 3), np.float32)
    sd["post_quant_conv.weight"] = np.zeros((4, 4, 1, 1), np.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        convert_vae_torch_params(sd)
    _no_warnings(rec)

    sd["encoder.mystery.weight"] = np.zeros((1,), np.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        convert_vae_torch_params(sd)
    assert any("encoder.mystery.weight" in str(w.message) for w in rec)


def test_clip_vit_h_manifest_fully_consumed():
    from soar_tpu.guidance.clip_vit import (
        CLIPViT,
        CLIPVisionConfig,
        convert_clip_vit_torch_params,
    )

    cfg = CLIPVisionConfig()  # full ViT-H/14
    prefix = "embedder.model.visual."
    manifest = clip_vit_h_key_manifest(prefix=prefix)
    sd = TrackedStateDict(_zeros_sd(manifest), "clip")
    # Non-visual keys of the embedded open_clip model must be ignored
    # silently (text tower etc.).
    sd["embedder.model.logit_scale"] = np.zeros((), np.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = convert_clip_vit_torch_params(sd, cfg, prefix=prefix)
    _no_warnings(rec)
    assert [k for k in sd.unconsumed() if k.startswith(prefix)] == []

    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    clip_shapes = jax.eval_shape(
        CLIPViT(cfg).init, jax.random.PRNGKey(0), dummy
    )
    _assert_same_shapes(out, clip_shapes, "clip-vit-h")


def test_resampler_manifest_fully_consumed():
    from soar_tpu.guidance.clip_vit import (
        CLIPVisionConfig,
        Resampler,
        ResamplerConfig,
        convert_resampler_torch_params,
    )

    cfg = ResamplerConfig()  # ImageDream ipmv config
    clip_cfg = CLIPVisionConfig()
    manifest = resampler_key_manifest(
        dim=cfg.dim,
        depth=cfg.depth,
        dim_head=cfg.dim_head,
        heads=cfg.heads,
        num_queries=cfg.num_queries,
        embedding_dim=cfg.embedding_dim,
        output_dim=cfg.output_dim,
        ff_mult=cfg.ff_mult,
    )
    sd = TrackedStateDict(_zeros_sd(manifest), "resampler")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = convert_resampler_torch_params(sd, cfg)
    _no_warnings(rec)
    assert sd.unconsumed() == []

    n_tok = 1 + (clip_cfg.image_size // clip_cfg.patch_size) ** 2
    dummy = jnp.zeros((1, n_tok, cfg.embedding_dim))
    res_shapes = jax.eval_shape(
        Resampler(cfg).init, jax.random.PRNGKey(0), dummy
    )
    _assert_same_shapes(out, res_shapes, "resampler")


def test_sam_vit_h_manifest_fully_consumed():
    from soar_tpu.guidance.manifest import sam_vit_h_key_manifest
    from soar_tpu.preproc.sam import SAM, SAMConfig, convert_sam_params

    cfg = SAMConfig()  # full ViT-H
    sd = TrackedStateDict(_zeros_sd(sam_vit_h_key_manifest()), "sam")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = convert_sam_params(sd, cfg)
    # Box-corner / mask-prompt keys are expected leftovers and must NOT
    # warn; nothing else may remain.
    _no_warnings(rec)
    left = sd.unconsumed()
    assert all(
        k.startswith(("prompt_encoder.point_embeddings.2",
                      "prompt_encoder.point_embeddings.3",
                      "prompt_encoder.mask_downscaling."))
        for k in left
    ), left

    image = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    points = jnp.zeros((1, 2, 2))
    labels = jnp.zeros((1, 2))
    sam_shapes = jax.eval_shape(
        SAM(cfg).init, jax.random.PRNGKey(0), image, points, labels
    )
    _assert_same_shapes(out, sam_shapes, "sam-vit-h")
