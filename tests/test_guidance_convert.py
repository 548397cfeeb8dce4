"""Torch->flax weight-converter round-trip tests.

No pretrained checkpoints exist in this environment, so each converter is
validated by the inverse recipe (VERDICT r1 #2): initialize the tiny-config
flax network, write its params into a torch-LAYOUT state_dict (the inverse
mapping, written here against the LDM/open_clip/IP-Adapter naming), run the
converter, and assert the reconstructed variables match the originals
exactly — plus literal-key spot checks against the known upstream naming so
both directions can't share a renaming bug.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soar_tpu.guidance.clip_vit import (
    CLIPViT,
    CLIPVisionConfig,
    Resampler,
    ResamplerConfig,
    convert_clip_vit_torch_params,
    convert_resampler_torch_params,
)
from soar_tpu.guidance.networks import (
    MultiViewUNet,
    VAEEncoder,
    convert_unet_torch_params,
    convert_vae_torch_params,
)

# ---------------------------------------------------------------------------
# inverse (flax -> torch layout) builders


def _inv_lin(sd, prefix, d):
    sd[prefix + ".weight"] = np.asarray(d["kernel"]).T
    if "bias" in d:
        sd[prefix + ".bias"] = np.asarray(d["bias"])


def _inv_conv(sd, prefix, d):
    sd[prefix + ".weight"] = np.transpose(np.asarray(d["kernel"]), (3, 2, 0, 1))
    if "bias" in d:
        sd[prefix + ".bias"] = np.asarray(d["bias"])


def _inv_norm(sd, prefix, d):
    sd[prefix + ".weight"] = np.asarray(d["scale"])
    sd[prefix + ".bias"] = np.asarray(d["bias"])


def unet_flax_to_torch_sd(params, u: MultiViewUNet):
    p = params["params"]
    sd = {}

    def resblock(tp, d):
        _inv_norm(sd, tp + ".in_layers.0", d["GroupNorm_0"])
        _inv_conv(sd, tp + ".in_layers.2", d["Conv_0"])
        _inv_lin(sd, tp + ".emb_layers.1", d["Dense_0"])
        _inv_norm(sd, tp + ".out_layers.0", d["GroupNorm_1"])
        _inv_conv(sd, tp + ".out_layers.3", d["Conv_1"])
        if "Conv_2" in d:
            _inv_conv(sd, tp + ".skip_connection", d["Conv_2"])

    def attention(tp, d):
        _inv_lin(sd, tp + ".to_q", d["to_q"])
        _inv_lin(sd, tp + ".to_k", d["to_k"])
        _inv_lin(sd, tp + ".to_v", d["to_v"])
        _inv_lin(sd, tp + ".to_out.0", d["to_out"])
        if "to_k_ip" in d:  # decoupled image-prompt projections (ipmv)
            _inv_lin(sd, tp + ".to_k_ip", d["to_k_ip"])
            _inv_lin(sd, tp + ".to_v_ip", d["to_v_ip"])

    def transformer(tp, d):
        _inv_norm(sd, tp + ".norm", d["GroupNorm_0"])
        _inv_lin(sd, tp + ".proj_in", d["proj_in"])
        b = d["block0"]
        _inv_norm(sd, tp + ".transformer_blocks.0.norm1", b["norm1"])
        attention(tp + ".transformer_blocks.0.attn1", b["attn1"])
        _inv_norm(sd, tp + ".transformer_blocks.0.norm2", b["norm2"])
        attention(tp + ".transformer_blocks.0.attn2", b["attn2"])
        _inv_norm(sd, tp + ".transformer_blocks.0.norm3", b["norm3"])
        _inv_lin(
            sd, tp + ".transformer_blocks.0.ff.net.0.proj",
            b["GEGLU_0"]["Dense_0"],
        )
        _inv_lin(sd, tp + ".transformer_blocks.0.ff.net.2", b["Dense_0"])
        _inv_lin(sd, tp + ".proj_out", d["proj_out"])

    _inv_lin(sd, "time_embed.0", p["time_embed_0"])
    _inv_lin(sd, "time_embed.2", p["time_embed_2"])
    if "camera_embed_0" in p:
        _inv_lin(sd, "camera_embed.0", p["camera_embed_0"])
        _inv_lin(sd, "camera_embed.2", p["camera_embed_2"])
    _inv_conv(sd, "input_blocks.0.0", p["input_conv"])
    n = 1
    for level in range(len(u.channel_mult)):
        for i in range(u.num_res_blocks):
            resblock(f"input_blocks.{n}.0", p[f"down_{level}_{i}_res"])
            if level in u.attention_levels:
                transformer(f"input_blocks.{n}.1", p[f"down_{level}_{i}_attn"])
            n += 1
        if level != len(u.channel_mult) - 1:
            _inv_conv(sd, f"input_blocks.{n}.0.op", p[f"down_{level}_ds"])
            n += 1
    resblock("middle_block.0", p["mid_res0"])
    transformer("middle_block.1", p["mid_attn"])
    resblock("middle_block.2", p["mid_res1"])
    n = 0
    for level in reversed(range(len(u.channel_mult))):
        for i in range(u.num_res_blocks + 1):
            resblock(f"output_blocks.{n}.0", p[f"up_{level}_{i}_res"])
            idx = 1
            if level in u.attention_levels:
                transformer(f"output_blocks.{n}.1", p[f"up_{level}_{i}_attn"])
                idx = 2
            if level != 0 and i == u.num_res_blocks:
                _inv_conv(sd, f"output_blocks.{n}.{idx}.conv", p[f"up_{level}_us"])
            n += 1
    _inv_norm(sd, "out.0", p["out_norm"])
    _inv_conv(sd, "out.2", p["out_conv"])
    return sd


def vae_flax_to_torch_sd(params, channel_mult):
    p = params["params"]
    sd = {}

    def resblock(tp, d):
        _inv_norm(sd, tp + ".norm1", d["GroupNorm_0"])
        _inv_conv(sd, tp + ".conv1", d["Conv_0"])
        _inv_norm(sd, tp + ".norm2", d["GroupNorm_1"])
        _inv_conv(sd, tp + ".conv2", d["Conv_1"])
        if "Conv_2" in d:
            _inv_conv(sd, tp + ".nin_shortcut", d["Conv_2"])

    _inv_conv(sd, "encoder.conv_in", p["conv_in"])
    for level in range(len(channel_mult)):
        for i in range(2):
            resblock(f"encoder.down.{level}.block.{i}", p[f"down_{level}_{i}"])
        if f"down_{level}_ds" in p:
            _inv_conv(
                sd, f"encoder.down.{level}.downsample.conv", p[f"down_{level}_ds"]
            )
    resblock("encoder.mid.block_1", p["mid_res0"])
    resblock("encoder.mid.block_2", p["mid_res1"])
    a = p["mid_attn"]
    _inv_norm(sd, "encoder.mid.attn_1.norm", a["GroupNorm_0"])
    for name, flax_name in [
        ("q", "Dense_0"), ("k", "Dense_1"), ("v", "Dense_2"),
        ("proj_out", "Dense_3"),
    ]:
        w = np.asarray(a[flax_name]["kernel"]).T  # [out, in]
        sd[f"encoder.mid.attn_1.{name}.weight"] = w[:, :, None, None]
        sd[f"encoder.mid.attn_1.{name}.bias"] = np.asarray(a[flax_name]["bias"])
    _inv_norm(sd, "encoder.norm_out", p["out_norm"])
    _inv_conv(sd, "encoder.conv_out", p["conv_out"])
    _inv_conv(sd, "quant_conv", p["quant_conv"])
    return sd


def clip_flax_to_torch_sd(params, cfg: CLIPVisionConfig, prefix="visual."):
    p = params["params"]
    sd = {
        prefix + "conv1.weight": np.transpose(
            np.asarray(p["conv1"]["kernel"]), (3, 2, 0, 1)
        ),
        prefix + "class_embedding": np.asarray(p["class_embedding"]),
        prefix + "positional_embedding": np.asarray(p["positional_embedding"]),
    }
    _inv_norm(sd, prefix + "ln_pre", p["ln_pre"])
    for i in range(cfg.layers):
        name = f"resblock_{i}"
        if name not in p:
            break
        rb = f"{prefix}transformer.resblocks.{i}"
        d = p[name]
        _inv_norm(sd, rb + ".ln_1", d["ln_1"])
        sd[rb + ".attn.in_proj_weight"] = np.asarray(
            d["attn"]["in_proj"]["kernel"]
        ).T
        sd[rb + ".attn.in_proj_bias"] = np.asarray(d["attn"]["in_proj"]["bias"])
        _inv_lin(sd, rb + ".attn.out_proj", d["attn"]["out_proj"])
        _inv_norm(sd, rb + ".ln_2", d["ln_2"])
        _inv_lin(sd, rb + ".mlp.c_fc", d["c_fc"])
        _inv_lin(sd, rb + ".mlp.c_proj", d["c_proj"])
    if "ln_post" in p:
        _inv_norm(sd, prefix + "ln_post", p["ln_post"])
    if "proj" in p:
        sd[prefix + "proj"] = np.asarray(p["proj"])
    return sd


def resampler_flax_to_torch_sd(params, cfg: ResamplerConfig,
                               prefix="image_proj_model."):
    p = params["params"]
    sd = {prefix + "latents": np.asarray(p["latents"])[None]}
    _inv_lin(sd, prefix + "proj_in", p["proj_in"])
    _inv_lin(sd, prefix + "proj_out", p["proj_out"])
    _inv_norm(sd, prefix + "norm_out", p["norm_out"])
    for i in range(cfg.depth):
        a, f = p[f"attn_{i}"], p[f"ff_{i}"]
        _inv_norm(sd, f"{prefix}layers.{i}.0.norm1", a["norm1"])
        _inv_norm(sd, f"{prefix}layers.{i}.0.norm2", a["norm2"])
        _inv_lin(sd, f"{prefix}layers.{i}.0.to_q", a["to_q"])
        _inv_lin(sd, f"{prefix}layers.{i}.0.to_kv", a["to_kv"])
        _inv_lin(sd, f"{prefix}layers.{i}.0.to_out", a["to_out"])
        _inv_norm(sd, f"{prefix}layers.{i}.1.0", f["norm"])
        _inv_lin(sd, f"{prefix}layers.{i}.1.1", f["fc1"])
        _inv_lin(sd, f"{prefix}layers.{i}.1.3", f["fc2"])
    return sd


def _assert_tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_flatten_with_path(b)[0]}
    assert len(fa) == len(fb), (len(fa), len(fb))
    for k, v in fa:
        ks = jax.tree_util.keystr(k)
        assert ks in fb, ks
        np.testing.assert_allclose(np.asarray(v), np.asarray(fb[ks]),
                                   atol=0, rtol=0, err_msg=ks)


# ---------------------------------------------------------------------------


TINY_UNET = MultiViewUNet(
    model_channels=32,
    channel_mult=(1, 2),
    num_res_blocks=1,
    attention_levels=(0, 1),
    num_head_channels=16,
    context_dim=64,
)


def test_unet_converter_roundtrip():
    B = 4
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 16, 16, 4))
    t = jnp.full((B,), 7, jnp.int32)
    ctx = {
        "context": jax.random.normal(jax.random.PRNGKey(2), (B, 7, 64)),
        "camera": jax.random.normal(jax.random.PRNGKey(3), (B, 16)),
        "num_frames": 2,
        # ip tokens: the ipmv variant's decoupled image-prompt branch.
        "ip": jax.random.normal(jax.random.PRNGKey(4), (B, 4, 64)),
    }
    params = TINY_UNET.init(jax.random.PRNGKey(0), x, t, ctx)
    sd = unet_flax_to_torch_sd(params, TINY_UNET)

    # Literal spot checks against the upstream LDM openaimodel naming:
    # conv_in is input_blocks.0.0, the level-0 transformer sits at
    # input_blocks.1.1, the downsample op at input_blocks.2.0.op, the
    # level-1 upsample conv after (res, attn) at output_blocks.1.2.conv.
    for key in [
        "input_blocks.0.0.weight",
        "input_blocks.1.0.in_layers.2.weight",
        "input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight",
        "input_blocks.1.1.transformer_blocks.0.attn2.to_k_ip.weight",
        "input_blocks.1.1.transformer_blocks.0.attn2.to_v_ip.weight",
        "input_blocks.2.0.op.weight",
        "input_blocks.3.0.skip_connection.weight",
        "middle_block.1.proj_out.weight",
        "output_blocks.1.2.conv.weight",
        "output_blocks.3.1.transformer_blocks.0.ff.net.0.proj.weight",
        "camera_embed.0.weight",
        "out.2.weight",
    ]:
        assert key in sd, key
    # to_q carries no bias (LDM CrossAttention bias=False)
    assert "middle_block.1.transformer_blocks.0.attn1.to_q.bias" not in sd
    # SELF-attention (attn1) never carries the decoupled ip projections.
    assert "middle_block.1.transformer_blocks.0.attn1.to_k_ip.weight" not in sd

    restored = convert_unet_torch_params(sd, TINY_UNET)
    _assert_tree_equal(params, restored)
    out_a = TINY_UNET.apply(params, x, t, ctx)
    out_b = TINY_UNET.apply(restored, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_vae_converter_roundtrip():
    vae = VAEEncoder(base_channels=32, channel_mult=(1, 2, 2, 2))
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), imgs)
    sd = vae_flax_to_torch_sd(params, vae.channel_mult)
    for key in [
        "encoder.conv_in.weight",
        "encoder.down.0.block.0.norm1.weight",
        "encoder.down.1.block.0.nin_shortcut.weight",
        "encoder.down.0.downsample.conv.weight",
        "encoder.mid.attn_1.q.weight",
        "quant_conv.weight",
    ]:
        assert key in sd, key
    restored = convert_vae_torch_params(sd)
    _assert_tree_equal(params, restored)
    np.testing.assert_allclose(
        np.asarray(vae.apply(params, imgs)),
        np.asarray(vae.apply(restored, imgs)),
        atol=1e-5,
    )


def test_clip_converter_roundtrip():
    cfg = dataclasses.replace(CLIPVisionConfig.tiny(), layers=3)
    model = CLIPViT(cfg)  # penultimate -> uses layers-1 blocks
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    sd = clip_flax_to_torch_sd(params, cfg)
    for key in [
        "visual.conv1.weight",
        "visual.class_embedding",
        "visual.transformer.resblocks.0.attn.in_proj_weight",
        "visual.transformer.resblocks.1.mlp.c_fc.weight",
    ]:
        assert key in sd, key
    assert "visual.conv1.bias" not in sd  # patch conv has no bias
    restored = convert_clip_vit_torch_params(sd, cfg)
    _assert_tree_equal(params, restored)
    np.testing.assert_allclose(
        np.asarray(model.apply(params, x)),
        np.asarray(model.apply(restored, x)),
        atol=1e-5,
    )


def test_resampler_converter_roundtrip():
    cfg = ResamplerConfig.tiny()
    model = Resampler(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, cfg.embedding_dim))
    params = model.init(jax.random.PRNGKey(1), x)
    sd = resampler_flax_to_torch_sd(params, cfg)
    for key in [
        "image_proj_model.latents",
        "image_proj_model.layers.0.0.to_kv.weight",
        "image_proj_model.layers.1.1.3.weight",
        "image_proj_model.norm_out.weight",
    ]:
        assert key in sd, key
    assert "image_proj_model.layers.0.0.to_q.bias" not in sd
    restored = convert_resampler_torch_params(sd, cfg)
    _assert_tree_equal(params, restored)
    np.testing.assert_allclose(
        np.asarray(model.apply(params, x)),
        np.asarray(model.apply(restored, x)),
        atol=1e-5,
    )


def test_on_device_mock_init_matches_cpu_init_structure():
    """The transport-safe on-device mock init (shape-only eval_shape +
    single-program RNG; used for the full-shape bench networks) must produce
    EXACTLY the variable tree of the flax CPU init — same treedef, same
    shapes, float leaves in the requested dtype, all finite."""
    from soar_tpu.guidance.build import NetworkShapes, init_mock_networks

    shapes = NetworkShapes.tiny(32)
    key = jax.random.PRNGKey(0)
    ref = init_mock_networks(key, shapes, n_view=4, with_ip=True)
    dev = init_mock_networks(
        key, shapes, n_view=4, with_ip=True, on_device_dtype=jnp.bfloat16
    )
    assert jax.tree_util.tree_structure(ref) == jax.tree_util.tree_structure(
        dev
    )
    for (pr, a), (pd, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref),
        jax.tree_util.tree_leaves_with_path(dev),
    ):
        assert a.shape == b.shape, (pr, a.shape, b.shape)
        if jnp.issubdtype(a.dtype, jnp.floating):
            assert b.dtype == jnp.bfloat16, (pd, b.dtype)
            assert np.all(np.isfinite(np.asarray(b, np.float32))), pd


def test_on_device_mock_clip_matches_cpu_init_structure():
    from soar_tpu.guidance.build import _mock_clip_vars

    key = jax.random.PRNGKey(1)
    clip_cfg = CLIPVisionConfig.tiny()
    res_cfg = ResamplerConfig.tiny()
    c_ref, r_ref = _mock_clip_vars(key, clip_cfg, res_cfg)
    c_dev, r_dev = _mock_clip_vars(
        key, clip_cfg, res_cfg, on_device_dtype=jnp.bfloat16
    )
    for ref, dev in ((c_ref, c_dev), (r_ref, r_dev)):
        assert jax.tree_util.tree_structure(
            ref
        ) == jax.tree_util.tree_structure(dev)
        for (pr, a), (pd, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(dev),
        ):
            assert a.shape == b.shape, (pr, a.shape, b.shape)
