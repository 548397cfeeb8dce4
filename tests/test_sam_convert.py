"""SAM torch->flax converter round-trip (VERDICT r1 #4).

Same recipe as the diffusion converters: init the tiny-config flax SAM,
write its params into a torch-layout ``sam_vit_h``-style state_dict (inverse
mapping against the segment_anything modeling/ naming), convert back, and
require exact equality + matching outputs; literal-key spot checks pin the
upstream naming.  Also covers ``load_sam_predictor`` end-to-end from a
saved .pth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soar_tpu.preproc.sam import SAM, SAMConfig, convert_sam_params

TINY = SAMConfig(
    img_size=64,
    patch_size=16,
    embed_dim=32,
    depth=2,
    num_heads=4,
    global_attn_layers=(1,),
    window_size=2,
    out_chans=16,
    decoder_dim=16,
    decoder_depth=2,
    decoder_mlp_dim=32,
)


def _inv_lin(sd, prefix, d):
    sd[prefix + ".weight"] = np.asarray(d["kernel"]).T
    if "bias" in d:
        sd[prefix + ".bias"] = np.asarray(d["bias"])


def _inv_conv(sd, prefix, d):
    sd[prefix + ".weight"] = np.transpose(np.asarray(d["kernel"]), (3, 2, 0, 1))
    if "bias" in d:
        sd[prefix + ".bias"] = np.asarray(d["bias"])


def _inv_convT(sd, prefix, d):
    # Inverse of torch_convert.conv_transpose: undo the spatial flip, then
    # HWIO -> [in, out, kH, kW].
    k = np.asarray(d["kernel"])[::-1, ::-1]
    sd[prefix + ".weight"] = np.ascontiguousarray(np.transpose(k, (2, 3, 0, 1)))
    if "bias" in d:
        sd[prefix + ".bias"] = np.asarray(d["bias"])


def _inv_ln(sd, prefix, d):
    sd[prefix + ".weight"] = np.asarray(d["scale"])
    sd[prefix + ".bias"] = np.asarray(d["bias"])


def sam_flax_to_torch_sd(variables, cfg: SAMConfig):
    p = variables["params"]
    sd = {}
    enc = p["image_encoder"]
    _inv_conv(sd, "image_encoder.patch_embed.proj", enc["patch_embed"])
    sd["image_encoder.pos_embed"] = np.asarray(enc["pos_embed"])
    _inv_conv(sd, "image_encoder.neck.0", enc["neck_conv1"])
    _inv_ln(sd, "image_encoder.neck.1", enc["neck_ln1"])
    _inv_conv(sd, "image_encoder.neck.2", enc["neck_conv2"])
    _inv_ln(sd, "image_encoder.neck.3", enc["neck_ln2"])
    for i in range(cfg.depth):
        b, d = f"image_encoder.blocks.{i}", enc[f"block_{i}"]
        _inv_ln(sd, b + ".norm1", d["norm1"])
        _inv_lin(sd, b + ".attn.qkv", d["attn"]["qkv"])
        _inv_lin(sd, b + ".attn.proj", d["attn"]["proj"])
        sd[b + ".attn.rel_pos_h"] = np.asarray(d["attn"]["rel_pos_h"])
        sd[b + ".attn.rel_pos_w"] = np.asarray(d["attn"]["rel_pos_w"])
        _inv_ln(sd, b + ".norm2", d["norm2"])
        _inv_lin(sd, b + ".mlp.lin1", d["lin1"])
        _inv_lin(sd, b + ".mlp.lin2", d["lin2"])

    prm = p["prompt_encoder"]
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = (
        np.asarray(prm["pe_gaussian"])
    )
    sd["prompt_encoder.point_embeddings.0.weight"] = np.asarray(
        prm["bg_embed"]
    )[None]
    sd["prompt_encoder.point_embeddings.1.weight"] = np.asarray(
        prm["fg_embed"]
    )[None]
    # box-corner embeddings exist in the real ckpt but are unused for
    # keypoint prompts
    sd["prompt_encoder.point_embeddings.2.weight"] = np.zeros(
        (1, cfg.decoder_dim), np.float32
    )
    sd["prompt_encoder.point_embeddings.3.weight"] = np.zeros(
        (1, cfg.decoder_dim), np.float32
    )
    sd["prompt_encoder.not_a_point_embed.weight"] = np.asarray(
        prm["not_a_point_embed"]
    )[None]
    sd["prompt_encoder.no_mask_embed.weight"] = np.asarray(
        prm["no_mask_embed"]
    )[None]

    dec = p["mask_decoder"]

    def inv_attn(prefix, d):
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _inv_lin(sd, f"{prefix}.{n}", d[n])

    sd["mask_decoder.iou_token.weight"] = np.asarray(dec["iou_token"])
    sd["mask_decoder.mask_tokens.weight"] = np.asarray(dec["mask_tokens"])
    for i in range(cfg.decoder_depth):
        t, d = f"mask_decoder.transformer.layers.{i}", dec[f"twoway_{i}"]
        inv_attn(t + ".self_attn", d["self_attn"])
        _inv_ln(sd, t + ".norm1", d["norm1"])
        inv_attn(t + ".cross_attn_token_to_image", d["cross_attn_t2i"])
        _inv_ln(sd, t + ".norm2", d["norm2"])
        _inv_lin(sd, t + ".mlp.lin1", d["mlp_lin1"])
        _inv_lin(sd, t + ".mlp.lin2", d["mlp_lin2"])
        _inv_ln(sd, t + ".norm3", d["norm3"])
        inv_attn(t + ".cross_attn_image_to_token", d["cross_attn_i2t"])
        _inv_ln(sd, t + ".norm4", d["norm4"])
    inv_attn(
        "mask_decoder.transformer.final_attn_token_to_image", dec["final_t2i"]
    )
    _inv_ln(sd, "mask_decoder.transformer.norm_final_attn", dec["norm_final"])
    _inv_convT(sd, "mask_decoder.output_upscaling.0", dec["up1"])
    _inv_ln(sd, "mask_decoder.output_upscaling.1", dec["up_ln"])
    _inv_convT(sd, "mask_decoder.output_upscaling.3", dec["up2"])
    for i in range(cfg.num_multimask + 1):
        for j in range(3):
            _inv_lin(
                sd,
                f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}",
                dec[f"hyper_{i}"][f"lin{j}"],
            )
    for j in range(3):
        _inv_lin(
            sd, f"mask_decoder.iou_prediction_head.layers.{j}",
            dec["iou_head"][f"lin{j}"],
        )
    return sd


@pytest.fixture(scope="module")
def tiny_sam():
    sam = SAM(TINY)
    img = jnp.zeros((1, 64, 64, 3))
    pts = jnp.asarray([[[0.5, 0.5], [0.2, 0.8]]])
    lbl = jnp.asarray([[1.0, 1.0]])
    key = jax.random.PRNGKey(0)
    variables = sam.init(key, img, pts, lbl)
    # zero-init params (pos_embed, rel_pos) -> randomize so conversion bugs
    # can't hide behind zeros
    leaves, td = jax.tree_util.tree_flatten(variables)
    out = []
    for leaf in leaves:
        key, k = jax.random.split(key)
        out.append(
            jnp.where(
                jnp.all(leaf == 0), jax.random.normal(k, leaf.shape) * 0.02,
                leaf,
            )
        )
    return sam, jax.tree_util.tree_unflatten(td, out)


def test_sam_converter_roundtrip(tiny_sam):
    sam, variables = tiny_sam
    sd = sam_flax_to_torch_sd(variables, TINY)

    for key in [
        "image_encoder.patch_embed.proj.weight",
        "image_encoder.blocks.0.attn.rel_pos_h",
        "image_encoder.blocks.1.mlp.lin1.weight",
        "image_encoder.neck.2.weight",
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
        "prompt_encoder.not_a_point_embed.weight",
        "mask_decoder.transformer.layers.0.cross_attn_token_to_image.q_proj.weight",
        "mask_decoder.transformer.final_attn_token_to_image.out_proj.weight",
        "mask_decoder.output_upscaling.0.weight",
        "mask_decoder.output_hypernetworks_mlps.3.layers.2.weight",
        "mask_decoder.iou_prediction_head.layers.0.weight",
    ]:
        assert key in sd, key

    restored = convert_sam_params(sd, TINY)

    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    pts = jnp.asarray([[[0.5, 0.5], [0.2, 0.8], [0.0, 0.0]]])
    lbl = jnp.asarray([[1.0, 0.0, -1.0]])
    out_a = sam.apply(variables, img, pts, lbl)
    out_b = sam.apply(restored, img, pts, lbl)
    np.testing.assert_allclose(
        np.asarray(out_a[0]), np.asarray(out_b[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_a[1]), np.asarray(out_b[1]), atol=1e-5
    )


def test_load_sam_predictor(tiny_sam, tmp_path):
    """End-to-end predictor from a saved .pth: non-square image, keypoint
    prompts, bool mask out."""
    import torch

    from soar_tpu.preproc.sam import load_sam_predictor

    sam, variables = tiny_sam
    sd = sam_flax_to_torch_sd(variables, TINY)
    p = tmp_path / "sam_tiny.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(p))

    predict = load_sam_predictor(str(p), TINY)
    img = (np.random.RandomState(0).rand(48, 40, 3) * 255).astype(np.uint8)
    pts = np.asarray([[20.0, 24.0], [10.0, 30.0]])
    mask = predict(img, pts)
    assert mask.shape == (48, 40)
    assert mask.dtype == bool

    with pytest.raises(SystemExit):
        load_sam_predictor(None)
