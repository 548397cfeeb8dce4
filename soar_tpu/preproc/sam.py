"""Segment Anything (SAM) in flax: ViT image encoder + prompt encoder +
two-way mask decoder.

TPU-native replacement for the ``segment_anything`` torch package the
reference prompts with body keypoints
(``/root/reference/preproc/compute_kp_and_mask.py:52-79``).  The
architecture follows the published SAM model faithfully: decomposed
relative-position attention in the ViT (windowed 14x14 except 4 global
layers), Fourier point-prompt encoding with per-label type embeddings, the
``no_mask`` dense embedding, a depth-2 TwoWayTransformer with rate-2
downsampled cross-attention, 3-layer hypernetwork MLPs per mask token, and
an IoU prediction head.

Weights come from the user's ``sam_vit_h_4b8939.pth`` via
:func:`convert_sam_params` (validated by a flax->torch-layout round-trip
test, ``tests/test_sam_convert.py`` — no checkpoints are fetchable in this
zero-egress environment); :func:`load_sam_predictor` then reproduces
``SamPredictor.predict`` with keypoint prompts (longest-side-1024 resize,
mean/std normalization, multimask output, threshold at 0).

ViT-H config: patch 16, dim 1280, depth 32, heads 16, global attention every
8 blocks, neck to 256 channels.
"""

from __future__ import annotations

import dataclasses
import math
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
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask: int = 3


# ---------------------------------------------------------------------------
# image encoder (ImageEncoderViT)


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Relative position embeddings per pairwise offset (segment_anything
    ``get_rel_pos``); resizes when trained/eval sizes differ."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class _ViTAttention(nn.Module):
    """Multi-head attention with decomposed relative positions
    (``image_encoder.py`` Attention, use_rel_pos=True)."""

    heads: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        B, H, W, C = x.shape
        head_dim = C // self.heads
        qkv = nn.Dense(3 * C, name="qkv")(x.reshape(B, H * W, C))
        qkv = qkv.reshape(B, H * W, 3, self.heads, head_dim)
        # fold heads into batch like the reference
        q, k, v = (
            qkv[:, :, i].transpose(0, 2, 1, 3).reshape(B * self.heads, H * W, head_dim)
            for i in range(3)
        )
        attn = (q * (head_dim**-0.5)) @ k.transpose(0, 2, 1)

        rel_pos_h = self.param(
            "rel_pos_h", nn.initializers.zeros, (2 * H - 1, head_dim)
        )
        rel_pos_w = self.param(
            "rel_pos_w", nn.initializers.zeros, (2 * W - 1, head_dim)
        )
        Rh = _get_rel_pos(H, H, rel_pos_h)  # [H, H, d]
        Rw = _get_rel_pos(W, W, rel_pos_w)
        r_q = q.reshape(B * self.heads, H, W, head_dim)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
        attn = (
            attn.reshape(B * self.heads, H, W, H, W)
            + rel_h[:, :, :, :, None]
            + rel_w[:, :, :, None, :]
        ).reshape(B * self.heads, H * W, H * W)

        attn = jax.nn.softmax(attn, axis=-1)
        x = (attn @ v).reshape(B, self.heads, H * W, head_dim)
        x = x.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return nn.Dense(C, name="proj")(x)


class _ViTBlock(nn.Module):
    heads: int
    window: int  # 0 = global attention

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window > 0:
            pad_h = (-H) % self.window
            pad_w = (-W) % self.window
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            Hp, Wp = H + pad_h, W + pad_w
            nh, nw = Hp // self.window, Wp // self.window
            x = (
                x.reshape(B, nh, self.window, nw, self.window, C)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(B * nh * nw, self.window, self.window, C)
            )
        x = _ViTAttention(self.heads, name="attn")(x)
        if self.window > 0:
            x = (
                x.reshape(B, nh, nw, self.window, self.window, C)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(B, nh * self.window, nw * self.window, C)[:, :H, :W]
            )
        x = shortcut + x
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(4 * C, name="lin1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="lin2")(h)
        return x + h


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
            "pos_embed", nn.initializers.zeros, (1, side, side, c.embed_dim)
        )
        x = x + pos
        for i in range(c.depth):
            window = 0 if i in c.global_attn_layers else c.window_size
            x = _ViTBlock(c.num_heads, window, name=f"block_{i}")(x)
        # Neck: 1x1 conv -> LN2d -> 3x3 conv -> LN2d (channels 256).
        x = nn.Conv(c.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln1")(x)
        x = nn.Conv(
            c.out_chans, (3, 3), padding=1, use_bias=False, name="neck_conv2"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln2")(x)
        return x  # [B, 64, 64, 256]


# ---------------------------------------------------------------------------
# prompt encoder (points only — the reference prompts with keypoints)


def _fourier_pe(mat: jnp.ndarray, coords01: jnp.ndarray) -> jnp.ndarray:
    """PositionEmbeddingRandom.forward_with_coords."""
    coords = 2.0 * coords01 - 1.0
    proj = (2.0 * np.pi) * (coords @ mat)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def _grid_pe(mat: jnp.ndarray, side: int) -> jnp.ndarray:
    """image_pe: the Fourier embedding of the grid cell centers."""
    ys = (jnp.arange(side, dtype=jnp.float32) + 0.5) / side
    xs = (jnp.arange(side, dtype=jnp.float32) + 0.5) / side
    grid = jnp.stack(
        [jnp.tile(xs[None, :], (side, 1)), jnp.tile(ys[:, None], (1, side))],
        axis=-1,
    )
    return _fourier_pe(mat, grid)  # [side, side, C]


class SAMPromptEncoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, points01, labels, grid_side: Optional[int] = None):
        """points01 [B, P, 2] (x, y) normalized to [0, 1]; labels [B, P]
        (1 fg, 0 bg, -1 pad).  Returns (sparse [B, P, 256],
        dense_no_mask [256], image_pe [side, side, 256])."""
        c = self.cfg
        mat = self.param(
            "pe_gaussian", nn.initializers.normal(1.0),
            (2, c.decoder_dim // 2),
        )
        emb = _fourier_pe(mat, points01)
        # label -1 zeroes the coordinate embedding (prompt_encoder.py:89-93)
        emb = jnp.where(labels[..., None] == -1, 0.0, emb)
        fg = self.param("fg_embed", nn.initializers.normal(1.0), (c.decoder_dim,))
        bg = self.param("bg_embed", nn.initializers.normal(1.0), (c.decoder_dim,))
        pad = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (c.decoder_dim,)
        )
        no_mask = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (c.decoder_dim,)
        )
        type_emb = jnp.where(
            labels[..., None] == 1,
            fg,
            jnp.where(labels[..., None] == 0, bg, pad),
        )
        side = grid_side or (c.img_size // c.patch_size)
        return emb + type_emb, no_mask, _grid_pe(mat, side)


# ---------------------------------------------------------------------------
# mask decoder (TwoWayTransformer + upscaling + hypernetworks)


class _DecoderAttention(nn.Module):
    """Decoder attention with optional internal downsampling
    (``transformer.py`` Attention)."""

    dim: int
    heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        hd = inner // self.heads
        B = q.shape[0]

        def split(t):
            return t.reshape(B, t.shape[1], self.heads, hd).transpose(0, 2, 1, 3)

        qh = split(nn.Dense(inner, name="q_proj")(q))
        kh = split(nn.Dense(inner, name="k_proj")(k))
        vh = split(nn.Dense(inner, name="v_proj")(v))
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd), axis=-1
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, q.shape[1], inner)
        return nn.Dense(self.dim, name="out_proj")(out)


class _TwoWayBlock(nn.Module):
    cfg: SAMConfig
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        c = self.cfg
        if self.skip_first_layer_pe:
            queries = _DecoderAttention(c.decoder_dim, c.decoder_heads,
                                        name="self_attn")(queries, queries,
                                                          queries)
        else:
            q = queries + query_pe
            queries = queries + _DecoderAttention(
                c.decoder_dim, c.decoder_heads, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + _DecoderAttention(
            c.decoder_dim, c.decoder_heads, 2, name="cross_attn_t2i"
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        h = nn.Dense(c.decoder_mlp_dim, name="mlp_lin1")(queries)
        h = nn.Dense(c.decoder_dim, name="mlp_lin2")(nn.relu(h))
        queries = nn.LayerNorm(name="norm3")(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + _DecoderAttention(
            c.decoder_dim, c.decoder_heads, 2, name="cross_attn_i2t"
        )(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class _HyperMLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            last = i == self.layers - 1
            x = nn.Dense(self.out if last else self.hidden, name=f"lin{i}")(x)
            if not last:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


class SAMMaskDecoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, image_emb, image_pe, sparse_emb, dense_emb):
        """image_emb [B, h, w, 256], image_pe [h, w, 256],
        sparse_emb [B, P, 256], dense_emb [256] ->
        (masks [B, M, 4h, 4w], iou_pred [B, M]) with M = 1 + num_multimask."""
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
        src = (image_emb + dense_emb).reshape(B, h * w, C)
        pos_src = jnp.tile(image_pe.reshape(1, h * w, C), (B, 1, 1))

        queries, keys = tokens, src
        for i in range(c.decoder_depth):
            queries, keys = _TwoWayBlock(
                c, skip_first_layer_pe=(i == 0), name=f"twoway_{i}"
            )(queries, keys, tokens, pos_src)
        q = queries + tokens
        k = keys + pos_src
        queries = queries + _DecoderAttention(
            c.decoder_dim, c.decoder_heads, 2, name="final_t2i"
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm_final")(queries)

        iou_token_out = queries[:, 0]
        mask_tokens_out = queries[:, 1 : 1 + M]

        img = keys.reshape(B, h, w, C)
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2), name="up1")(img)
        up = nn.gelu(nn.LayerNorm(epsilon=1e-6, name="up_ln")(up),
                     approximate=False)
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2), name="up2")(up)
        up = nn.gelu(up, approximate=False)

        hyper = jnp.stack(
            [
                _HyperMLP(C, C // 8, name=f"hyper_{i}")(mask_tokens_out[:, i])
                for i in range(M)
            ],
            axis=1,
        )  # [B, M, C/8]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
        iou = _HyperMLP(C, M, name="iou_head")(iou_token_out)
        return masks, iou


class SAM(nn.Module):
    cfg: SAMConfig = SAMConfig()

    @nn.compact
    def __call__(self, image, points, labels):
        """image [B, S, S, 3] normalized; points [B, P, 2] in [0, 1];
        labels [B, P].  Returns (masks [B, M, S/4, S/4], iou [B, M])."""
        emb = SAMImageEncoder(self.cfg, name="image_encoder")(image)
        sparse, no_mask, image_pe = SAMPromptEncoder(
            self.cfg, name="prompt_encoder"
        )(points, labels, grid_side=emb.shape[1])
        return SAMMaskDecoder(self.cfg, name="mask_decoder")(
            emb, image_pe, sparse, no_mask
        )


# ---------------------------------------------------------------------------
# predictor (SamPredictor.predict with keypoint prompts)

_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def load_sam_predictor(checkpoint_path: Optional[str], cfg: SAMConfig = SAMConfig()):
    """Returns ``predict(img_rgb_u8 [H, W, 3], points_px [P, 2]) ->
    bool mask [H, W]`` mirroring the reference usage
    (``compute_kp_and_mask.py:52-67``: multimask predict, union of the 3
    masks).  ``checkpoint_path`` is the torch ``sam_vit_h_4b8939.pth``."""
    if not checkpoint_path:
        raise SystemExit(
            "SAM backend needs --sam-checkpoint-path (sam_vit_h_4b8939.pth, "
            "user-downloaded)"
        )
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.float().numpy() for k, v in sd.items()}
    variables = jax.tree_util.tree_map(jnp.asarray, convert_sam_params(sd, cfg))
    sam = SAM(cfg)
    S = cfg.img_size

    @jax.jit
    def _run(image, points, labels):
        return sam.apply(variables, image, points, labels)

    def predict(img_u8: np.ndarray, points_px: np.ndarray) -> np.ndarray:
        H, W = img_u8.shape[:2]
        scale = S / max(H, W)
        nh, nw = int(round(H * scale)), int(round(W * scale))
        img = jax.image.resize(
            jnp.asarray(img_u8, jnp.float32), (nh, nw, 3), method="bilinear"
        )
        img = (img - _PIXEL_MEAN) / _PIXEL_STD
        img = jnp.pad(img, ((0, S - nh), (0, S - nw), (0, 0)))

        # Resize transform FIRST, then the +0.5 pixel-center shift in model
        # space — SamPredictor scales raw coords (transforms.py
        # apply_coords) and prompt_encoder.py:83-88 adds 0.5 afterwards;
        # shifting before the scale would offset prompts by 0.5*(1-scale) px.
        pts = np.asarray(points_px, np.float32) * scale + 0.5
        pts01 = pts / S
        pts01 = np.concatenate([pts01, np.zeros((1, 2), np.float32)], axis=0)
        labels = np.concatenate(
            [np.ones(len(points_px), np.float32), -np.ones(1, np.float32)]
        )

        masks, iou = _run(img[None], jnp.asarray(pts01)[None],
                          jnp.asarray(labels)[None])
        # multimask output = tokens 1..3; union like the reference.
        low = np.asarray(masks[0, 1:])  # [3, 256, 256]
        full = jax.image.resize(jnp.asarray(low), (3, S, S), method="bilinear")
        full = full[:, :nh, :nw]
        full = jax.image.resize(full, (3, H, W), method="bilinear")
        return np.asarray((np.asarray(full) > 0.0).any(axis=0))

    return predict


# ---------------------------------------------------------------------------
# torch -> flax conversion


from ..core.torch_convert import (  # noqa: E402
    conv as _conv,
    conv_transpose as _convT,
    lin as _lin,
    norm as _ln,
)


def convert_sam_params(sd: Dict, cfg: SAMConfig = SAMConfig()) -> Dict:
    """Map the official ``sam_vit_h`` state_dict onto :class:`SAM` variables
    (keys per segment_anything's modeling/).  Validated against
    :func:`soar_tpu.guidance.manifest.sam_vit_h_key_manifest`; missing keys
    raise with near-miss suggestions.  The box-corner point embeddings and
    the mask-prompt downscaling path are EXPECTED leftovers (the preproc
    predictor prompts with points only, matching the reference's usage at
    ``/root/reference/preproc/compute_kp_and_mask.py:52-67``); anything else
    unconsumed warns."""
    from ..guidance.manifest import track

    sd = track(sd, "SAM state_dict")
    enc: Dict = {
        "patch_embed": _conv(sd, "image_encoder.patch_embed.proj"),
        "pos_embed": np.asarray(sd["image_encoder.pos_embed"]),
        "neck_conv1": _conv(sd, "image_encoder.neck.0"),
        "neck_ln1": _ln(sd, "image_encoder.neck.1"),
        "neck_conv2": _conv(sd, "image_encoder.neck.2"),
        "neck_ln2": _ln(sd, "image_encoder.neck.3"),
    }
    for i in range(cfg.depth):
        b = f"image_encoder.blocks.{i}"
        enc[f"block_{i}"] = {
            "norm1": _ln(sd, b + ".norm1"),
            "attn": {
                "qkv": _lin(sd, b + ".attn.qkv"),
                "proj": _lin(sd, b + ".attn.proj"),
                "rel_pos_h": np.asarray(sd[b + ".attn.rel_pos_h"]),
                "rel_pos_w": np.asarray(sd[b + ".attn.rel_pos_w"]),
            },
            "norm2": _ln(sd, b + ".norm2"),
            "lin1": _lin(sd, b + ".mlp.lin1"),
            "lin2": _lin(sd, b + ".mlp.lin2"),
        }

    prm = {
        "pe_gaussian": np.asarray(
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
        ),
        "bg_embed": np.asarray(sd["prompt_encoder.point_embeddings.0.weight"])[0],
        "fg_embed": np.asarray(sd["prompt_encoder.point_embeddings.1.weight"])[0],
        "not_a_point_embed": np.asarray(
            sd["prompt_encoder.not_a_point_embed.weight"]
        )[0],
        "no_mask_embed": np.asarray(sd["prompt_encoder.no_mask_embed.weight"])[0],
    }

    def dec_attn(prefix):
        return {
            "q_proj": _lin(sd, prefix + ".q_proj"),
            "k_proj": _lin(sd, prefix + ".k_proj"),
            "v_proj": _lin(sd, prefix + ".v_proj"),
            "out_proj": _lin(sd, prefix + ".out_proj"),
        }

    dec: Dict = {
        "iou_token": np.asarray(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": np.asarray(sd["mask_decoder.mask_tokens.weight"]),
        "final_t2i": dec_attn(
            "mask_decoder.transformer.final_attn_token_to_image"
        ),
        "norm_final": _ln(sd, "mask_decoder.transformer.norm_final_attn"),
        "up1": _convT(sd, "mask_decoder.output_upscaling.0"),
        "up_ln": _ln(sd, "mask_decoder.output_upscaling.1"),
        "up2": _convT(sd, "mask_decoder.output_upscaling.3"),
        "iou_head": {
            f"lin{j}": _lin(sd, f"mask_decoder.iou_prediction_head.layers.{j}")
            for j in range(3)
        },
    }
    for i in range(cfg.decoder_depth):
        t = f"mask_decoder.transformer.layers.{i}"
        dec[f"twoway_{i}"] = {
            "self_attn": dec_attn(t + ".self_attn"),
            "norm1": _ln(sd, t + ".norm1"),
            "cross_attn_t2i": dec_attn(t + ".cross_attn_token_to_image"),
            "norm2": _ln(sd, t + ".norm2"),
            "mlp_lin1": _lin(sd, t + ".mlp.lin1"),
            "mlp_lin2": _lin(sd, t + ".mlp.lin2"),
            "norm3": _ln(sd, t + ".norm3"),
            "cross_attn_i2t": dec_attn(t + ".cross_attn_image_to_token"),
            "norm4": _ln(sd, t + ".norm4"),
        }
    for i in range(cfg.num_multimask + 1):
        dec[f"hyper_{i}"] = {
            f"lin{j}": _lin(
                sd, f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}"
            )
            for j in range(3)
        }

    sd.warn_unconsumed(
        ignore_prefixes=(
            "prompt_encoder.point_embeddings.2.",
            "prompt_encoder.point_embeddings.3.",
            "prompt_encoder.mask_downscaling.",
        )
    )
    return {
        "params": {
            "image_encoder": enc,
            "prompt_encoder": prm,
            "mask_decoder": dec,
        }
    }
