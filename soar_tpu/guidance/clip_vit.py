"""CLIP image-conditioning encoder for ImageDream (flax).

Rebuilds the image-prompt path of ``get_learned_image_conditioning``
(``/root/reference/soar/threestudio-soar/guidance/imagedream_guidance.py:195``):
the sd-v2.1-base-4view-ipmv model encodes the GT reference crop with a frozen
OpenCLIP ViT-H/14 vision tower and resamples the 257 patch tokens into 16
image-prompt (``ip``) tokens of width 1024 with an IP-Adapter style Perceiver
:class:`Resampler`; those tokens are concatenated to the UNet's cross-attn
context (consumed by :class:`soar_tpu.guidance.networks.MultiViewUNet`).

Design notes (zero-egress environment — converters are validated by
flax->torch-layout round-trip tests, not against downloaded weights):

- :class:`CLIPViT` follows open_clip's ``VisionTransformer`` exactly
  (pre-LN blocks, single fused qkv projection, exact GELU); the default
  ``features="penultimate"`` returns the hidden states entering the last
  block without ``ln_post``/``proj`` — the IP-Adapter convention.
- :class:`Resampler` follows the IP-Adapter ``Resampler`` vendored by
  ImageDream: learned latent queries, depth x (PerceiverAttention + LN-FF),
  ``proj_in``/``proj_out``/``norm_out``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """OpenCLIP ViT-H/14 vision tower (the ipmv image embedder)."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    output_dim: int = 1024

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        """Small config for tests."""
        return cls(image_size=28, patch_size=14, width=32, layers=2, heads=2,
                   output_dim=16)


class _CLIPAttention(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        qkv = nn.Dense(3 * C, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = C // self.heads

        def split(t):
            return t.reshape(B, T, self.heads, d)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, C)
        return nn.Dense(C, name="out_proj")(out)


class _CLIPBlock(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x):
        x = x + _CLIPAttention(self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        )
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * x.shape[-1], name="c_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], name="c_proj")(h)
        return x + h


class CLIPViT(nn.Module):
    """open_clip ``VisionTransformer`` forward.

    ``features``:
      - "penultimate": token states entering the LAST resblock (no ln_post /
        proj) — [B, 1+P, width]; the IP-Adapter/ImageDream token features.
      - "tokens": after all blocks + ln_post — [B, 1+P, width].
      - "pooled": cls token after ln_post @ proj — [B, output_dim].
    """

    cfg: CLIPVisionConfig
    features: str = "penultimate"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        p = c.patch_size
        B = x.shape[0]
        h = nn.Conv(
            c.width, (p, p), strides=(p, p), use_bias=False, name="conv1"
        )(x)
        h = h.reshape(B, -1, c.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.width,)
        )
        h = jnp.concatenate([jnp.tile(cls[None, None], (B, 1, 1)), h], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (h.shape[1], c.width),
        )
        h = h + pos[None]
        h = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(h)
        n_blocks = c.layers - 1 if self.features == "penultimate" else c.layers
        for i in range(n_blocks):
            h = _CLIPBlock(c.heads, name=f"resblock_{i}")(h)
        if self.features == "penultimate":
            return h
        h = nn.LayerNorm(epsilon=1e-5, name="ln_post")(h)
        if self.features == "tokens":
            return h
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (c.width, c.output_dim)
        )
        return h[:, 0] @ proj


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    """IP-Adapter Resampler as configured by ImageDream ipmv."""

    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 12  # IP-Adapter-plus / ImageDream resampler: inner dim 768
    num_queries: int = 16
    embedding_dim: int = 1280  # CLIP ViT-H token width
    output_dim: int = 1024  # UNet context_dim
    ff_mult: int = 4

    @classmethod
    def tiny(cls) -> "ResamplerConfig":
        return cls(dim=16, depth=2, dim_head=4, heads=2, num_queries=4,
                   embedding_dim=32, output_dim=16, ff_mult=2)


class _PerceiverAttention(nn.Module):
    dim_head: int
    heads: int

    @nn.compact
    def __call__(self, x, latents):
        # x: [B, T_img, D] image tokens; latents: [B, Q, D] queries.
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        latents = nn.LayerNorm(epsilon=1e-5, name="norm2")(latents)
        inner = self.dim_head * self.heads
        B, Q, D = latents.shape
        q = nn.Dense(inner, use_bias=False, name="to_q")(latents)
        kv_inp = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(2 * inner, use_bias=False, name="to_kv")(kv_inp)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(t):
            return t.reshape(t.shape[:2] + (self.heads, self.dim_head))

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.dim_head)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Q, inner)
        return nn.Dense(D, use_bias=False, name="to_out")(out)


class _ResamplerFF(nn.Module):
    mult: int

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        h = nn.Dense(D * self.mult, use_bias=False, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(D, use_bias=False, name="fc2")(h)


class Resampler(nn.Module):
    cfg: ResamplerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B = x.shape[0]
        latents = self.param(
            "latents",
            nn.initializers.normal(1.0 / math.sqrt(c.dim)),
            (c.num_queries, c.dim),
        )
        lat = jnp.tile(latents[None], (B, 1, 1))
        x = nn.Dense(c.dim, name="proj_in")(x)
        for i in range(c.depth):
            lat = lat + _PerceiverAttention(
                c.dim_head, c.heads, name=f"attn_{i}"
            )(x, lat)
            lat = lat + _ResamplerFF(c.ff_mult, name=f"ff_{i}")(lat)
        out = nn.Dense(c.output_dim, name="proj_out")(lat)
        return nn.LayerNorm(epsilon=1e-5, name="norm_out")(out)


# --------------------------------------------------------------------------
# torch -> flax weight conversion


from ..core.torch_convert import lin as _lin, norm as _ln  # noqa: E402


def convert_clip_vit_torch_params(
    sd: Dict, cfg: CLIPVisionConfig, prefix: str = "visual.",
    features: str = "penultimate",
) -> Dict:
    """Map an open_clip ``VisionTransformer`` state_dict (keys
    ``visual.conv1.weight``, ``visual.transformer.resblocks.{i}.*``, ...)
    onto :class:`CLIPViT` variables.  Validated against
    :func:`soar_tpu.guidance.manifest.clip_vit_h_key_manifest`; missing keys
    raise with near-miss suggestions, unconsumed ``prefix`` keys warn.

    ``features`` must match the :class:`CLIPViT` mode the variables will be
    applied with: in the default ``"penultimate"`` mode (ImageDream ip
    tokens) the LAST resblock, ``ln_post`` and ``proj`` are deliberately
    dropped — the model never runs them (open_clip ViT-H token features are
    taken before the final block)."""
    from .manifest import track

    sd = track(sd, "CLIP-ViT state_dict")
    n_emit = cfg.layers - 1 if features == "penultimate" else cfg.layers
    p: Dict = {
        "conv1": {
            "kernel": np.transpose(
                np.asarray(sd[prefix + "conv1.weight"]), (2, 3, 1, 0)
            )
        },
        "class_embedding": np.asarray(sd[prefix + "class_embedding"]),
        "positional_embedding": np.asarray(sd[prefix + "positional_embedding"]),
        "ln_pre": _ln(sd, prefix + "ln_pre"),
    }
    for i in range(cfg.layers):
        rb = f"{prefix}transformer.resblocks.{i}"
        if rb + ".ln_1.weight" not in sd:
            break
        in_w = np.asarray(sd[rb + ".attn.in_proj_weight"])
        in_b = np.asarray(sd[rb + ".attn.in_proj_bias"])
        block = {
            "ln_1": _ln(sd, rb + ".ln_1"),
            "attn": {
                "in_proj": {"kernel": in_w.T, "bias": in_b},
                "out_proj": _lin(sd, rb + ".attn.out_proj"),
            },
            "ln_2": _ln(sd, rb + ".ln_2"),
            "c_fc": _lin(sd, rb + ".mlp.c_fc"),
            "c_proj": _lin(sd, rb + ".mlp.c_proj"),
        }
        if i < n_emit:
            p[f"resblock_{i}"] = block
        # else: consumed above (accounting) but deliberately dropped —
        # penultimate-feature extraction never runs the final block.
    if prefix + "ln_post.weight" in sd:
        ln_post = _ln(sd, prefix + "ln_post")
        if features != "penultimate":
            p["ln_post"] = ln_post
    if prefix + "proj" in sd:
        proj = np.asarray(sd[prefix + "proj"])
        if features == "pooled":
            p["proj"] = proj
    # The ipmv checkpoint embeds the WHOLE open_clip model; everything
    # outside the visual tower (text transformer, logit_scale, ...) is an
    # expected leftover — only report dropped keys under our prefix.
    sd.warn_unconsumed(only_prefix=prefix)
    return {"params": p}


def convert_resampler_torch_params(
    sd: Dict, cfg: ResamplerConfig, prefix: str = "image_proj_model."
) -> Dict:
    """Map the IP-Adapter ``Resampler`` state_dict (``latents``, ``proj_in``,
    ``layers.{i}.0`` = PerceiverAttention, ``layers.{i}.1`` = LN+FF
    Sequential) onto :class:`Resampler` variables.  Validated against
    :func:`soar_tpu.guidance.manifest.resampler_key_manifest`."""
    from .manifest import track

    sd = track(sd, "Resampler state_dict")
    lat = np.asarray(sd[prefix + "latents"])
    p: Dict = {
        "latents": lat[0] if lat.ndim == 3 else lat,
        "proj_in": _lin(sd, prefix + "proj_in"),
        "proj_out": _lin(sd, prefix + "proj_out"),
        "norm_out": _ln(sd, prefix + "norm_out"),
    }
    for i in range(cfg.depth):
        a = f"{prefix}layers.{i}.0"
        f = f"{prefix}layers.{i}.1"
        p[f"attn_{i}"] = {
            "norm1": _ln(sd, a + ".norm1"),
            "norm2": _ln(sd, a + ".norm2"),
            "to_q": _lin(sd, a + ".to_q"),
            "to_kv": _lin(sd, a + ".to_kv"),
            "to_out": _lin(sd, a + ".to_out"),
        }
        p[f"ff_{i}"] = {
            "norm": _ln(sd, f + ".0"),
            "fc1": _lin(sd, f + ".1"),
            "fc2": _lin(sd, f + ".3"),
        }
    sd.warn_unconsumed(only_prefix=prefix)
    return {"params": p}


def make_image_embed_fn(
    clip_variables: Dict,
    resampler_variables: Dict,
    clip_cfg: CLIPVisionConfig = CLIPVisionConfig(),
    resampler_cfg: ResamplerConfig = ResamplerConfig(),
):
    """Returns the jittable ``image_embed_fn`` the guidance injects:
    [H, W, 3] float in [0, 1] -> [num_queries, output_dim] ip tokens.
    Mirrors open_clip's preprocess (the reference pipes a PIL image through
    it): BICUBIC resize of the SHORTER side to the CLIP input size, center
    crop, then the CLIP channel normalization."""
    clip = CLIPViT(clip_cfg)
    resampler = Resampler(resampler_cfg)
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    s = clip_cfg.image_size

    def fn(ref_rgb: jnp.ndarray) -> jnp.ndarray:
        H, W = ref_rgb.shape[0], ref_rgb.shape[1]
        # shorter side -> s, preserving aspect ratio (static shapes: H/W are
        # trace-time constants), then center crop to s x s.
        scale = s / min(H, W)
        nh, nw = round(H * scale), round(W * scale)
        x = jax.image.resize(ref_rgb, (nh, nw, 3), method="cubic")
        y0, x0 = (nh - s) // 2, (nw - s) // 2
        x = jax.lax.dynamic_slice(x, (y0, x0, 0), (s, s, 3))
        x = (x - mean) / std
        tokens = clip.apply(clip_variables, x[None])
        return resampler.apply(resampler_variables, tokens)[0]

    return fn


