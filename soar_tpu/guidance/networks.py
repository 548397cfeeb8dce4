"""Flax diffusion networks: multi-view SD2.1 UNet + SD VAE encoder.

Jittable rebuilds of the external torch models the reference drives through
``imagedream.model_zoo`` (``guidance/imagedream_guidance.py:55-59, 274``):

- :class:`MultiViewUNet` — Stable Diffusion 2.1-base UNet (320 base channels,
  channel_mult (1,2,4,4), 2 res blocks, spatial transformers with
  context_dim 1024, linear transformer projections, 64-dim heads) extended
  the MVDream/ImageDream way: a 16-dim camera-matrix embedding added to the
  time embedding, self-attention joined ACROSS the ``num_frames`` views
  (tokens reshaped [B/V, V*HW, C]), and optional image-prompt (``ip``) tokens
  concatenated to the cross-attention context.
- :class:`VAEEncoder` — SD AutoencoderKL encoder (128->512, 4 levels, mid
  attention), sampling the posterior and applying the 0.18215 latent scale.

Weights convert from the torch LDM checkpoints via
:func:`convert_unet_torch_params` / :func:`convert_vae_torch_params`
(download requires the user's own checkout — this environment has no
network egress, so converters are validated structurally, not numerically).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000):
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _gn(ch: int, eps: float = 1e-5) -> "nn.GroupNorm":
    """GroupNorm(32) as in LDM; group count shrinks for tiny test configs
    (real configs always use multiples of 32).  eps: the UNet ResBlock's
    GroupNorm32 keeps the torch default 1e-5; LDM's ``Normalize`` (all VAE
    norms + the SpatialTransformer input norm) sets 1e-6 explicitly."""
    return nn.GroupNorm(num_groups=math.gcd(32, ch), epsilon=eps)


class ResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, emb):
        h = _gn(x.shape[-1])(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1)(h)
        emb_out = nn.Dense(self.out_channels)(nn.silu(emb))
        h = h + emb_out[:, None, None, :]
        h = _gn(h.shape[-1])(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, kernel_init=nn.initializers.zeros
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1))(x)
        return x + h


class Attention(nn.Module):
    """Cross/self attention with ImageDream's optional DECOUPLED image-prompt
    branch (IP-Adapter style): ip tokens get their own to_k_ip/to_v_ip
    projections and a SECOND softmax whose output is added with ip_weight —
    NOT a joint softmax over [text + ip] tokens
    (``imagedream/ldm/modules/attention.py`` MemoryEfficientCrossAttention
    with ip_dim > 0, reached via the ``sd-v2.1-base-4view-ipmv`` UNet)."""

    heads: int
    dim_head: int
    ip_weight: float = 1.0

    @nn.compact
    def __call__(self, x, context=None, ip=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head

        def attend(q, k, v):
            def split(t):
                return t.reshape(t.shape[:-1] + (self.heads, self.dim_head))

            q, k, v = split(q), split(k), split(v)
            a = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.dim_head)
            a = jax.nn.softmax(a, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", a, v)
            return out.reshape(out.shape[:2] + (inner,))

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        out = attend(
            q,
            nn.Dense(inner, use_bias=False, name="to_k")(context),
            nn.Dense(inner, use_bias=False, name="to_v")(context),
        )
        if ip is not None:
            out = out + self.ip_weight * attend(
                q,
                nn.Dense(inner, use_bias=False, name="to_k_ip")(ip),
                nn.Dense(inner, use_bias=False, name="to_v_ip")(ip),
            )
        return nn.Dense(x.shape[-1], name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out * 2)(x)
        a, b = jnp.split(x, 2, axis=-1)
        # torch F.gelu default = exact erf (LDM GEGLU), not tanh approx.
        return a * nn.gelu(b, approximate=False)


class TransformerBlock(nn.Module):
    heads: int
    dim_head: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context, num_frames: int, ip=None):
        # Multi-view joint self-attention (MVDream "3D attention"): fold the
        # view axis into the token axis so views attend to each other.
        B, T, C = x.shape
        if num_frames > 1:
            xs = x.reshape(B // num_frames, num_frames * T, C)
        else:
            xs = x
        attn_out = Attention(self.heads, self.dim_head, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(xs)
        )
        if num_frames > 1:
            attn_out = attn_out.reshape(B, T, C)
        x = x + attn_out
        x = x + Attention(self.heads, self.dim_head, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context, ip=ip
        )
        x = x + nn.Sequential([GEGLU(C * 4), nn.Dense(C)], name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        )
        return x


class SpatialTransformer(nn.Module):
    heads: int
    dim_head: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context, num_frames: int, ip=None):
        B, H, W, C = x.shape
        # LDM attention.py Normalize: GroupNorm(32, eps=1e-6) — unlike the
        # UNet ResBlock's GroupNorm32 (torch default 1e-5).
        h = _gn(x.shape[-1], eps=1e-6)(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(C, name="proj_in")(h)  # use_linear_in_transformer
        h = TransformerBlock(
            self.heads, self.dim_head, self.context_dim, name="block0"
        )(h, context, num_frames, ip=ip)
        h = nn.Dense(C, name="proj_out", kernel_init=nn.initializers.zeros)(h)
        return x + h.reshape(B, H, W, C)


class MultiViewUNet(nn.Module):
    """ImageDream/MVDream 4-view UNet (see module docstring)."""

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attention_levels: Tuple[int, ...] = (0, 1, 2)
    num_head_channels: int = 64
    context_dim: int = 1024
    camera_dim: int = 16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, h, w, 4] noisy latents (B = views * 2 for CFG)
        t: jnp.ndarray,  # [B]
        context: Dict,  # {"context": [B, 77(+ip), D], "camera": [B, 16],
        #   "num_frames": int, optional "ip": [B, T_ip, D]}
    ) -> jnp.ndarray:
        ch0 = self.model_channels
        time_dim = ch0 * 4
        num_frames = context.get("num_frames", 1)

        emb = timestep_embedding(t, ch0)
        emb = nn.Dense(time_dim, name="time_embed_0")(emb)
        emb = nn.Dense(time_dim, name="time_embed_2")(nn.silu(emb))

        if "camera" in context:
            cam = context["camera"]
            cam_emb = nn.Dense(time_dim, name="camera_embed_0")(cam)
            cam_emb = nn.Dense(time_dim, name="camera_embed_2")(nn.silu(cam_emb))
            emb = emb + cam_emb

        ctx = context["context"]
        # Image-prompt (ip) tokens ride to every cross-attention layer's
        # DECOUPLED to_k_ip/to_v_ip branch (see Attention) — ImageDream
        # concatenates them into the context tensor at the forward boundary
        # and re-splits inside each attention; passing them separately is
        # the same computation.
        ip = context.get("ip")
        if ip is not None and ip.shape[-1] != ctx.shape[-1]:
            ip = nn.Dense(ctx.shape[-1], name="ip_proj")(ip)

        def heads_for(ch):
            return max(ch // self.num_head_channels, 1)

        hs = []
        h = nn.Conv(ch0, (3, 3), padding=1, name="input_conv")(x)
        hs.append(h)
        ds_channels = []
        for level, mult in enumerate(self.channel_mult):
            ch = ch0 * mult
            for i in range(self.num_res_blocks):
                h = ResBlock(ch, name=f"down_{level}_{i}_res")(h, emb)
                if level in self.attention_levels:
                    h = SpatialTransformer(
                        heads_for(ch),
                        self.num_head_channels,
                        self.context_dim,
                        name=f"down_{level}_{i}_attn",
                    )(h, ctx, num_frames, ip=ip)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(
                    ch, (3, 3), strides=2, padding=1, name=f"down_{level}_ds"
                )(h)
                hs.append(h)

        ch = ch0 * self.channel_mult[-1]
        h = ResBlock(ch, name="mid_res0")(h, emb)
        h = SpatialTransformer(
            heads_for(ch), self.num_head_channels, self.context_dim, name="mid_attn"
        )(h, ctx, num_frames, ip=ip)
        h = ResBlock(ch, name="mid_res1")(h, emb)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = ch0 * mult
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(ch, name=f"up_{level}_{i}_res")(h, emb)
                if level in self.attention_levels:
                    h = SpatialTransformer(
                        heads_for(ch),
                        self.num_head_channels,
                        self.context_dim,
                        name=f"up_{level}_{i}_attn",
                    )(h, ctx, num_frames, ip=ip)
            if level != 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, name=f"up_{level}_us")(h)

        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6, name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels,
            (3, 3),
            padding=1,
            kernel_init=nn.initializers.zeros,
            name="out_conv",
        )(h)


class VAEEncoder(nn.Module):
    """SD AutoencoderKL encoder -> sampled, scaled latents."""

    base_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    latent_channels: int = 4
    scale_factor: float = 0.18215

    @nn.compact
    def __call__(self, images01: jnp.ndarray, key: Optional[jax.Array] = None):
        x = images01 * 2.0 - 1.0
        h = nn.Conv(self.base_channels, (3, 3), padding=1, name="conv_in")(x)
        for level, mult in enumerate(self.channel_mult):
            ch = self.base_channels * mult
            for i in range(2):
                h = _VAEResBlock(ch, name=f"down_{level}_{i}")(h)
            if level != len(self.channel_mult) - 1:
                # SD's VAE Downsample: F.pad(x, (0,1,0,1)) + stride-2 VALID
                # conv (ldm/modules/diffusionmodules/model.py Downsample
                # with_conv) — asymmetric right/bottom padding, required for
                # activation alignment under converted real weights.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    ch, (3, 3), strides=2, padding="VALID",
                    name=f"down_{level}_ds",
                )(h)
        ch = self.base_channels * self.channel_mult[-1]
        h = _VAEResBlock(ch, name="mid_res0")(h)
        h = _VAEAttn(name="mid_attn")(h)
        h = _VAEResBlock(ch, name="mid_res1")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6, name="out_norm")(h)
        h = nn.silu(h)
        moments = nn.Conv(
            2 * self.latent_channels, (3, 3), padding=1, name="conv_out"
        )(h)
        moments = nn.Conv(
            2 * self.latent_channels, (1, 1), name="quant_conv"
        )(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        if key is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape
            )
        return mean * self.scale_factor


class _VAEResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        # LDM model.py Normalize: eps=1e-6 for every VAE norm.
        h = _gn(x.shape[-1], eps=1e-6)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1)(h)
        h = _gn(h.shape[-1], eps=1e-6)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1))(x)
        return x + h


class _VAEAttn(nn.Module):
    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _gn(x.shape[-1], eps=1e-6)(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C)(h)
        k = nn.Dense(C)(h)
        v = nn.Dense(C)(h)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / math.sqrt(C), axis=-1
        )
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(C)(out)
        return x + out.reshape(B, H, W, C)


# --------------------------------------------------------------------------
# torch -> flax weight conversion (best-effort name mapping; run with the
# user's downloaded MVDream/ImageDream or SD checkpoints).


from ..core.torch_convert import conv_kernel as _conv_kernel  # noqa: E402


def convert_vae_torch_params(sd: Dict) -> Dict:
    """Map an LDM first-stage (AutoencoderKL) torch state_dict onto
    :class:`VAEEncoder` variables.  Keys follow the CompVis/LDM naming
    (``encoder.down.{i}.block.{j}.*``, ``encoder.mid.*``, ``quant_conv``);
    validated against :func:`soar_tpu.guidance.manifest.vae_encoder_key_manifest`.
    Missing keys raise with near-miss suggestions; unconsumed encoder keys
    warn (the DECODER subtree is expected to remain unconsumed)."""
    import numpy as np

    from .manifest import track

    sd = track(sd, "VAE state_dict")
    p: Dict = {}

    def conv(prefix):
        return {
            "kernel": _conv_kernel(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"]),
        }

    def gn(prefix):
        return {
            "scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"]),
        }

    def resblock(tp, has_skip):
        out = {
            "GroupNorm_0": gn(tp + ".norm1"),
            "Conv_0": conv(tp + ".conv1"),
            "GroupNorm_1": gn(tp + ".norm2"),
            "Conv_1": conv(tp + ".conv2"),
        }
        if has_skip:
            out["Conv_2"] = conv(tp + ".nin_shortcut")
        return out

    # Level count from key presence (4 in the real SD VAE; tiny parity
    # configs have fewer).
    level = 0
    while f"encoder.down.{level}.block.0.norm1.weight" in sd:
        for i in range(2):
            tp = f"encoder.down.{level}.block.{i}"
            has_skip = (tp + ".nin_shortcut.weight") in sd
            p[f"down_{level}_{i}"] = resblock(tp, has_skip)
        if f"encoder.down.{level}.downsample.conv.weight" in sd:
            p[f"down_{level}_ds"] = conv(f"encoder.down.{level}.downsample.conv")
        level += 1
    p["mid_res0"] = resblock("encoder.mid.block_1", False)
    p["mid_res1"] = resblock("encoder.mid.block_2", False)

    def dense_from_1x1(prefix):
        w = np.asarray(sd[prefix + ".weight"])[:, :, 0, 0]
        return {"kernel": w.T, "bias": np.asarray(sd[prefix + ".bias"])}

    p["mid_attn"] = {
        "GroupNorm_0": gn("encoder.mid.attn_1.norm"),
        "Dense_0": dense_from_1x1("encoder.mid.attn_1.q"),
        "Dense_1": dense_from_1x1("encoder.mid.attn_1.k"),
        "Dense_2": dense_from_1x1("encoder.mid.attn_1.v"),
        "Dense_3": dense_from_1x1("encoder.mid.attn_1.proj_out"),
    }
    p["conv_in"] = conv("encoder.conv_in")
    p["out_norm"] = gn("encoder.norm_out")
    p["conv_out"] = conv("encoder.conv_out")
    p["quant_conv"] = conv("quant_conv")
    # Only the encoder half is used for SDS; decoder/post_quant keys in a
    # full AutoencoderKL dict are expected leftovers.
    sd.warn_unconsumed(ignore_prefixes=("decoder.", "post_quant_conv", "loss."))
    return {"params": p}


def convert_unet_torch_params(
    sd: Dict, unet: Optional["MultiViewUNet"] = None
) -> Dict:
    """Map the MVDream/ImageDream ``MultiViewUNetModel`` (LDM openaimodel)
    state_dict onto :class:`MultiViewUNet` variables.

    The torch module stores blocks in flat ``input_blocks.N`` /
    ``middle_block`` / ``output_blocks.N`` ``TimestepEmbedSequential`` lists;
    this walks them in the exact construction order of
    :class:`MultiViewUNet.__call__` (same order the torch ``UNetModel``
    constructor uses).  Validated by a flax->torch-layout round-trip test
    (``tests/test_guidance_networks.py``) AND against the upstream-transcribed
    key manifest (:func:`soar_tpu.guidance.manifest.unet_key_manifest`).
    Missing keys raise with near-miss suggestions; unconsumed keys warn."""
    import numpy as np

    from .manifest import track

    sd = track(sd, "UNet state_dict")
    u = unet or MultiViewUNet()
    p: Dict = {}

    def lin(prefix):
        out = {"kernel": np.asarray(sd[prefix + ".weight"]).T}
        if prefix + ".bias" in sd:
            out["bias"] = np.asarray(sd[prefix + ".bias"])
        return out

    def conv(prefix):
        return {
            "kernel": _conv_kernel(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"]),
        }

    def gn(prefix):
        return {
            "scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"]),
        }

    def resblock(tp):
        out = {
            "GroupNorm_0": gn(tp + ".in_layers.0"),
            "Conv_0": conv(tp + ".in_layers.2"),
            "Dense_0": lin(tp + ".emb_layers.1"),
            "GroupNorm_1": gn(tp + ".out_layers.0"),
            "Conv_1": conv(tp + ".out_layers.3"),
        }
        if tp + ".skip_connection.weight" in sd:
            out["Conv_2"] = conv(tp + ".skip_connection")
        return out

    def attention(tp):
        out = {
            "to_q": lin(tp + ".to_q"),
            "to_k": lin(tp + ".to_k"),
            "to_v": lin(tp + ".to_v"),
            "to_out": lin(tp + ".to_out.0"),
        }
        # ipmv checkpoints carry DECOUPLED image-prompt projections on every
        # cross-attention (IP-Adapter style; see Attention docstring).
        if tp + ".to_k_ip.weight" in sd:
            out["to_k_ip"] = lin(tp + ".to_k_ip")
            out["to_v_ip"] = lin(tp + ".to_v_ip")
        return out

    def proj_inout(prefix):
        w = np.asarray(sd[prefix + ".weight"])
        if w.ndim == 4:  # conv projection (use_linear_in_transformer=False)
            w = w[:, :, 0, 0]
        return {"kernel": w.T, "bias": np.asarray(sd[prefix + ".bias"])}

    def transformer(tp):
        tb = tp + ".transformer_blocks.0"
        return {
            "GroupNorm_0": gn(tp + ".norm"),
            "proj_in": proj_inout(tp + ".proj_in"),
            "block0": {
                "norm1": gn(tb + ".norm1"),
                "attn1": attention(tb + ".attn1"),
                "norm2": gn(tb + ".norm2"),
                "attn2": attention(tb + ".attn2"),
                "norm3": gn(tb + ".norm3"),
                # flax inlines the ff Sequential's children into the block
                # scope: GEGLU_0 = ff.net.0 (GEGLU proj), Dense_0 = ff.net.2.
                "GEGLU_0": {"Dense_0": lin(tb + ".ff.net.0.proj")},
                "Dense_0": lin(tb + ".ff.net.2"),
            },
            "proj_out": proj_inout(tp + ".proj_out"),
        }

    p["time_embed_0"] = lin("time_embed.0")
    p["time_embed_2"] = lin("time_embed.2")
    if "camera_embed.0.weight" in sd:
        p["camera_embed_0"] = lin("camera_embed.0")
        p["camera_embed_2"] = lin("camera_embed.2")

    # input_blocks: .0.0 is conv_in; then num_res_blocks x (res [+ attn]) per
    # level with a Downsample (.0.op) between levels.
    p["input_conv"] = conv("input_blocks.0.0")
    n = 1
    for level in range(len(u.channel_mult)):
        for i in range(u.num_res_blocks):
            p[f"down_{level}_{i}_res"] = resblock(f"input_blocks.{n}.0")
            if level in u.attention_levels:
                p[f"down_{level}_{i}_attn"] = transformer(f"input_blocks.{n}.1")
            n += 1
        if level != len(u.channel_mult) - 1:
            p[f"down_{level}_ds"] = conv(f"input_blocks.{n}.0.op")
            n += 1

    p["mid_res0"] = resblock("middle_block.0")
    p["mid_attn"] = transformer("middle_block.1")
    p["mid_res1"] = resblock("middle_block.2")

    n = 0
    for level in reversed(range(len(u.channel_mult))):
        for i in range(u.num_res_blocks + 1):
            p[f"up_{level}_{i}_res"] = resblock(f"output_blocks.{n}.0")
            idx = 1
            if level in u.attention_levels:
                p[f"up_{level}_{i}_attn"] = transformer(f"output_blocks.{n}.1")
                idx = 2
            if level != 0 and i == u.num_res_blocks:
                p[f"up_{level}_us"] = conv(f"output_blocks.{n}.{idx}.conv")
            n += 1

    p["out_norm"] = gn("out.0")
    p["out_conv"] = conv("out.2")
    sd.warn_unconsumed()
    return {"params": p}
