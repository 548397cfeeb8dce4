"""ECON NormalNet in flax: clothed front/back normal prediction.

Rebuild of ``submodules/econ/lib/net/NormalNet.py:70-117`` + the pix2pixHD
``GlobalGenerator`` it instantiates (``econ/lib/net/FBNet.py:237-308``):
two independent generators — netF consumes (image, T_normal_F) = 6 channels,
netB (image, T_normal_B) — each: 7x7 conv (reflect pad) -> 4 stride-2
downsamples (64..1024) -> 9 reflect-padded resnet blocks -> 4 transposed-conv
upsamples -> 7x7 conv -> tanh; InstanceNorm throughout.  Outputs are
L2-normalized and masked by nonzero input pixels.

Weights convert from the ECON checkpoint via :func:`convert_normalnet_params`
(user-downloaded; this image has no egress).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class InstanceNorm(nn.Module):
    """Affine-free instance norm (pix2pixHD uses affine=False by default)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ResnetBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = _reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID")(h)
        h = InstanceNorm()(h)
        h = nn.relu(h)
        h = _reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID")(h)
        h = InstanceNorm()(h)
        return x + h


class GlobalGenerator(nn.Module):
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9

    @nn.compact
    def __call__(self, x):
        h = _reflect_pad(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding="VALID")(h)
        h = nn.relu(InstanceNorm()(h))
        for i in range(self.n_downsampling):
            mult = 2**i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=2, padding=1)(h)
            h = nn.relu(InstanceNorm()(h))
        mult = 2**self.n_downsampling
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * mult)(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = nn.ConvTranspose(
                self.ngf * mult // 2, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2))
            )(h)
            h = nn.relu(InstanceNorm()(h))
        h = _reflect_pad(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID")(h)
        return jnp.tanh(h)


class NormalNet(nn.Module):
    """Dual-generator front/back normal predictor."""

    @nn.compact
    def __call__(self, image, t_normal_f, t_normal_b):
        """All inputs [B, H, W, 3] in [-1, 1]; returns (nmlF, nmlB) in [-1,1],
        unit-norm, masked by the image foreground."""
        nmlF = GlobalGenerator(name="netF")(
            jnp.concatenate([image, t_normal_f], axis=-1)
        )
        nmlB = GlobalGenerator(name="netB")(
            jnp.concatenate([image, t_normal_b], axis=-1)
        )
        nmlF = nmlF / jnp.maximum(
            jnp.linalg.norm(nmlF, axis=-1, keepdims=True), 1e-8
        )
        nmlB = nmlB / jnp.maximum(
            jnp.linalg.norm(nmlB, axis=-1, keepdims=True), 1e-8
        )
        mask = (
            jnp.sum(jnp.abs(image), axis=-1, keepdims=True) != 0.0
        ).astype(image.dtype)
        return nmlF * mask, nmlB * mask


def convert_normalnet_params(sd: Dict) -> Dict:
    """Map the ECON ``normal.ckpt`` torch state_dict (netF/netB Sequential
    indices) onto :class:`NormalNet` variables."""
    from soar_tpu.core import torch_convert as tc

    def conv(prefix, transpose=False):
        return (tc.conv_transpose if transpose else tc.conv)(sd, prefix)

    out = {}
    for net in ("netF", "netB"):
        p = {}
        # Sequential layout: [pad, conv, IN, relu] + 4x[conv, IN, relu] +
        # 9xResnetBlock + 4x[convT, IN, relu] + [pad, conv, tanh].
        seq = f"{net}.model"
        ci = 0
        p[f"Conv_{ci}"] = conv(f"{seq}.1")
        ci += 1
        idx = 4
        for i in range(4):
            p[f"Conv_{ci}"] = conv(f"{seq}.{idx}")
            ci += 1
            idx += 3
        for b in range(9):
            p[f"ResnetBlock_{b}"] = {
                "Conv_0": conv(f"{seq}.{idx}.conv_block.1"),
                "Conv_1": conv(f"{seq}.{idx}.conv_block.5"),
            }
            idx += 1
        ti = 0
        for i in range(4):
            p[f"ConvTranspose_{ti}"] = conv(f"{seq}.{idx}", transpose=True)
            ti += 1
            idx += 3
        p[f"Conv_{ci}"] = conv(f"{seq}.{idx + 1}")
        out[net] = p
    return {"params": out}
