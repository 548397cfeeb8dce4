"""Training losses (pure jnp, channel-last).

Equivalents of ``utils/loss_utils.py`` (weighted L1, windowed SSIM) and the
loss helpers in the system module (``system/gaussian_surfel_mvdream.py:
622-630`` cos_loss, threestudio ``tv_loss``) plus PSNR for eval
(``utils/image_utils.py:30``).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def masked_l1(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """L1 over masked pixels only (the reference indexes with a bool mask,
    ``gaussian_surfel_mvdream.py:311-313``; mean over selected elements)."""
    m = mask.astype(a.dtype)
    if m.ndim == a.ndim - 1:
        m = m[..., None]
    denom = jnp.maximum(jnp.sum(m) * a.shape[-1] / max(m.shape[-1], 1), 1.0)
    return jnp.sum(jnp.abs(a - b) * m) / denom


@lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float):
    g = np.array(
        [
            math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
            for x in range(window_size)
        ]
    )
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)  # numpy: safe to cache across traces


def ssim(
    img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11
) -> jnp.ndarray:
    """Windowed SSIM with an 11x11 sigma-1.5 Gaussian window, per-channel
    depthwise convolution with same-padding, constants C1=0.01², C2=0.03²
    (``utils/loss_utils.py:17-77``).  Inputs [..., H, W, C] in [0, 1]."""
    w = jnp.asarray(_gaussian_window(window_size, 1.5))
    pad = window_size // 2

    def blur(x):
        # depthwise conv: [B, H, W, C] with the same window per channel
        x4 = x.reshape((-1,) + x.shape[-3:])
        C = x4.shape[-1]
        kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, C))
        out = jax.lax.conv_general_dilated(
            x4,
            kernel,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
        return out.reshape(x.shape)

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return jnp.mean(ssim_map)


def cos_loss(
    output01: jnp.ndarray,
    gt01: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    thrsh: float = 0.0,
    weight: float = 1.0,
) -> jnp.ndarray:
    """1 - cosine similarity of [0,1]-encoded normals, averaged over pixels
    whose cosine is below cos(thrsh) (``gaussian_surfel_mvdream.py:622-630``).
    Under jit the filtered mean becomes a masked mean."""
    o = output01 * 2.0 - 1.0
    g = gt01 * 2.0 - 1.0
    cos = jnp.sum(o * g * weight, axis=-1)
    sel = cos < np.cos(thrsh)
    if mask is not None:
        sel = sel & mask.astype(bool)
    sel = sel.astype(cos.dtype)
    return jnp.sum((1.0 - cos) * sel) / jnp.maximum(jnp.sum(sel), 1.0)


def tv_loss(img: jnp.ndarray) -> jnp.ndarray:
    """Total variation on [..., H, W, C] (threestudio ``tv_loss``)."""
    dh = jnp.mean((img[..., 1:, :, :] - img[..., :-1, :, :]) ** 2)
    dw = jnp.mean((img[..., :, 1:, :] - img[..., :, :-1, :]) ** 2)
    return dh + dw


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
