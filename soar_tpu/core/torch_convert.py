"""Shared torch-state_dict -> flax parameter-leaf helpers.

One home for the layer-level conversion rules used by every weight
converter in the repo (ImageDream UNet / SD VAE in ``guidance/networks``,
CLIP ViT + Resampler in ``guidance/clip_vit``, SAM ViT-H in
``preproc/sam``, ECON NormalNet in ``preproc/normal_net``), so a fix to a
transpose/bias rule propagates everywhere at once.

Conventions converted here:

- torch ``nn.Linear``  weight [out, in]        -> flax kernel [in, out]
- torch ``nn.Conv2d``  weight OIHW             -> flax kernel HWIO
- torch ``nn.ConvTranspose2d`` weight [in, out, kH, kW] -> flax HWIO
- torch ``LayerNorm/GroupNorm`` weight/bias    -> flax scale/bias
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def lin(sd: Dict, prefix: str) -> Dict:
    """``nn.Linear`` under ``prefix`` -> flax Dense leaf dict."""
    out = {"kernel": np.asarray(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def conv_kernel(w) -> np.ndarray:
    """``nn.Conv2d`` weight OIHW -> flax HWIO kernel array."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def conv(sd: Dict, prefix: str) -> Dict:
    """``nn.Conv2d`` under ``prefix`` -> flax Conv leaf dict."""
    out = {"kernel": conv_kernel(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def conv_transpose(sd: Dict, prefix: str) -> Dict:
    """``nn.ConvTranspose2d`` under ``prefix`` -> flax ConvTranspose leaf.

    torch stores [in, out, kH, kW] and computes the *gradient of conv*
    (a true transposed convolution); flax ``nn.ConvTranspose`` with the
    default ``transpose_kernel=False`` lowers to a fractionally-strided
    *correlation* over an HWIO kernel. Matching torch therefore needs the
    HWIO transpose AND a spatial kernel flip (verified numerically against
    ``torch.nn.ConvTranspose2d``: without the flip a k=2/s=2 layer is off
    by O(1) on unit-scale data, with it the outputs agree exactly).
    """
    k = np.transpose(np.asarray(sd[prefix + ".weight"]), (2, 3, 0, 1))
    out = {"kernel": np.ascontiguousarray(k[::-1, ::-1])}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def norm(sd: Dict, prefix: str) -> Dict:
    """``LayerNorm``/``GroupNorm`` under ``prefix`` -> flax scale/bias."""
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }
