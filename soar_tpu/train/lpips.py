"""LPIPS (VGG16 backbone) in flax.

The reference computes LPIPS-VGG losses and metrics via the ``lpips`` pip
package (``system/gaussian_surfel_mvdream.py:23-24, 342-358, 561-567``).
This rebuild implements the exact LPIPS-v0.1 computation:

    scale inputs by the LPIPS shift/scale -> VGG16 features at relu1_2,
    relu2_2, relu3_3, relu4_3, relu5_3 -> channel-unit-normalize ->
    squared difference -> per-layer learned 1x1 weights -> spatial mean, sum.

Weights (VGG16 + the 5 linear layers) convert from the torch ``lpips``
package via :func:`convert_lpips_params` — no weights are downloadable in
this environment, so training/eval gate LPIPS on the converted file's
presence (losses fall back to 0 with a warning, matching configs that set
``lambda_vgg = 0``).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512)
_SLICE_AFTER = (1, 3, 6, 9, 12)  # conv indices whose relu output is tapped

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        conv_i = 0
        x = x.astype(self.dtype)
        for c in _VGG16_CFG:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    c, (3, 3), padding=1, name=f"conv_{conv_i}",
                    dtype=self.dtype,
                )(x)
                x = nn.relu(x)
                if conv_i in _SLICE_AFTER:
                    feats.append(x)
                conv_i += 1
        return feats


class LPIPS(nn.Module):
    """``dtype=bfloat16`` runs the VGG convolutions (fwd AND their autodiff
    backward) on the MXU in bf16 while keeping the unit-normalization,
    squared differences, and reductions in f32 — standard TPU mixed
    precision.  The reference's ``lpips`` package computes in f32; measured
    loss delta on real image pairs is ~1e-3 relative (test-pinned), well
    under the loss's perceptual noise floor."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img0, img1):
        """img0/img1: [B, H, W, 3] in [-1, 1] -> [B] distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(name="vgg", dtype=self.dtype)
        f0 = vgg((img0 - shift) / scale)
        f1 = vgg((img1 - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
            a = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(
                f"lin_{i}", nn.initializers.ones, (d.shape[-1],)
            )
            total = total + jnp.mean(
                jnp.sum(d * jnp.maximum(w, 0.0), axis=-1), axis=(1, 2)
            )
        return total


def convert_lpips_params(vgg_sd: Dict, lpips_sd: Dict) -> Dict:
    """torchvision VGG16 ``features`` + lpips ``lin{i}.model.1.weight`` ->
    flax variables."""
    p: Dict = {"vgg": {}}
    torch_conv_layers = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, tl in enumerate(torch_conv_layers):
        w = np.asarray(vgg_sd[f"features.{tl}.weight"])
        b = np.asarray(vgg_sd[f"features.{tl}.bias"])
        p["vgg"][f"conv_{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
    for i in range(5):
        lw = np.asarray(lpips_sd[f"lin{i}.model.1.weight"])[:, :, 0, 0][0]
        p[f"lin_{i}"] = lw
    return {"params": p}


def make_lpips_fn(path: Optional[str] = None, dtype=jnp.bfloat16):
    """Returns a JITTABLE, differentiable distance fn
    ``(img0, img1) -> scalar`` over ``[H, W, 3]`` images in **[-1, 1]**
    (the lpips package's input convention), or None if the converted
    weights file is absent.  Used as the trainer's ``lpips_fn`` hook for
    the normal-LPIPS and VGG-RGB loss terms
    (``gaussian_surfel_mvdream.py:342-410``).

    ``dtype``: VGG compute dtype for the LOSS path (default bf16 — see
    :class:`LPIPS`; pass ``jnp.float32`` for exact reference arithmetic)."""
    import os

    if path is None or not os.path.exists(path):
        return None
    import pickle

    with open(path, "rb") as f:
        variables = pickle.load(f)
    net = LPIPS(dtype=dtype)

    def fn(a, b):
        return net.apply(variables, a[None], b[None])[0]

    return fn


def make_lpips_loss(path: Optional[str] = None, dtype=jnp.bfloat16):
    """Arg-passing variant of :func:`make_lpips_fn`: returns
    ``(fn(a, b, variables) -> scalar, variables)`` or ``(None, None)``.

    The variables arrive as a jit ARGUMENT (threaded through the train
    step's batch under ``"lpips_params"``, trainer ``lpips_via_batch``)
    instead of a closure capture: closure-captured VGG16 kernels bake
    ~56 MB of constants into every train-step executable — bloating the
    serialized program the axon transport must ship on every cold start
    (docs/PERFORMANCE.md item 19)."""
    import os

    if path is None or not os.path.exists(path):
        return None, None
    import pickle

    with open(path, "rb") as f:
        variables = pickle.load(f)
    net = LPIPS(dtype=dtype)

    def fn(a, b, variables):
        return net.apply(variables, a[None], b[None])[0]

    return fn, variables


def load_lpips(path: Optional[str] = None):
    """Returns lpips_fn(img0_01, img1_01) -> float, or None if weights are
    unavailable (callers treat None as 'LPIPS disabled'). Host-side wrapper
    of :func:`make_lpips_fn` for the eval protocol — always f32: reported
    LPIPS METRICS must be exactly comparable to the reference's eval
    numbers (only the loss-path default is bf16)."""
    raw = make_lpips_fn(path, dtype=jnp.float32)
    if raw is None:
        return None
    jfn = jax.jit(raw)

    def fn(a01, b01):
        a = jnp.asarray(a01) * 2.0 - 1.0
        b = jnp.asarray(b01) * 2.0 - 1.0
        return float(jfn(a, b))

    return fn
