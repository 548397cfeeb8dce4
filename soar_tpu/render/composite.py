"""Order-dependent alpha compositing as vectorized cumulative products.

The reference's per-pixel sequential loop (``cuda_rasterizer/forward.cu:
497-633``) is inherently ordered, but its semantics — skip rules, the 0.99
alpha clamp, and the T < 1e-4 early stop — can be expressed exactly with an
exclusive cumulative product along the depth-sorted axis.  That turns the
serial CUDA loop into dense VPU math that XLA vectorizes and differentiates,
with no custom backward needed (the reference hand-writes ~1000 lines of
``backward.cu`` for this).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def splat_alpha(
    d: jnp.ndarray,  # [..., 2] pixel offset (mean_xy - pixf)
    conic: jnp.ndarray,  # [..., 3] (a, b, c)
    opacity: jnp.ndarray,  # [...]
    valid: jnp.ndarray,  # [...] bool
    alpha_clamp: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
) -> jnp.ndarray:
    """Gaussian falloff alpha with the reference's skip rules applied as a
    hard zero (``forward.cu:502-545``): power>0 and alpha<1/255 contribute
    nothing and do not advance transmittance."""
    dx, dy = d[..., 0], d[..., 1]
    power = (
        -0.5 * (conic[..., 0] * dx * dx + conic[..., 2] * dy * dy)
        - conic[..., 1] * dx * dy
    )
    alpha = jnp.minimum(alpha_clamp, opacity * jnp.exp(jnp.minimum(power, 0.0)))
    keep = (power <= 0.0) & (alpha >= alpha_min) & valid
    # where() instead of alpha*keep: a NaN alpha (degenerate splat row
    # reaching a padding slot) must mask to 0, not NaN*0 = NaN.
    return jnp.where(keep, alpha, 0.0)


def composite_weights(
    alpha: jnp.ndarray, t_min: float = 1e-4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-splat blend weights w_i = alpha_i * prod_{j<i}(1 - alpha_j) along
    the LAST axis (depth-sorted front-to-back), with the early-stop rule of
    ``forward.cu:548-552``: the first splat that would push T below ``t_min``
    — and everything behind it — is excluded.

    Returns (weights [..., K], final transmittance [...]).
    """
    one_minus = 1.0 - alpha
    t_excl = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), jnp.cumprod(one_minus[..., :-1], axis=-1)],
        axis=-1,
    )
    violates = t_excl * one_minus < t_min
    excluded = jnp.cumsum(violates.astype(jnp.int32), axis=-1) >= 1
    alpha_eff = jnp.where(excluded, 0.0, alpha)

    one_minus_eff = 1.0 - alpha_eff
    t_excl_eff = jnp.concatenate(
        [
            jnp.ones_like(alpha[..., :1]),
            jnp.cumprod(one_minus_eff[..., :-1], axis=-1),
        ],
        axis=-1,
    )
    weights = alpha_eff * t_excl_eff
    t_final = jnp.prod(one_minus_eff, axis=-1)
    return weights, t_final


def finalize_accum(
    accum_color: jnp.ndarray,  # [..., C] pre-background weighted sum
    accum_normal: jnp.ndarray,  # [..., 3] (zeros if not surface)
    accum_depth: jnp.ndarray,  # [...] plane-corrected weighted depth sum
    t_final: jnp.ndarray,  # [...]
    bg_color: jnp.ndarray,  # [C] or [..., C]
    normalize_depth: bool,
):
    """Output assembly for composites that return pre-accumulated channel
    sums (the fused Pallas path, :mod:`soar_tpu.render.block_composite`)
    instead of per-slot weights — same math as :func:`finalize`."""
    T = jnp.minimum(1.0 - 1e-6, t_final)
    color = accum_color + T[..., None] * bg_color
    depth = (
        accum_depth / (1.0 - T) if normalize_depth else accum_depth + T * 10.0
    )
    return color, accum_normal, depth, 1.0 - T, T


def finalize(
    weights: jnp.ndarray,  # [..., K]
    t_final: jnp.ndarray,  # [...]
    colors: jnp.ndarray,  # [..., K, C]
    normals: jnp.ndarray,  # [..., K, 3]
    depths: jnp.ndarray,  # [..., K] plane-corrected per-pixel depths
    bg_color: jnp.ndarray,  # [C] or [..., C]
    surface: bool,
    normalize_depth: bool,
):
    """Output assembly (``forward.cu:616-633``): T clamped to <= 1-1e-6,
    color composited over bg, depth normalized by accumulated alpha (or the
    reference's ``D + T*10`` fallback).

    Accepts f32 or bf16 slot tensors (``RasterConfig.composite_dtype``);
    every K-contraction accumulates in f32 and all outputs are f32."""
    f32 = jnp.float32
    T = jnp.minimum(1.0 - 1e-6, t_final.astype(f32))
    # precision=HIGHEST + f32 accumulation: on TPU the default matmul
    # precision rounds the f32 channel reduction through bf16 (measured
    # 3.4e-3 abs error vs an f64 oracle on v5e); the reference CUDA
    # composite accumulates in fp32 (forward.cu:616-633), so the
    # K-contraction must accumulate f32 even when the slot tensors ride
    # bf16.  The contraction is tiny (K x C per pixel) — cost is
    # negligible.
    _HP = jax.lax.Precision.HIGHEST
    color = (
        jnp.einsum("...k,...kc->...c", weights, colors, precision=_HP,
                   preferred_element_type=f32)
        + T[..., None] * jnp.asarray(bg_color, f32)
    )
    if surface:
        normal = jnp.einsum("...k,...kc->...c", weights, normals,
                            precision=_HP, preferred_element_type=f32)
    else:
        normal = jnp.zeros(color.shape[:-1] + (3,), f32)
    D = jnp.einsum("...k,...k->...", weights, depths, precision=_HP,
                   preferred_element_type=f32)
    depth = D / (1.0 - T) if normalize_depth else D + T * 10.0
    opac = 1.0 - T
    return color, normal, depth, opac, T
