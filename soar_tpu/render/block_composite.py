"""Blocked Pallas TPU kernel for the per-tile alpha composite (fwd + bwd).

Second-generation Pallas composite.  The first attempt
(:mod:`soar_tpu.render.pallas_composite`) walked each tile's splat list with
a serial ``while_loop`` — measured 11x SLOWER than the dense XLA cumprod
formulation because one 16x16 tile underfills the VPU and the depth loop
serializes.  This kernel keeps the DENSE [tiles, pixels, K] formulation the
XLA path proved fast, but fuses the whole chain (alpha -> exclusion ->
weights -> channel sums) into one kernel over a BLOCK of tiles, so the
[tiles, pixels, K] intermediates never touch HBM:

- the XLA path materializes alpha / two cumprods / weights / plane-corrected
  depths as separate [NT, P, K] HBM tensors (~100 MB each at 512px, K=96;
  several round trips forward, more in the autodiff backward) — the
  composite is HBM-bandwidth-bound;
- here each grid step loads one block of B tiles' gathered slot attributes
  (~100 KB) into VMEM, computes everything at register/VMEM speed, and
  writes only the [B, C, P] accumulated outputs.  HBM traffic per composite
  drops from ~GBs to ~16 MB.

The depth-ordered semantics (``cuda_rasterizer/forward.cu:497-633``: 0.99
alpha clamp, 1/255 alpha skip, sticky T < 1e-4 early stop) are preserved
EXACTLY in masked-dense form, matching :func:`soar_tpu.render.composite.
composite_weights`:  the exclusive cumulative product is computed in log
space as ``exp(cumsum(log1p(-alpha)))`` where the cumsum is a [K, K]
strictly-lower-triangular matmul — an MXU op, no serial scan.  (1 - alpha
>= 0.01 always, so the logs are well-conditioned; parity vs the XLA cumprod
is ~1e-6 relative, with the usual measure-zero threshold-flip caveat at the
T-early-stop boundary.)

The backward is a second Pallas kernel (custom_vjp) that RECOMPUTES the
forward quantities in VMEM (cheap — the inputs are still resident) and
applies the hand-derived gradient of the exclusive-cumprod composite:

    w_j = a_j * prod_{i<j}(1 - a_i),    T = prod_j (1 - a_j)
    dL/da_k = gw_k * t_k - (S_k + gT * T) / (1 - a_k),
    S_k = sum_{j>k} gw_j * w_j          (strict-upper-triangular matmul)

with the exclusion / skip masks treated as constants — exactly what XLA
autodiff does through the ``where`` masks, so gradients match the XLA path.
This replaces the reference's 1000-line hand-written ``backward.cu`` with
~60 lines of kernel math.

Feature packing (one [NT, K, F] input, F = 9 + C):

    0:2  xy        splat mean (pixels)
    2:5  conic     inverse 2D covariance (a, b, c)
    5    opacity
    6    valid     1.0 / 0.0 slot mask
    7:9  e         per-pixel depth-correction coefficients: the reference's
                   ``depth_differencing`` (``auxiliary.h:390-397``) is linear
                   in the pixel offset:  dif_z = dx*e0 + dy*e1 with
                   e0 = j0*j6 + j2*j9, e1 = j1*j6 + j3*j9  (jinv columns)
    9:9+C attrs    channels composited linearly (colors, normals, depth)

Outputs per tile: ``accum [C, P]`` (pre-background weighted channel sums),
``corr [P]`` (the depth correction  sum_k w_k * (dx*e0 + dy*e1), to be
SUBTRACTED from the depth channel by the caller), ``T [P]`` (final
transmittance).  Background compositing / depth normalization stay with the
caller (:func:`finalize_accum`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-VMEM stack limit is 16 MB; the dense [B, P, K]
# working set of this kernel (≈15 live intermediates, K padded to a 128
# lane multiple) exceeds it even at small block sizes (measured 71 MB at
# block=8, K=24, P=256 on v5e).  v4/v5e-class parts have 128 MB VMEM —
# raise the scoped limit rather than shrinking the block below
# MXU-efficient sizes.  Override with SOAR_TPU_PALLAS_VMEM_MB for parts
# with a different VMEM budget (ADVICE r3).


def _vmem_limit():
    import os

    mb = int(os.environ.get("SOAR_TPU_PALLAS_VMEM_MB", "0"))
    if mb <= 0:
        try:
            kind = jax.devices()[0].device_kind.lower()
        except Exception:
            kind = ""
        # v2/v3 cores have 16/32 MB VMEM; v4+ have 128 MB.
        mb = 14 if ("v2" in kind or "v3" in kind) else 100
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)

F_XY = 0
F_CONIC = 2
F_OPAC = 5
F_VALID = 6
F_E = 7
F_ATTR = 9


def _triangular(K: int, mode: str) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    if mode == "lower_strict":  # [j, k] = 1 iff j < k   (exclusive prefix)
        m = row < col
    elif mode == "lower_incl":  # [j, k] = 1 iff j <= k  (inclusive prefix)
        m = row <= col
    elif mode == "upper_strict":  # [j, k] = 1 iff j > k (exclusive suffix)
        m = row > col
    else:  # pragma: no cover
        raise ValueError(mode)
    return m.astype(jnp.float32)


def _prefix_mm(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """[B, P, K] prefix/suffix sums along K as one [B*P, K] @ [K, K] matmul."""
    B, P, K = x.shape
    # precision=HIGHEST: at the JAX default the MXU rounds f32 inputs to
    # bf16, costing ~3 decimal digits in the log-space cumprod; Mosaic
    # honors HIGHEST (verified on v5e: 2e-7 vs an f64 oracle) and these
    # [B*P, K] @ [K, K] matmuls are a small share of the kernel's work.
    # Kept explicit (not inherited from jax_default_matmul_precision) so
    # the kernel stays exact under any global setting.
    y = jax.lax.dot_general(
        x.reshape(B * P, K),
        tri,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(B, P, K)


def _pix_sum_many(arrs):
    """Pixel reductions for the backward kernel: each [B, P, K] array in
    ``arrs`` -> [B, K], computed as ONE [1, P] @ [P, G*K] MXU dot per block
    item over the lane-concatenated stack.

    Why not ``jnp.sum(x, axis=1)``: the middle-axis
    ``vector.multi_reduction`` (and its keepdims variant) fails Mosaic
    ("Not implemented: Unsupported output implicit dimension") under the
    mixed per-splat/per-pixel broadcast layouts these arrays carry
    (measured on v5e; the same reduce on a freshly-loaded ref compiles).
    Why concatenated: per-array per-item dots compile — but G*B ≈ 40
    unrolled tiny matmuls blow Mosaic's compile time past 7 minutes at
    the SMALL test shape.  One wide dot per item keeps the unroll at B
    and the rhs a proper MXU shape ([P, G*K] ≈ [256, 10K])."""
    G = len(arrs)
    B, P, K = arrs[0].shape
    cat = jnp.concatenate(arrs, axis=-1)  # [B, P, G*K]
    ones = jnp.ones((1, P), jnp.float32)
    rows = [
        jax.lax.dot_general(
            ones, cat[b], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for b in range(B)
    ]
    red = jnp.concatenate(rows, axis=0)  # [B, G*K]
    return [red[:, g * K:(g + 1) * K] for g in range(G)]


def _splat_terms(f, px, py, alpha_clamp, alpha_min, t_min):
    """Shared fwd recompute: returns everything both kernels need."""
    xy_x = f[:, :, F_XY][:, None, :]  # [B, 1, K]
    xy_y = f[:, :, F_XY + 1][:, None, :]
    ca = f[:, :, F_CONIC][:, None, :]
    cb = f[:, :, F_CONIC + 1][:, None, :]
    cc = f[:, :, F_CONIC + 2][:, None, :]
    op = f[:, :, F_OPAC][:, None, :]
    validf = f[:, :, F_VALID][:, None, :]
    e0 = f[:, :, F_E][:, None, :]
    e1 = f[:, :, F_E + 1][:, None, :]

    dx = xy_x - px[:, :, None]  # [B, P, K]
    dy = xy_y - py[:, :, None]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    u = op * jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = jnp.minimum(alpha_clamp, u)
    keep = (power <= 0.0) & (alpha_raw >= alpha_min) & (validf > 0.5)
    alpha = jnp.where(keep, alpha_raw, 0.0)

    K = alpha.shape[-1]
    lo = jnp.log1p(-alpha)
    t_excl = jnp.exp(_prefix_mm(lo, _triangular(K, "lower_strict")))
    violates = (t_excl * (1.0 - alpha)) < t_min
    n_viol = _prefix_mm(
        violates.astype(jnp.float32), _triangular(K, "lower_incl")
    )
    excluded = n_viol > 0.5
    active = keep & jnp.logical_not(excluded)
    alpha_e = jnp.where(excluded, 0.0, alpha)
    lo_e = jnp.where(excluded, 0.0, lo)
    t_e = jnp.exp(_prefix_mm(lo_e, _triangular(K, "lower_strict")))
    w = alpha_e * t_e
    return dict(
        dx=dx, dy=dy, power=power, u=u, alpha_e=alpha_e, lo_e=lo_e,
        t_e=t_e, w=w, active=active, ca=ca, cb=cb, cc=cc, e0=e0, e1=e1,
    )


def _fwd_kernel(
    feat_ref, px_ref, py_ref, accum_ref, corr_ref, t_ref,
    *, C, alpha_clamp, alpha_min, t_min,
):
    # Per-pixel operands carry a singleton middle dim — Mosaic requires the
    # last two block dims be (8, 128)-divisible or full-size, which (1, P)
    # satisfies for any tile-block size (a plain (block, P) spec does not).
    f = feat_ref[...]
    s = _splat_terms(
        f, px_ref[:, 0, :], py_ref[:, 0, :], alpha_clamp, alpha_min, t_min
    )
    w = s["w"]
    t_ref[:, 0, :] = jnp.exp(jnp.sum(s["lo_e"], axis=-1))
    corr_ref[:, 0, :] = jnp.sum(
        w * (s["dx"] * s["e0"] + s["dy"] * s["e1"]), axis=-1
    )
    for c in range(C):
        attr_c = f[:, :, F_ATTR + c][:, None, :]
        accum_ref[:, c, :] = jnp.sum(w * attr_c, axis=-1)


def _bwd_kernel(
    feat_ref, px_ref, py_ref, gacc_ref, gcorr_ref, gt_ref, gfeat_ref,
    *, C, alpha_clamp, alpha_min, t_min,
):
    f = feat_ref[...]
    s = _splat_terms(
        f, px_ref[:, 0, :], py_ref[:, 0, :], alpha_clamp, alpha_min, t_min
    )
    dx, dy, w, t_e = s["dx"], s["dy"], s["w"], s["t_e"]
    e0, e1 = s["e0"], s["e1"]

    gcorr = gcorr_ref[:, 0, :][:, :, None]  # [B, P, 1]
    gt = gt_ref[:, 0, :]  # [B, P]

    # dL/dw per pixel-slot: channel cotangents + the corr output.
    gw = gcorr * (dx * e0 + dy * e1)
    gattrs = []
    for c in range(C):
        gacc_c = gacc_ref[:, c, :][:, :, None]  # [B, P, 1]
        attr_c = f[:, :, F_ATTR + c][:, None, :]
        gw = gw + gacc_c * attr_c
        # dL/dattr_c (per slot): sum over pixels (reduced batched below).
        gattrs.append(w * gacc_c)

    K = w.shape[-1]
    S = _prefix_mm(gw * w, _triangular(K, "upper_strict"))
    T = jnp.exp(jnp.sum(s["lo_e"], axis=-1))[:, :, None]  # [B, P, 1]
    ga = gw * t_e - (S + gt[:, :, None] * T) / (1.0 - s["alpha_e"])
    ga = jnp.where(s["active"], ga, 0.0)

    gu = jnp.where(s["u"] < alpha_clamp, ga, 0.0)
    gpow = jnp.where(
        s["power"] < 0.0, gu * s["u"], 0.0
    )  # d(op*exp(min(p,0)))/dp
    gop = gu * jnp.exp(jnp.minimum(s["power"], 0.0))

    ca, cb, cc = s["ca"], s["cb"], s["cc"]
    gdx = gpow * (-(ca * dx + cb * dy)) + gcorr * w * e0
    gdy = gpow * (-(cc * dy + cb * dx)) + gcorr * w * e1

    reds = _pix_sum_many(
        [
            gdx,
            gdy,
            gpow * (-0.5 * dx * dx),
            gpow * (-dx * dy),
            gpow * (-0.5 * dy * dy),
            gop,
            gcorr * w * dx,
            gcorr * w * dy,
        ]
        + gattrs
    )
    gfeat_ref[:, :, F_XY] = reds[0]
    gfeat_ref[:, :, F_XY + 1] = reds[1]
    gfeat_ref[:, :, F_CONIC] = reds[2]
    gfeat_ref[:, :, F_CONIC + 1] = reds[3]
    gfeat_ref[:, :, F_CONIC + 2] = reds[4]
    gfeat_ref[:, :, F_OPAC] = reds[5]
    gfeat_ref[:, :, F_VALID] = jnp.zeros(
        gop.shape[:1] + gop.shape[2:3], jnp.float32
    )
    gfeat_ref[:, :, F_E] = reds[6]
    gfeat_ref[:, :, F_E + 1] = reds[7]
    for c in range(C):
        gfeat_ref[:, :, F_ATTR + c] = reds[8 + c]


@functools.lru_cache(maxsize=None)
def _make_fused(
    K: int, C: int, P: int, block: int,
    alpha_clamp: float, alpha_min: float, t_min: float, interpret: bool,
    bwd_block: int = 1,
):
    F = F_ATTR + C
    kw = dict(C=C, alpha_clamp=alpha_clamp, alpha_min=alpha_min, t_min=t_min)

    def _fwd_call(feat, px, py):
        NT = feat.shape[0]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=(NT // block,),
            in_specs=[
                pl.BlockSpec((block, K, F), lambda i: (i, 0, 0)),
                pl.BlockSpec((block, 1, P), lambda i: (i, 0, 0)),
                pl.BlockSpec((block, 1, P), lambda i: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block, C, P), lambda i: (i, 0, 0)),
                pl.BlockSpec((block, 1, P), lambda i: (i, 0, 0)),
                pl.BlockSpec((block, 1, P), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NT, C, P), jnp.float32),
                jax.ShapeDtypeStruct((NT, 1, P), jnp.float32),
                jax.ShapeDtypeStruct((NT, 1, P), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _vmem_limit(),
        )(feat, px, py)

    def _bwd_call(feat, px, py, gacc, gcorr, gt):
        # The backward's live set (forward recompute + the gradient chains
        # + the concatenated _pix_sum_many stack) is ~4x the forward's:
        # block=4 measured 171 MB VMEM on v5e (over the 128 MB capacity),
        # so the backward grids over a SMALLER block independently.
        NT = feat.shape[0]
        bb = bwd_block
        return pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid=(NT // bb,),
            in_specs=[
                pl.BlockSpec((bb, K, F), lambda i: (i, 0, 0)),
                pl.BlockSpec((bb, 1, P), lambda i: (i, 0, 0)),
                pl.BlockSpec((bb, 1, P), lambda i: (i, 0, 0)),
                pl.BlockSpec((bb, C, P), lambda i: (i, 0, 0)),
                pl.BlockSpec((bb, 1, P), lambda i: (i, 0, 0)),
                pl.BlockSpec((bb, 1, P), lambda i: (i, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((bb, K, F), lambda i: (i, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct(feat.shape, jnp.float32)],
            interpret=interpret,
            compiler_params=None if interpret else _vmem_limit(),
        )(feat, px, py, gacc, gcorr, gt)[0]

    @jax.custom_vjp
    def fused(feat, px, py):
        return tuple(_fwd_call(feat, px, py))

    def fused_fwd(feat, px, py):
        out = _fwd_call(feat, px, py)
        return tuple(out), (feat, px, py)

    def fused_bwd(res, cot):
        feat, px, py = res
        gacc, gcorr, gt = cot
        gfeat = _bwd_call(feat, px, py, gacc, gcorr, gt)
        return gfeat, jnp.zeros_like(px), jnp.zeros_like(py)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def composite_block(
    xy: jnp.ndarray,  # [NT, K, 2]
    conic: jnp.ndarray,  # [NT, K, 3]
    opac: jnp.ndarray,  # [NT, K]
    valid: jnp.ndarray,  # [NT, K] bool
    attrs: jnp.ndarray,  # [NT, K, C] linear channels
    e: jnp.ndarray,  # [NT, K, 2] depth-correction coeffs (zeros -> corr 0)
    pixf: jnp.ndarray,  # [NT, P, 2]
    alpha_clamp: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    t_min: float = 1e-4,
    block: int = 4,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused composite over blocks of tiles.

    Returns ``(accum [NT, P, C], corr [NT, P], T [NT, P])``; the depth
    channel's plane correction ``corr`` must be SUBTRACTED by the caller.
    Gradients flow to xy / conic / opac / attrs / e (not valid / pixf),
    matching XLA autodiff through the masked-dense formulation.
    """
    NT, K = xy.shape[:2]
    C = attrs.shape[-1]
    P = pixf.shape[1]
    feat = jnp.concatenate(
        [
            xy,
            conic,
            opac[..., None],
            valid.astype(jnp.float32)[..., None],
            e,
            attrs,
        ],
        axis=-1,
    )
    block = max(1, min(block, NT))
    pad = (-NT) % block
    if pad:
        feat = jnp.pad(feat, ((0, pad), (0, 0), (0, 0)))
        pixf = jnp.pad(pixf, ((0, pad), (0, 0), (0, 0)))
    fused = _make_fused(
        K, C, P, block, float(alpha_clamp), float(alpha_min), float(t_min),
        bool(interpret),
    )
    # Singleton middle dim: see _fwd_kernel's Mosaic block-shape note.
    accum, corr, T = fused(
        feat, pixf[..., 0][:, None, :], pixf[..., 1][:, None, :]
    )
    corr, T = corr[:, 0, :], T[:, 0, :]
    if pad:
        accum, corr, T = accum[:NT], corr[:NT], T[:NT]
    return accum.transpose(0, 2, 1), corr, T
