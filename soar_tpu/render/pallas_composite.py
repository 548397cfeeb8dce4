"""Pallas TPU kernel for the per-tile alpha-compositing loop.

The production rasterizer's only sequential-in-depth stage.  The XLA
formulation (:mod:`soar_tpu.render.composite`) is a dense
[tiles, pixels, K] cumulative product — fully vectorized but it always pays
for all K capacity slots.  This kernel walks each tile's ACTUAL splat list
(count-bounded ``while_loop``) and stops as soon as every pixel of the tile
saturates (transmittance < 1e-4) — the same early-exit the CUDA kernel gets
from its per-block ``__syncthreads_count`` vote
(``cuda_rasterizer/forward.cu:472-552``).

Per grid step (one 16x16 tile): splat attributes live in VMEM blocks, the
16x16 pixel state rides the ``while_loop`` carry as 2-D VPU registers.

Gradients: callers keep using the XLA cumprod path for backward (one
implementation of the backward math instead of the reference's hand-written
1000-line ``backward.cu``).

MEASURED VERDICT (v5e, 1024 tiles x K=96): this kernel runs ~185 ms vs
~17 ms for the dense XLA cumprod composite.  The depth loop is inherently
sequential, each iteration issues ~20 scalar VMEM loads for one splat while
the (16,16) pixel registers underfill the (8,128) VPU, and the Pallas grid
serializes tiles on the single TensorCore — whereas XLA's dense
[tiles, pixels, K] formulation keeps the VPU saturated and simply eats the
masked capacity slots.  The dense XLA path therefore REMAINS the production
composite; this kernel is kept (with its parity test) as the measured
baseline for future per-tile-loop experiments (e.g. 8-splat batched folds).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(tile, alpha_clamp, alpha_min, t_min, perpix_depth):
    def kernel(
        counts_ref,  # scalar-prefetch [NT]
        origins_ref,  # scalar-prefetch [NT, 2]
        xy_ref,  # [1, K, 2]
        conic_ref,  # [1, K, 4] (a, b, c, opacity)
        color_ref,  # [1, K, 3]
        normal_ref,  # [1, K, 3]
        depth_ref,  # [1, K, 1]
        jinv_ref,  # [1, K, 6]
        color_out,  # [1, 3, tile, tile]
        normal_out,  # [1, 3, tile, tile]
        depth_out,  # [1, 1, tile, tile]
        opac_out,  # [1, 1, tile, tile]
    ):
        g = pl.program_id(0)
        count = counts_ref[g]
        ox = origins_ref[g, 0].astype(jnp.float32)
        oy = origins_ref[g, 1].astype(jnp.float32)
        pxf = ox + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1).astype(
            jnp.float32
        )
        pyf = oy + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0).astype(
            jnp.float32
        )

        def cond(state):
            k, done, *_ = state
            return jnp.logical_and(k < count, jnp.any(jnp.logical_not(done)))

        def body(state):
            k, done, T, Cr, Cg, Cb, Nx, Ny, Nz, D = state
            dx = xy_ref[0, k, 0] - pxf
            dy = xy_ref[0, k, 1] - pyf
            a = conic_ref[0, k, 0]
            b = conic_ref[0, k, 1]
            c = conic_ref[0, k, 2]
            op = conic_ref[0, k, 3]
            power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
            alpha = jnp.minimum(
                alpha_clamp, op * jnp.exp(jnp.minimum(power, 0.0))
            )
            alpha = jnp.where((power <= 0.0) & (alpha >= alpha_min), alpha, 0.0)
            test_T = T * (1.0 - alpha)
            # STICKY per-pixel early stop (``forward.cu:548-552`` done=true):
            # the first splat that would push T below t_min contributes
            # nothing, and neither does ANY splat behind it — a later
            # low-alpha splat must not re-pass the test (matches the
            # cumsum-exclusion in composite.composite_weights).
            ok = (test_T >= t_min) & jnp.logical_not(done)
            done = done | (test_T < t_min)
            alpha = jnp.where(ok, alpha, 0.0)
            w = alpha * T

            if perpix_depth:
                du0 = dx * jinv_ref[0, k, 0] + dy * jinv_ref[0, k, 1]
                du1 = dx * jinv_ref[0, k, 2] + dy * jinv_ref[0, k, 3]
                d_px = depth_ref[0, k, 0] - (
                    du0 * jinv_ref[0, k, 4] + du1 * jinv_ref[0, k, 5]
                )
            else:
                d_px = depth_ref[0, k, 0]

            Cr = Cr + w * color_ref[0, k, 0]
            Cg = Cg + w * color_ref[0, k, 1]
            Cb = Cb + w * color_ref[0, k, 2]
            Nx = Nx + w * normal_ref[0, k, 0]
            Ny = Ny + w * normal_ref[0, k, 1]
            Nz = Nz + w * normal_ref[0, k, 2]
            D = D + w * d_px
            T = jnp.where(ok, test_T, T)
            return k + 1, done, T, Cr, Cg, Cb, Nx, Ny, Nz, D

        z = jnp.zeros((tile, tile), jnp.float32)
        T0 = jnp.ones((tile, tile), jnp.float32)
        done0 = jnp.zeros((tile, tile), jnp.bool_)
        _, _, T, Cr, Cg, Cb, Nx, Ny, Nz, D = jax.lax.while_loop(
            cond, body, (jnp.int32(0), done0, T0, z, z, z, z, z, z, z)
        )
        color_out[0, 0] = Cr
        color_out[0, 1] = Cg
        color_out[0, 2] = Cb
        normal_out[0, 0] = Nx
        normal_out[0, 1] = Ny
        normal_out[0, 2] = Nz
        depth_out[0, 0] = D
        opac_out[0, 0] = 1.0 - T

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "tile", "alpha_clamp", "alpha_min", "t_min", "perpix_depth", "interpret"
    ),
)
def composite_tiles_pallas(
    xy: jnp.ndarray,  # [NT, K, 2]
    conic: jnp.ndarray,  # [NT, K, 3]
    opac: jnp.ndarray,  # [NT, K]
    colors: jnp.ndarray,  # [NT, K, 3]
    normals: jnp.ndarray,  # [NT, K, 3]
    depths: jnp.ndarray,  # [NT, K]
    jinv: jnp.ndarray,  # [NT, K, 10]
    slot_valid: jnp.ndarray,  # [NT, K] bool
    counts: jnp.ndarray,  # [NT]
    tile_origins: jnp.ndarray,  # [NT, 2] (x, y) pixel origins
    tile: int = 16,
    alpha_clamp: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    t_min: float = 1e-4,
    perpix_depth: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (accum_color [NT,P,3], accum_normal [NT,P,3],
    accum_depth [NT,P], T [NT,P]); bg compositing / depth normalization stay
    with the caller (matches ``composite.finalize`` inputs)."""
    NT, K = xy.shape[:2]
    op = jnp.where(slot_valid, opac, 0.0)
    conic_opac = jnp.concatenate([conic, op[..., None]], axis=-1)
    jinv6 = jnp.stack(
        [jinv[..., 0], jinv[..., 1], jinv[..., 2], jinv[..., 3],
         jinv[..., 6], jinv[..., 9]],
        axis=-1,
    )
    counts_c = jnp.minimum(counts, K).astype(jnp.int32)

    kernel = _make_kernel(tile, alpha_clamp, alpha_min, t_min, perpix_depth)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, K, 2), lambda g, c, o: (g, 0, 0)),
            pl.BlockSpec((1, K, 4), lambda g, c, o: (g, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda g, c, o: (g, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda g, c, o: (g, 0, 0)),
            pl.BlockSpec((1, K, 1), lambda g, c, o: (g, 0, 0)),
            pl.BlockSpec((1, K, 6), lambda g, c, o: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, tile, tile), lambda g, c, o: (g, 0, 0, 0)),
            pl.BlockSpec((1, 3, tile, tile), lambda g, c, o: (g, 0, 0, 0)),
            pl.BlockSpec((1, 1, tile, tile), lambda g, c, o: (g, 0, 0, 0)),
            pl.BlockSpec((1, 1, tile, tile), lambda g, c, o: (g, 0, 0, 0)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((NT, 3, tile, tile), jnp.float32),
        jax.ShapeDtypeStruct((NT, 3, tile, tile), jnp.float32),
        jax.ShapeDtypeStruct((NT, 1, tile, tile), jnp.float32),
        jax.ShapeDtypeStruct((NT, 1, tile, tile), jnp.float32),
    ]
    color, normal, depth, opac_img = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(counts_c, tile_origins.astype(jnp.int32), xy, conic_opac, colors,
      normals, depths[..., None], jinv6)

    P = tile * tile

    def to_pix(img, ch):  # [NT, ch, t, t] -> [NT, P, ch]
        return img.reshape(NT, ch, P).transpose(0, 2, 1)

    return (
        to_pix(color, 3),
        to_pix(normal, 3),
        to_pix(depth, 1)[..., 0],
        1.0 - to_pix(opac_img, 1)[..., 0],
    )
