"""Shared tile-grid machinery for the two tile-binned rasterizers.

The surfel rasterizer (:mod:`soar_tpu.render.tiled`) and the z-buffer mesh
rasterizer (:mod:`soar_tpu.render.mesh_raster`) share one layout by design —
16x16 tiles, a static per-primitive slot grid, sort-by-packed-key binning,
``searchsorted`` range extraction, and the tile->image untile reshape — so
the primitives live here once; a fix to binning semantics (e.g. overflow
accounting or rect clamping) applies to both.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def slot_tiles(
    side: int,
    mnx: jnp.ndarray,
    mny: jnp.ndarray,
    mxx: jnp.ndarray,
    mxy: jnp.ndarray,
    ok_row: jnp.ndarray,
    ntx: int,
    NT: int,
) -> jnp.ndarray:
    """Emit each row's ``side^2`` candidate tile ids from its clamped tile
    rect [mnx, mxx) x [mny, mxy); slots outside the rect or with
    ``ok_row=False`` route to the sentinel tile ``NT`` (sorts last)."""
    dxy = jnp.arange(side, dtype=jnp.int32)
    dx = jnp.tile(dxy, side)  # [side*side]
    dy = jnp.repeat(dxy, side)
    tx = mnx[:, None] + dx[None, :]
    ty = mny[:, None] + dy[None, :]
    ok = (tx < mxx[:, None]) & (ty < mxy[:, None]) & ok_row[:, None]
    return jnp.where(ok, ty * ntx + tx, NT).astype(jnp.int32)


def tile_ranges(
    sorted_tile: jnp.ndarray, NT: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tile (start offset, count) in a tile-sorted key array — the
    ``searchsorted`` replacement for the reference's ``identifyTileRanges``
    boundary kernel."""
    boundaries = jnp.arange(NT, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, boundaries, side="left")
    ends = jnp.searchsorted(sorted_tile, boundaries, side="right")
    return starts.astype(jnp.int32), (ends - starts).astype(jnp.int32)


def depth_bits_for(NT: int) -> int:
    """Bits left for quantized depth in a uint32 (tile, depth) packed key.
    The XLA-TPU backend compiles multi-operand lexicographic sorts ~3x
    slower, so both rasterizers pack tile-id and quantized depth into ONE
    uint32 sort key."""
    tile_bits = max(int(NT + 1).bit_length(), 1)
    return 32 - tile_bits


def quantize_depth(
    depth_key: jnp.ndarray, valid: jnp.ndarray, depth_bits: int
) -> jnp.ndarray:
    """Quantize depth over the frame's valid [min, max] range into
    ``depth_bits`` bits.  Quantization ties only permute (near-)equal-depth
    primitives, which alpha compositing / z-testing is insensitive to.
    Clamps AFTER the integer cast: f32 rounds 2^db - 1 up to 2^db for
    db > 24, which would overflow the depth field into the tile bits."""
    dmin = jnp.min(jnp.where(valid, depth_key, jnp.inf))
    dmax = jnp.max(jnp.where(valid, depth_key, -jnp.inf))
    span = jnp.maximum(dmax - dmin, 1e-8)
    dq = jnp.maximum(
        (depth_key - dmin) / span * (2.0**depth_bits - 1.0), 0.0
    ).astype(jnp.uint32)
    return jnp.minimum(dq, jnp.uint32(2**depth_bits - 1))


def untile(
    img_flat: jnp.ndarray, ch: int, ntx: int, nty: int, tile: int,
    H: int, W: int,
) -> jnp.ndarray:
    """[NT, tile*tile, ch] tile-major pixels -> [H, W, ch] image."""
    img = img_flat.reshape(nty, ntx, tile, tile, ch)
    img = img.transpose(0, 2, 1, 3, 4).reshape(nty * tile, ntx * tile, ch)
    return img[:H, :W]
