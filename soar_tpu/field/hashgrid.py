"""Multiresolution hash encoding (instant-ngp) in pure XLA.

Replaces the tcnn-backed nerfstudio ``HashEncoding`` used by the reference's
attribute field (``geometry/sdf_fields.py:68-83``): 16 levels, base 16 ->
max 2048, 2^18-entry tables, 2 features/level.  On TPU this is gathers +
trilinear lerp — pure VPU work, no custom kernel needed; the gather indices
are data-dependent but shapes are static.

Hashing follows the published instant-ngp / nerfstudio scheme: per-axis prime
multipliers (1, 2654435761, 805459861) XOR-folded, modulo table size, at every
level (nerfstudio hashes all levels; table collisions at coarse levels are
benign and the trained-from-scratch field never needs tcnn bit-parity).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    num_levels: int = 16
    min_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 18
    features_per_level: int = 2
    init_scale: float = 1e-4  # tcnn-style uniform init

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    def resolutions(self) -> Tuple[int, ...]:
        if self.num_levels == 1:
            return (self.min_res,)
        growth = math.exp(
            (math.log(self.max_res) - math.log(self.min_res))
            / (self.num_levels - 1)
        )
        return tuple(
            int(math.floor(self.min_res * growth**lvl))
            for lvl in range(self.num_levels)
        )


def init_hash_grid(key: jax.Array, cfg: HashGridConfig) -> jnp.ndarray:
    """Table [num_levels, table_size, features_per_level], U(-s, s)."""
    return jax.random.uniform(
        key,
        (cfg.num_levels, cfg.table_size, cfg.features_per_level),
        minval=-cfg.init_scale,
        maxval=cfg.init_scale,
    )


_PRIMES = (1, 2654435761, 805459861)


def _hash3(ix: jnp.ndarray, iy: jnp.ndarray, iz: jnp.ndarray, mask: int):
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
        ^ iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
        ^ iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
    )
    return (h & jnp.uint32(mask)).astype(jnp.int32)


def hash_encode(
    table: jnp.ndarray, positions: jnp.ndarray, cfg: HashGridConfig
) -> jnp.ndarray:
    """Encode positions in [0, 1]^3 -> [..., num_levels * features].

    Trilinear interpolation of the 8 hashed corner features at every level.
    """
    mask = cfg.table_size - 1
    feats = []
    p = positions
    for lvl, res in enumerate(cfg.resolutions()):
        scaled = p * res
        base = jnp.floor(scaled)
        w = scaled - base
        base = base.astype(jnp.int32)

        acc = 0.0
        for corner in range(8):
            cx, cy, cz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
            idx = _hash3(
                base[..., 0] + cx, base[..., 1] + cy, base[..., 2] + cz, mask
            )
            cw = (
                (w[..., 0] if cx else 1.0 - w[..., 0])
                * (w[..., 1] if cy else 1.0 - w[..., 1])
                * (w[..., 2] if cz else 1.0 - w[..., 2])
            )
            acc = acc + table[lvl][idx] * cw[..., None]
        feats.append(acc)
    return jnp.concatenate(feats, axis=-1)


def normalize_positions(
    xyz: jnp.ndarray, aabb: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AABB-normalize to [0,1]^3 with the reference's out-of-box zeroing
    (``geometry/sdf_fields.py:167-172``): positions outside the box are
    clamped to 0 via the selector mask."""
    pos = (xyz - aabb[0]) / (aabb[1] - aabb[0])
    selector = jnp.all((pos > 0.0) & (pos < 1.0), axis=-1)
    return pos * selector[..., None], selector
