"""Adaptive densification / pruning under static shapes.

Rebuild of the 3DGS densify machinery (``geometry/surfel_base.py:884-1230``:
``add_densification_stats``, ``adaptive_densify`` clone+split,
``adaptive_prune``, ``update_states``).  NOTE the SOAR system never calls
this — the surfel count is fixed during SOAR training (SURVEY §2.1); only the
GaussianDreamer text-to-3D system drives it
(``system/gaussian_splatting.py:130-137``).

TPU redesign: torch grows/shrinks tensors (re-building the optimizer each
time); under jit we keep a static CAPACITY with an ``alive`` mask — clones
and splits are scattered into dead slots, pruning just clears ``alive``.
Everything is one jitted function; no optimizer rebuild (dead slots are
parked out of frustum with opacity logits -10, so they composite nothing and
receive no render gradient).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.transforms import quat_to_rotmat
from .state import AvatarParams


class DensifyState(NamedTuple):
    alive: jnp.ndarray  # [C] bool
    xyz_grad_accum: jnp.ndarray  # [C]
    scale_grad_accum: jnp.ndarray  # [C]
    opac_accum: jnp.ndarray  # [C]
    denom: jnp.ndarray  # [C]

    @staticmethod
    def create(capacity: int, num_alive: int) -> "DensifyState":
        alive = jnp.arange(capacity) < num_alive
        z = jnp.zeros((capacity,))
        return DensifyState(alive, z, z, z, z)


def pad_to_capacity(params: AvatarParams, capacity: int) -> AvatarParams:
    """Grow per-surfel arrays to the densification capacity (dead slots are
    parked far away with zero opacity)."""
    n = params.xyz.shape[0]
    pad = capacity - n
    if pad <= 0:
        return params

    def pad_arr(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )

    return params._replace(
        xyz=pad_arr(params.xyz, 1e6),  # parked out of frustum
        rotation=pad_arr(params.rotation).at[n:, 0].set(1.0),
        scaling=pad_arr(params.scaling, -10.0),
        opacity=pad_arr(params.opacity, -10.0),
        colors=pad_arr(params.colors),
        occ=pad_arr(params.occ, -10.0),
    )


def accumulate_stats(
    state: DensifyState,
    xyz_grads: jnp.ndarray,  # [C, 3] this step's grad w.r.t. positions
    scale_grads: jnp.ndarray,  # [C, 1]
    opacity: jnp.ndarray,  # [C, 1] current opacity logits
    visible: jnp.ndarray,  # [C] bool (radius > 0 in some view)
) -> DensifyState:
    """``add_densification_stats`` (``surfel_base.py:1113-1136``).  The
    reference accumulates screen-space (means2D) gradient norms; we
    accumulate canonical-position gradient norms — same signal up to the
    projection Jacobian scale, with the threshold tuned accordingly."""
    v = visible.astype(state.denom.dtype)
    return DensifyState(
        alive=state.alive,
        xyz_grad_accum=state.xyz_grad_accum
        + v * jnp.linalg.norm(xyz_grads, axis=-1),
        scale_grad_accum=state.scale_grad_accum + v * scale_grads[:, 0],
        opac_accum=state.opac_accum + v * opacity[:, 0],
        denom=state.denom + v,
    )


def _scatter_into_dead(params, state, src_mask, new_vals, key=None):
    """Copy attribute rows of ``src_mask`` surfels into dead slots (up to the
    number of dead slots; excess candidates are dropped, highest-priority
    first by index order)."""
    C = state.alive.shape[0]
    # Rank source candidates and dead destinations.
    src_rank = jnp.cumsum(src_mask.astype(jnp.int32)) - 1  # per-src ordinal
    dead = ~state.alive
    dead_idx = jnp.nonzero(dead, size=C, fill_value=C - 1)[0]
    n_dead = jnp.sum(dead.astype(jnp.int32))

    ok = src_mask & (src_rank < n_dead)
    dst = dead_idx[jnp.clip(src_rank, 0, C - 1)]  # destination per source

    def scatter(dst_arr, src_arr):
        return dst_arr.at[jnp.where(ok, dst, C)].set(
            jnp.where(ok[:, None] if src_arr.ndim == 2 else ok, src_arr, 0.0),
            mode="drop",
        )

    new_params = params._replace(
        xyz=scatter(params.xyz, new_vals["xyz"]),
        rotation=scatter(params.rotation, new_vals["rotation"]),
        scaling=scatter(params.scaling, new_vals["scaling"]),
        opacity=scatter(params.opacity, new_vals["opacity"]),
        colors=scatter(params.colors, new_vals["colors"]),
        occ=scatter(params.occ, new_vals["occ"]),
    )
    used = jnp.zeros((C,), bool).at[jnp.where(ok, dst, C)].set(True, mode="drop")
    return new_params, state._replace(alive=state.alive | used)


def adaptive_densify(
    params: AvatarParams,
    state: DensifyState,
    key: jax.Array,
    grad_threshold: float = 0.0001,
    extent: float = 2.0,
    percent_dense: float = 0.01,
    surface: bool = True,
) -> Tuple[AvatarParams, DensifyState]:
    """Clone small high-gradient surfels, split large ones
    (``surfel_base.py:982-1111``): clones copy attributes verbatim; splits
    sample a new position from the surfel's own covariance and shrink scale
    by 1.6 (=0.8*N, N=2)."""
    denom = jnp.maximum(state.denom, 1.0)
    grad_pos = jnp.nan_to_num(state.xyz_grad_accum / denom)
    grad_scale = jnp.nan_to_num(state.scale_grad_accum / denom)
    grad_opac = jnp.nan_to_num(state.opac_accum / denom)
    pre_mask = (grad_scale <= 1e-7) & (grad_opac <= 2.0)

    scales = jnp.exp(params.scaling[:, 0])
    high_grad = (grad_pos >= grad_threshold) & state.alive & (state.denom > 0)

    # Clone: small surfels.
    clone_mask = high_grad & (scales <= percent_dense * extent) & pre_mask
    clone_vals = {
        "xyz": params.xyz,
        "rotation": params.rotation,
        "scaling": params.scaling,
        "opacity": params.opacity,
        "colors": params.colors,
        "occ": params.occ,
    }
    params, state = _scatter_into_dead(params, state, clone_mask, clone_vals)

    # Split: large surfels -> offspring sampled in the surfel's local frame,
    # scale / 1.6; the parent is also re-scaled (the reference prunes the
    # parent and adds N=2 children; keeping the parent as one child is the
    # static-shape equivalent).
    split_mask = high_grad & (scales > percent_dense * extent)
    R = quat_to_rotmat(
        params.rotation
        / jnp.maximum(
            jnp.linalg.norm(params.rotation, axis=-1, keepdims=True), 1e-12
        )
    )
    std = jnp.exp(params.scaling[:, 0:1])
    local = jax.random.normal(key, params.xyz.shape) * std
    if surface:
        local = local.at[:, 2].set(0.0)
    offset = jnp.einsum("nij,nj->ni", R, local)
    new_scaling = params.scaling - jnp.log(1.6)
    split_vals = dict(
        clone_vals,
        xyz=params.xyz + offset,
        scaling=new_scaling,
    )
    params, state = _scatter_into_dead(params, state, split_mask, split_vals)
    params = params._replace(
        scaling=jnp.where(split_mask[:, None], new_scaling, params.scaling)
    )

    # Reset accumulators.
    z = jnp.zeros_like(state.denom)
    return params, state._replace(
        xyz_grad_accum=z, scale_grad_accum=z, opac_accum=z, denom=z
    )


def adaptive_prune(
    params: AvatarParams,
    state: DensifyState,
    min_opacity: float = 0.05,
    extent: float = 2.0,
) -> Tuple[AvatarParams, DensifyState]:
    """``adaptive_prune`` (``surfel_base.py:1068-1093``): kill low-opacity,
    extreme-scale, and never-visible surfels by clearing ``alive`` (and
    parking them out of frustum)."""
    opac = jax.nn.sigmoid(params.opacity[:, 0])
    s = jnp.exp(params.scaling[:, 0])
    prune = (
        (opac < min_opacity)
        | (s > 0.5 * extent)
        | (s * s < 1e-8 * extent**2)
        | (state.denom == 0)
    ) & state.alive
    alive = state.alive & ~prune
    params = params._replace(
        xyz=jnp.where(prune[:, None], 1e6, params.xyz),
        opacity=jnp.where(prune[:, None], -10.0, params.opacity),
    )
    return params, state._replace(alive=alive)
