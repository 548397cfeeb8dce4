"""Skinning-weight transfer and neighbor queries (pure jnp).

Replaces two CUDA dependencies of the reference:
- pytorch3d ``knn_points`` used for K=30 IDW skinning-weight blending
  (``utils/smpl.py:617-637`` ``query_weights_smpl``),
- ``simple_knn._C.distCUDA2`` (mean squared distance to the 3 nearest
  neighbors) used for initial surfel scales
  (``geometry/surfel_base.py:497-503``).

Both are one-time init costs in SOAR (the surfel set is static), so a chunked
dense distance + top-k is the right TPU shape: it is a big batched matmul-like
reduction that XLA maps well, with no irregular data structures.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def _chunked_topk_neg_dist2(
    points: jnp.ndarray, ref: jnp.ndarray, k: int, chunk: int = 4096
):
    """For each point, (negative) squared distances and indices of its k
    nearest reference points.  Chunked over points to bound memory at
    ``chunk * V`` floats."""
    n = points.shape[0]
    k = min(k, ref.shape[0])  # tiny bodies: clamp to available neighbors
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pts = pts.reshape(-1, chunk, 3)

    ref_sq = jnp.sum(ref * ref, axis=-1)  # [V]

    def body(p):
        # ||p - r||^2 = ||p||^2 - 2 p.r + ||r||^2 ; computed via one matmul.
        d2 = (
            jnp.sum(p * p, axis=-1, keepdims=True)
            - 2.0 * p @ ref.T
            + ref_sq[None, :]
        )
        neg, idx = jax.lax.top_k(-d2, k)
        return neg, idx

    neg, idx = jax.lax.map(body, pts)
    neg = neg.reshape(-1, k)[:n]
    idx = idx.reshape(-1, k)[:n]
    return neg, idx


def knn_idw_weights(
    points: jnp.ndarray,
    verts: jnp.ndarray,
    lbs_weights: jnp.ndarray,
    k: int = 30,
) -> jnp.ndarray:
    """Inverse-distance-weighted LBS-weight blend over the K nearest canonical
    vertices, matching ``utils/smpl.py:617-637`` (dist clamped to
    [1e-4, 1.0] after sqrt, weights normalized to sum 1)."""
    neg_d2, idx = _chunked_topk_neg_dist2(points, verts, k)
    dist = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
    dist = jnp.clip(dist, 1e-4, 1.0)
    w = 1.0 / dist
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neighbor_weights = lbs_weights[idx]  # [N, K, J]
    return jnp.sum(w[..., None] * neighbor_weights, axis=-2)  # [N, J]


def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Mean squared distance to the k nearest OTHER points — the
    ``distCUDA2`` contract (simple-knn; consumed at
    ``geometry/surfel_base.py:497-503`` for initial surfel scales)."""
    neg_d2, _ = _chunked_topk_neg_dist2(points, points, k + 1)
    d2 = -neg_d2[:, 1:]  # drop self (distance 0)
    return jnp.mean(d2, axis=-1)


class SkinningData(NamedTuple):
    """Precomputed canonical-pose skinning state, the pytree equivalent of
    ``SMPL_Guidance``'s buffers (``utils/smpl.py:496-527``)."""

    inv_mats: jnp.ndarray  # [J, 4, 4] inverse canonical per-joint affines
    cano_vertices: jnp.ndarray  # [V, 3] canonical-pose body vertices
    point_weights: jnp.ndarray  # [N, J] blended weights for the avatar points


def make_skinning_data(
    model_lbs_weights: jnp.ndarray,
    cano_A: jnp.ndarray,  # [J, 4, 4] canonical-pose affines from lbs()
    cano_vertices: jnp.ndarray,  # [V, 3]
    points: jnp.ndarray,  # [N, 3] avatar surfel centers (canonical space)
    k: int = 30,
) -> SkinningData:
    inv_mats = jnp.linalg.inv(cano_A)
    weights = knn_idw_weights(points, cano_vertices, model_lbs_weights, k=k)
    return SkinningData(
        inv_mats=inv_mats, cano_vertices=cano_vertices, point_weights=weights
    )


def point_skinning_mats(skin: SkinningData, live_A: jnp.ndarray) -> jnp.ndarray:
    """Per-point canonical->live 4x4 transforms:
    ``cano2live = A_live @ A_cano^-1`` blended by the precomputed per-point
    weights (``utils/smpl.py:609-614``).

    Args:
        live_A: [J, 4, 4] live-pose per-joint affines (transl baked in).
    Returns:
        [N, 4, 4] per-point rigid transforms.
    """
    cano2live = live_A @ skin.inv_mats  # [J, 4, 4]
    return jnp.einsum(
        "nj,jxy->nxy", skin.point_weights, cano2live
    )


def apply_point_mats(
    pt_mats: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """Transform points by per-point affines
    (``renderer/diff_gaussian_rasterizer.py:103-106``)."""
    return (
        jnp.einsum("nxy,ny->nx", pt_mats[..., :3, :3], points)
        + pt_mats[..., :3, 3]
    )
