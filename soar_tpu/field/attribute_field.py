"""Canonical-space neural attribute field.

Pure-pytree re-implementation of ``HashMLPSDFField``
(``geometry/sdf_fields.py:41-250``): two hash encodings (one shared by the
shs/scales/offsets/opacities heads, one for quats) feeding five 2-layer MLP
heads with the reference's exact output activations:

- shs:        sigmoid, 3 channels
- scales:     sigmoid(x) * 2e-2, 1 channel        (``sdf_fields.py:182``)
- quats:      L2-normalized, 4 channels
- offsets:    linear, zero-init last layer, takes a 2-dim latent ``z``
              (``sdf_fields.py:123-134``)
- opacities:  sigmoid, 1 channel

plus ``reset_field`` — the 1000-step Adam distillation of explicit surfel
attributes into the field (``sdf_fields.py:221-250``) — as one jitted
``lax.scan`` optimization loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .hashgrid import HashGridConfig, hash_encode, init_hash_grid, normalize_positions


@dataclasses.dataclass(frozen=True)
class AttributeFieldConfig:
    grid: HashGridConfig = HashGridConfig()
    hidden_dim: int = 64
    num_layers: int = 2


def _init_mlp(key, in_dim, hidden, out_dim, num_layers, zero_last=False):
    """Torch-style (Kaiming-uniform) init to mirror nerfstudio MLP defaults."""
    dims = [in_dim] + [hidden] * (num_layers - 1) + [out_dim]
    params = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(a)
        W = jax.random.uniform(k1, (a, b), minval=-bound, maxval=bound)
        bvec = jax.random.uniform(k2, (b,), minval=-bound, maxval=bound)
        if zero_last and i == len(dims) - 2:
            W = jnp.zeros_like(W)
            bvec = jnp.zeros_like(bvec)
        params.append({"w": W, "b": bvec})
    return params


def _apply_mlp(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def init_attribute_field(
    key: jax.Array, aabb: jnp.ndarray, cfg: AttributeFieldConfig = AttributeFieldConfig()
) -> Dict:
    keys = jax.random.split(key, 8)
    enc_dim = cfg.grid.out_dim
    h, L = cfg.hidden_dim, cfg.num_layers
    return {
        "aabb": aabb,
        "encoding": init_hash_grid(keys[0], cfg.grid),
        "quat_encoding": init_hash_grid(keys[1], cfg.grid),
        "mlp_shs": _init_mlp(keys[2], enc_dim, h, 3, L),
        "mlp_scales": _init_mlp(keys[3], enc_dim, h, 1, L),
        "mlp_quats": _init_mlp(keys[4], enc_dim, h, 4, L),
        "mlp_offsets": _init_mlp(keys[5], enc_dim + 2, h, 3, L, zero_last=True),
        "mlp_opacities": _init_mlp(keys[6], enc_dim, h, 1, L),
    }


def attribute_field_apply(
    params: Dict,
    xyz: jnp.ndarray,  # [N, 3] canonical-space positions
    z: Optional[jnp.ndarray] = None,  # [2] per-frame latent for offsets
    cfg: AttributeFieldConfig = AttributeFieldConfig(),
    is_normalized: bool = False,
    heads: Optional[Tuple[str, ...]] = None,  # None = all five
) -> Dict[str, jnp.ndarray]:
    if is_normalized:
        pos = xyz
    else:
        pos, _ = normalize_positions(xyz, params["aabb"])
    want = (
        ("shs", "scales", "quats", "offsets", "opacities")
        if heads is None
        else heads
    )
    out: Dict[str, jnp.ndarray] = {}

    x = None
    if {"shs", "scales", "offsets", "opacities"} & set(want):
        x = hash_encode(params["encoding"], pos, cfg.grid)
    if "shs" in want:
        out["shs"] = jax.nn.sigmoid(_apply_mlp(params["mlp_shs"], x))
    if "scales" in want:
        out["scales"] = (
            jax.nn.sigmoid(_apply_mlp(params["mlp_scales"], x)) * 2e-2
        )

    if "quats" in want:
        xq = hash_encode(params["quat_encoding"], pos, cfg.grid)
        quats = _apply_mlp(params["mlp_quats"], xq)
        out["quats"] = quats / jnp.maximum(
            jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12
        )

    if "offsets" in want:
        if z is None:
            zfeat = jnp.zeros(x.shape[:-1] + (2,), x.dtype)
        else:
            zfeat = jnp.broadcast_to(z, x.shape[:-1] + (2,))
        out["offsets"] = _apply_mlp(
            params["mlp_offsets"], jnp.concatenate([x, zfeat], -1)
        )
    if "opacities" in want:
        out["opacities"] = jax.nn.sigmoid(
            _apply_mlp(params["mlp_opacities"], x)
        )
    return out


def reset_field(
    params: Dict,
    xyz: jnp.ndarray,
    gt_shs: jnp.ndarray,
    gt_scales: jnp.ndarray,
    gt_quats: jnp.ndarray,
    cfg: AttributeFieldConfig = AttributeFieldConfig(),
    steps: int = 1000,
    lr: float = 1e-3,
    batch_size: Optional[int] = None,
    seed: int = 0,
) -> Tuple[Dict, jnp.ndarray]:
    """Distill explicit attributes into the field: 1000 Adam steps on
    mse(shs) + 1000*mse(scales) + mse(quats) (``sdf_fields.py:221-250``),
    run as one jitted scan (vs. a Python loop of 1000 separate CUDA launches
    in the reference).  Returns ``(params, per-step losses)``.

    Only the heads in the loss (shs/scales/quats + their encodings) enter
    the optimized carry — the offsets/opacities heads have zero gradient
    here, so evaluating them (and carrying their Adam moments) through the
    1000-step scan would be pure waste."""
    xyz = jax.lax.stop_gradient(xyz)
    gt_shs = jax.lax.stop_gradient(gt_shs)
    gt_scales = jax.lax.stop_gradient(gt_scales)
    gt_quats = jax.lax.stop_gradient(gt_quats)

    frozen = ("aabb", "mlp_offsets", "mlp_opacities")
    trainable = {k: v for k, v in params.items() if k not in frozen}
    aabb = params["aabb"]
    pos, _ = normalize_positions(xyz, aabb)

    def loss_fn(p, pos_b, shs_b, scales_b, quats_b):
        out = attribute_field_apply(
            dict(p, aabb=aabb), pos_b, cfg=cfg, is_normalized=True,
            heads=("shs", "scales", "quats"),
        )
        return (
            jnp.mean((out["shs"] - shs_b) ** 2)
            + 1000.0 * jnp.mean((out["scales"] - scales_b) ** 2)
            + jnp.mean((out["quats"] - quats_b) ** 2)
        )

    opt = optax.adam(lr)
    # ``batch_size``: SGD minibatching (uniform with replacement, one draw
    # per step).  The per-step cost is dominated by the hash-table
    # ``take``-backward scatter-add (rows ∝ points x levels), so the
    # production caller batches (measured ~1.25 s/step full-batch at 251k
    # points on v5e); None keeps the reference's full-batch semantics.
    use_batch = batch_size is not None and batch_size < pos.shape[0]

    # Bounded dispatches: ONE scan over all ``steps`` is a single device
    # program whose runtime grows past multi-minute at production scale
    # (251k points x 16 levels), and long-running programs get the TPU
    # worker killed ("UNAVAILABLE: TPU worker process crashed or
    # restarted" — the fault surfaces asynchronously on the NEXT op,
    # which made this bug land on whatever ran after init_avatar).
    # Chunking to <=50-step programs (measured ~60 s worst-case each)
    # keeps every dispatch inside the watchdog; the chunked jit compiles
    # ONCE and the carry (params + Adam state) stays on device between
    # dispatches.  When ``steps`` is not a chunk multiple the final slice
    # is PADDED to the chunk length with masked no-op steps (``live=0``
    # freezes params and Adam state), so every dispatch has the same scan
    # shape — one compile — while the optimization trajectory stays
    # exactly ``steps`` updates long.
    chunk = min(steps, 50)

    def step(carry, inputs):
        key, live = inputs
        p, state = carry
        if use_batch:
            idx = jax.random.randint(
                key, (batch_size,), 0, pos.shape[0]
            )
            args = (pos[idx], gt_shs[idx], gt_scales[idx], gt_quats[idx])
        else:
            args = (pos, gt_shs, gt_scales, gt_quats)
        loss, grads = jax.value_and_grad(loss_fn)(p, *args)
        updates, new_state = opt.update(grads, state, p)
        new_p = optax.apply_updates(p, updates)
        sel = lambda a, b: jax.tree_util.tree_map(  # noqa: E731
            lambda x, y: jnp.where(live, x, y), a, b
        )
        return (sel(new_p, p), sel(new_state, state)), loss

    @jax.jit
    def run_chunk(p, state, keys, live):
        (p, state), losses = jax.lax.scan(step, (p, state), (keys, live))
        return p, state, losses

    p, state = trainable, opt.init(trainable)
    loss_parts = []
    n_chunks = -(-steps // chunk)
    padded = n_chunks * chunk
    all_keys = jax.random.split(jax.random.PRNGKey(seed), padded)
    live_all = (jnp.arange(padded) < steps).astype(jnp.float32)
    for start in range(0, padded, chunk):
        keys = all_keys[start:start + chunk]
        p, state, losses = run_chunk(
            p, state, keys, live_all[start:start + chunk]
        )
        loss_parts.append(losses)
    losses = jnp.concatenate(loss_parts)[:steps]
    merged = dict(params)
    merged.update(p)
    return merged, losses
