"""Per-group optimizer over the avatar pytree.

Rebuilds the reference's per-group torch Adam
(``geometry/surfel_base.py:596-687``) as one ``optax.multi_transform``:
every leaf of :class:`AvatarParams` maps to a named group with its own
learning rate; ``xyz`` additionally follows the exponential log-lerp schedule
(``utils/general_utils.py:48-82``, driven per-step by
``update_learning_rate``, ``surfel_base.py:689-695``).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..train.config import OptimConfig
from .state import AvatarParams


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
):
    """Log-linear (exponential) decay with optional sin-eased warm delay —
    the Plenoxels/JaxNeRF schedule the reference uses for xyz."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            math.log(max(lr_init, 1e-32)) * (1 - t)
            + math.log(max(lr_final, 1e-32)) * t
        )
        return delay * log_lerp

    return schedule


def _field_group_labels(field: Dict) -> Dict:
    """Field sub-groups mirror the reference's parameter groups
    (``surfel_base.py:620-651``): encodings and most heads at field_lr,
    scales head x10, offsets head x0.01."""
    labels = {}
    for k in field:
        if k == "aabb":
            labels[k] = "frozen"
        elif k == "mlp_scales":
            labels[k] = jax.tree_util.tree_map(lambda _: "field_scales", field[k])
        elif k == "mlp_offsets":
            labels[k] = jax.tree_util.tree_map(lambda _: "field_offsets", field[k])
        else:
            labels[k] = jax.tree_util.tree_map(lambda _: "field", field[k])
    return labels


def make_optimizer(params: AvatarParams, cfg: OptimConfig):
    """Per-group Adam as ONE ``scale_by_adam`` + per-leaf LR scaling.

    Mathematically identical to per-group Adam instances (moments and bias
    correction are per-leaf, and every group updates every step), but it
    avoids ``optax.multi_transform`` — whose 11 masked sub-transforms over
    this pytree (two ~270 MB hash tables among the leaves) lower to a
    measured ~4 s/step XLA program on TPU vs ~30 ms for the fused form."""
    xyz_sched = expon_lr_schedule(
        lr_init=cfg.position_lr_init * cfg.spatial_lr_scale,
        lr_final=cfg.position_lr_final * cfg.spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )

    group_lrs = {
        "xyz": None,  # scheduled per step
        "color": cfg.feature_lr,
        "opacity": cfg.opacity_lr,
        "scaling": cfg.scaling_lr,
        "rotation": cfg.rotation_lr,
        "occ": cfg.occ_lr,
        "field": cfg.field_lr,
        "field_scales": cfg.field_lr * 10.0,
        "field_offsets": cfg.field_lr * 0.01,
        "latent_pose": cfg.latent_pose_lr,
        "frozen": 0.0,
    }
    labels = AvatarParams(
        xyz="xyz",
        rotation="rotation",
        scaling="scaling",
        opacity="opacity",
        colors="color",
        occ="occ",
        field=_field_group_labels(params.field),
        latent_pose="latent_pose",
    )
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=cfg.eps)

    def init(params):
        return adam.init(params)

    def update(grads, state, params=None):
        updates, state = adam.update(grads, state, params)
        xyz_lr = xyz_sched(state.count - 1)  # count was just incremented

        def scale(u, label):
            if label == "frozen":
                # exact zeros (not u * 0.0): a NaN/Inf gradient on a frozen
                # leaf must never propagate into the parameter.
                return jnp.zeros_like(u)
            lr = xyz_lr if label == "xyz" else group_lrs[label]
            return u * (-lr)

        # labels mirrors the params structure with string leaves, so plain
        # tree_map pairs each update leaf with its group name.
        updates = jax.tree_util.tree_map(scale, updates, labels)
        return updates, state

    return optax.GradientTransformation(init, update)
