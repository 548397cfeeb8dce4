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
    xyz_sched = expon_lr_schedule(
        lr_init=cfg.position_lr_init * cfg.spatial_lr_scale,
        lr_final=cfg.position_lr_final * cfg.spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=cfg.eps)

    transforms = {
        "xyz": optax.adam(xyz_sched, eps=cfg.eps),
        "color": adam(cfg.feature_lr),
        "opacity": adam(cfg.opacity_lr),
        "scaling": adam(cfg.scaling_lr),
        "rotation": adam(cfg.rotation_lr),
        "occ": adam(cfg.occ_lr),
        "field": adam(cfg.field_lr),
        "field_scales": adam(cfg.field_lr * 10.0),
        "field_offsets": adam(cfg.field_lr * 0.01),
        "latent_pose": adam(cfg.latent_pose_lr),
        "frozen": optax.set_to_zero(),
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
    return optax.multi_transform(transforms, labels)
