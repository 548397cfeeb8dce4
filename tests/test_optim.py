"""Fused per-group Adam must match explicit per-group optax.adam instances.

The production optimizer (``avatar/optim.py``) fuses the reference's
per-group torch Adam (``surfel_base.py:596-687``) into one ``scale_by_adam``
with per-leaf LR scaling.  Moments and bias correction are per-leaf, so the
fusion is exact; this test pins that equivalence leaf group by leaf group.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from soar_tpu.avatar import init_avatar
from soar_tpu.avatar.optim import expon_lr_schedule, make_optimizer
from soar_tpu.body import make_test_body
from soar_tpu.field.attribute_field import AttributeFieldConfig
from soar_tpu.field.hashgrid import HashGridConfig
from soar_tpu.train.config import OptimConfig


@pytest.fixture(scope="module")
def tiny_params():
    body = make_test_body(num_joints=3, segments_per_bone=2, ring=6)
    sp = {
        "betas": jnp.zeros((1, body.num_betas)),
        "body_pose": jnp.zeros((2, (body.num_joints - 1) * 3)),
        "global_orient": jnp.zeros((2, 3)),
        "transl": jnp.zeros((2, 3)),
    }
    fc = AttributeFieldConfig(
        grid=HashGridConfig(
            num_levels=2, min_res=4, max_res=8, log2_hashmap_size=6
        ),
        hidden_dim=8,
    )
    params, _ = init_avatar(
        body, sp, num_subdiv=0, field_cfg=fc, distill_steps=0
    )
    return params


def _fake_grads(params, seed):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(seed)
    glv = [
        jnp.asarray(rng.randn(*l.shape).astype(np.float32) * 0.1).astype(
            l.dtype
        )
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, glv)


def test_fused_matches_per_group_adam(tiny_params):
    cfg = OptimConfig()
    opt = make_optimizer(tiny_params, cfg)
    state = opt.init(tiny_params)
    p_fused = tiny_params

    # Explicit reference: one optax.adam per simple group, applied leafwise.
    xyz_sched = expon_lr_schedule(
        lr_init=cfg.position_lr_init * cfg.spatial_lr_scale,
        lr_final=cfg.position_lr_final * cfg.spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )
    group_of = {
        "xyz": xyz_sched,
        "rotation": cfg.rotation_lr,
        "scaling": cfg.scaling_lr,
        "opacity": cfg.opacity_lr,
        "colors": cfg.feature_lr,
        "occ": cfg.occ_lr,
        "latent_pose": cfg.latent_pose_lr,
    }
    ref_opts, ref_states, ref_params = {}, {}, {}
    for name, lr in group_of.items():
        ref_opts[name] = optax.adam(lr, b1=0.9, b2=0.999, eps=cfg.eps)
        leaf = getattr(tiny_params, name)
        ref_states[name] = ref_opts[name].init(leaf)
        ref_params[name] = leaf

    for step in range(3):
        grads = _fake_grads(p_fused, seed=step)
        updates, state = opt.update(grads, state, p_fused)
        p_fused = optax.apply_updates(p_fused, updates)
        for name in group_of:
            g = getattr(grads, name)
            u, ref_states[name] = ref_opts[name].update(
                g, ref_states[name], ref_params[name]
            )
            ref_params[name] = optax.apply_updates(ref_params[name], u)

    for name in group_of:
        np.testing.assert_allclose(
            np.asarray(getattr(p_fused, name)),
            np.asarray(ref_params[name]),
            rtol=2e-5,
            atol=2e-7,
            err_msg=f"group {name} diverged from per-group adam",
        )


def test_field_subgroup_lrs(tiny_params):
    """scales head updates 10x faster, offsets head 100x slower, than the
    base field LR (``surfel_base.py:620-651``)."""
    cfg = OptimConfig()
    opt = make_optimizer(tiny_params, cfg)
    state = opt.init(tiny_params)
    grads = jax.tree_util.tree_map(jnp.ones_like, tiny_params)
    updates, _ = opt.update(grads, state, tiny_params)

    fu = updates.field

    def first_leaf_mag(tree):
        return float(jnp.abs(jax.tree_util.tree_leaves(tree)[0]).max())

    base = first_leaf_mag({k: v for k, v in fu.items()
                           if k not in ("mlp_scales", "mlp_offsets", "aabb")})
    assert first_leaf_mag(fu["mlp_scales"]) == pytest.approx(base * 10.0, rel=1e-4)
    assert first_leaf_mag(fu["mlp_offsets"]) == pytest.approx(base * 0.01, rel=1e-4)
    # aabb frozen
    assert float(jnp.abs(fu["aabb"]).max()) == 0.0
