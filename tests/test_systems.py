import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from soar_tpu.avatar import init_avatar
from soar_tpu.avatar.densify import DensifyState, pad_to_capacity
from soar_tpu.avatar.optim import make_optimizer
from soar_tpu.body import make_test_body
from soar_tpu.data.cameras import CameraSampleConfig
from soar_tpu.field.attribute_field import AttributeFieldConfig
from soar_tpu.field.hashgrid import HashGridConfig
from soar_tpu.render.types import RasterConfig
from soar_tpu.train.config import OptimConfig
from soar_tpu.train.systems import DreamerConfig, make_gaussiandreamer_step

TINY_FIELD = AttributeFieldConfig(
    grid=HashGridConfig(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=8),
    hidden_dim=8,
)


def test_gaussiandreamer_loop_with_densify():
    body = make_test_body(num_joints=3, segments_per_bone=2, ring=6)
    smpl_params = {
        "betas": jnp.zeros((1, body.num_betas)),
        "body_pose": jnp.zeros((2, (body.num_joints - 1) * 3)),
        "global_orient": jnp.zeros((2, 3)),
        "transl": jnp.zeros((2, 3)),
    }
    params, model = init_avatar(
        body, smpl_params, num_subdiv=0, field_cfg=TINY_FIELD, distill_steps=0
    )
    n0 = params.xyz.shape[0]
    cap = n0 * 2
    params = pad_to_capacity(params, cap)
    dstate = DensifyState.create(cap, n0)

    cfg = DreamerConfig(
        n_views=2,
        image_size=(48, 48),
        densify_from=1,
        densify_interval=2,
        prune_from=1000,
        densify_grad_threshold=1e-9,  # force some densification
        raster=RasterConfig(
            surface=True, max_per_tile=48, dup_side=3
        ),
        cameras=CameraSampleConfig(n_view=2, camera_distance_range=(2.0, 2.5),
                                   relative_radius=False),
    )
    opt = make_optimizer(params, OptimConfig())
    opt_state = opt.init(params)

    # Mock guidance: pull renders toward gray.
    def guidance_fn(rgb, c2w, key, step):
        return jnp.mean((rgb - 0.5) ** 2)

    loss_step, maintain = make_gaussiandreamer_step(model, cfg, opt, guidance_fn)

    from soar_tpu.body.skinning import knn_idw_weights

    point_weights = knn_idw_weights(
        params.xyz, model.skin.cano_vertices, model.body.lbs_weights
    )
    key = jax.random.PRNGKey(0)
    for it in range(5):
        key, k1, k2 = jax.random.split(key, 3)
        params, opt_state, dstate, metrics = loss_step(
            params, opt_state, dstate, point_weights, k1, jnp.asarray(it)
        )
        params, dstate, point_weights = maintain(
            params, dstate, point_weights, k2, it
        )

    assert np.isfinite(float(metrics["loss"]))
    # Densification actually added points (threshold was tiny).
    assert int(dstate.alive.sum()) > n0
