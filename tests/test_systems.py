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
    # Visibility gating: dead (parked out-of-frustum) slots never saw a view,
    # so their denom stays 0 after the steps since the last densify reset.
    assert float(jnp.max(jnp.where(dstate.alive, 0.0, dstate.denom))) == 0.0


def _tiny_avatar(cap_mult: int = 0):
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
    return params, model


def _front_camera():
    from soar_tpu.core.camera import camera_from_c2w
    from soar_tpu.data.cameras import sample_multiview_cameras

    cfg = CameraSampleConfig(
        n_view=1, camera_distance_range=(2.0, 2.0), relative_radius=False
    )
    c2w, fovy = sample_multiview_cameras(jax.random.PRNGKey(3), cfg)
    return camera_from_c2w(c2w[0], fovy[0], fovy[0], znear=0.1, zfar=100.0)


def test_dreamer_opacity_receives_render_gradient():
    """force_opaque=False (the 3DGS/GaussianDreamer mode) must flow render
    gradients into the opacity logits; the SOAR surfel mode (opacity forced
    to 1, ``diff_gaussian_rasterizer.py:259``) must not."""
    from soar_tpu.avatar import RenderSettings, render_view

    params, model = _tiny_avatar()
    cam = _front_camera()
    raster = RasterConfig(surface=False, perpix_depth=False,
                          max_per_tile=48, dup_side=3)

    def render_loss(opacity, force_opaque):
        p = params._replace(opacity=opacity)
        out = render_view(
            p, model, cam, (32, 32), jnp.zeros(3), jnp.asarray(0),
            RenderSettings(use_explicit=True, gen_view=True,
                           force_opaque=force_opaque, raster=raster),
        )
        return jnp.sum(out["render"] ** 2)

    g_3dgs = jax.grad(lambda o: render_loss(o, False))(params.opacity)
    g_soar = jax.grad(lambda o: render_loss(o, True))(params.opacity)
    assert float(jnp.max(jnp.abs(g_3dgs))) > 0.0
    assert float(jnp.max(jnp.abs(g_soar))) == 0.0


def test_render_view_visible_mask():
    """The per-surfel ``visible`` output is the preprocess culling survival:
    True for on-screen surfels, False for parked/out-of-frustum ones."""
    from soar_tpu.avatar import RenderSettings, render_view

    from soar_tpu.body.skinning import knn_idw_weights

    params, model = _tiny_avatar()
    n = params.xyz.shape[0]
    params = pad_to_capacity(params, n + 4)  # 4 dead slots parked at 1e6
    pw = knn_idw_weights(
        params.xyz, model.skin.cano_vertices, model.body.lbs_weights
    )
    model = dataclasses.replace(
        model, skin=model.skin._replace(point_weights=pw)
    )
    cam = _front_camera()
    out = render_view(
        params, model, cam, (32, 32), jnp.zeros(3), jnp.asarray(0),
        RenderSettings(
            use_explicit=True, gen_view=True,
            raster=RasterConfig(surface=False, perpix_depth=False,
                                max_per_tile=48, dup_side=3),
        ),
    )
    vis = np.asarray(out["visible"])
    assert vis.shape == (n + 4,)
    assert not vis[n:].any()  # parked slots culled
    assert vis[:n].any()  # the body is on screen


def test_gen_camera_config_wires_every_field():
    """Every camera-sampling knob on TrainConfig must reach the
    CameraSampleConfig the trainer draws gen views from (regression for the
    silently-dropped relative_radius)."""
    import dataclasses as dc

    from soar_tpu.train.config import TrainConfig
    from soar_tpu.train.trainer import gen_camera_config

    cfg = TrainConfig(
        elevation_range=(-5.0, 5.0),
        azimuth_range=(-90.0, 90.0),
        fovy_range=(20.0, 25.0),
        camera_distance_range=(1.5, 1.7),
        zoom_range=(0.9, 1.1),
        relative_radius=False,
    )
    cam = gen_camera_config(cfg, nv=3)
    assert cam.n_view == 3
    train_fields = {f.name for f in dc.fields(TrainConfig)}
    for f in dc.fields(CameraSampleConfig):
        if f.name == "n_view":
            continue
        assert f.name in train_fields, f"TrainConfig lacks {f.name}"
        assert getattr(cam, f.name) == getattr(cfg, f.name), f.name
