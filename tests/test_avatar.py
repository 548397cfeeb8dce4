import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soar_tpu.avatar import (
    AvatarModel,
    AvatarParams,
    RenderSettings,
    init_avatar,
    render_view,
)
from soar_tpu.avatar import state as S
from soar_tpu.body import make_test_body
from soar_tpu.core.camera import camera_from_c2w, look_at_c2w
from soar_tpu.field.attribute_field import AttributeFieldConfig
from soar_tpu.field.hashgrid import HashGridConfig
from soar_tpu.render.types import RasterConfig

TINY_FIELD = AttributeFieldConfig(
    grid=HashGridConfig(num_levels=4, min_res=4, max_res=64, log2_hashmap_size=12),
    hidden_dim=16,
)


@pytest.fixture(scope="module")
def avatar():
    body = make_test_body(num_joints=4, segments_per_bone=3, ring=8)
    F = 3
    rng = np.random.RandomState(0)
    smpl_params = {
        "betas": jnp.zeros((1, body.num_betas)),
        "body_pose": jnp.asarray(
            rng.randn(F, (body.num_joints - 1) * 3).astype(np.float32) * 0.1
        ),
        "global_orient": jnp.asarray(rng.randn(F, 3).astype(np.float32) * 0.1),
        "transl": jnp.asarray(
            np.tile([[0.0, 0.2, 0.0]], (F, 1)).astype(np.float32)
        ),
    }
    params, model = init_avatar(
        body, smpl_params, num_subdiv=1, field_cfg=TINY_FIELD, distill_steps=50
    )
    return params, model


def make_cam(center_y=0.8, dist=2.5):
    c2w = look_at_c2w(
        jnp.array([0.3, center_y, dist]),
        jnp.array([0.0, center_y, 0.0]),
        jnp.array([0.0, 1.0, 0.0]),
    )
    fov = jnp.asarray(np.deg2rad(45.0))
    return camera_from_c2w(c2w, fov, fov)


def test_init_avatar_shapes(avatar):
    params, model = avatar
    N = params.xyz.shape[0]
    assert params.rotation.shape == (N, 4)
    assert params.scaling.shape == (N, 1)
    assert model.skin.point_weights.shape == (N, model.body.num_joints)
    np.testing.assert_allclose(
        np.asarray(model.skin.point_weights).sum(-1), 1.0, atol=1e-4
    )
    # occ initialized to sigmoid^-1(1e-2)
    np.testing.assert_allclose(np.asarray(S.get_occ(params)), 1e-2, atol=1e-5)


def test_render_view_gt(avatar):
    params, model = avatar
    cam = make_cam()
    settings = RenderSettings(
        use_explicit=True,
        raster=RasterConfig(max_per_tile=64, dup_side=3),
    )
    out = render_view(
        params, model, cam, (64, 64), jnp.ones(3), jnp.array(0), settings
    )
    assert out["render"].shape == (64, 64, 3)
    assert out["mask"].shape == (64, 64)
    assert out["occ"].shape == (64, 64, 3)
    # The avatar is visible: some pixels covered.
    assert float(out["mask"].max()) > 0.5
    assert np.isfinite(np.asarray(out["render"])).all()
    assert np.isfinite(np.asarray(out["curv"])).all()
    assert np.isfinite(np.asarray(out["pred_normal"])).all()


def test_render_view_gen_permuted(avatar):
    """Gen views permute axes +z,+x,+y: the chain body (along +y) appears
    along +z in world, so a camera on +x sees it upright in its frame."""
    params, model = avatar
    c2w = look_at_c2w(
        jnp.array([2.5, 0.0, 0.5]),
        jnp.array([0.0, 0.0, 0.5]),
        jnp.array([0.0, 0.0, 1.0]),
    )
    fov = jnp.asarray(np.deg2rad(45.0))
    cam = camera_from_c2w(c2w, fov, fov)
    settings = RenderSettings(
        use_explicit=True,
        gen_view=True,
        raster=RasterConfig(max_per_tile=64, dup_side=3),
    )
    out = render_view(
        params, model, cam, (64, 64), jnp.zeros(3), jnp.array(1), settings
    )
    assert float(out["mask"].max()) > 0.5


def test_gradients_flow_through_everything(avatar):
    params, model = avatar
    cam = make_cam()
    settings = RenderSettings(
        use_explicit=False,
        raster=RasterConfig(max_per_tile=48, dup_side=3),
    )
    target = jnp.zeros((48, 48, 3))

    def loss_fn(p):
        out = render_view(
            p, model, cam, (48, 48), jnp.ones(3), jnp.array(0), settings
        )
        return (
            jnp.mean((out["render"] - target) ** 2)
            + jnp.mean(out["mask"])
            + jnp.mean(out["occ"])
        )

    grads = jax.grad(loss_fn)(params)
    # xyz, rotation, field tables, occ all receive gradient.
    assert float(jnp.abs(grads.xyz).max()) > 0
    assert float(jnp.abs(grads.rotation).max()) > 0
    assert float(jnp.abs(grads.occ).max()) > 0
    assert float(jnp.abs(grads.field["encoding"]).max()) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_explicit_fit_improves_color(avatar):
    """Mini end-to-end: fit explicit colors to a solid red target."""
    import optax

    params, model = avatar
    cam = make_cam()
    settings = RenderSettings(
        use_explicit=True,
        raster=RasterConfig(max_per_tile=48, dup_side=3),
    )
    target = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (48, 48, 3))

    opt = optax.adam(0.1)

    def loss_fn(colors):
        p = params._replace(colors=colors)
        out = render_view(
            p, model, cam, (48, 48), jnp.array([1.0, 0.0, 0.0]), jnp.array(0), settings
        )
        return jnp.mean((out["render"] - target) ** 2)

    @jax.jit
    def step(colors, opt_state):
        l, g = jax.value_and_grad(loss_fn)(colors)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(colors, updates), opt_state, l

    colors = params.colors
    opt_state = opt.init(colors)
    l0 = None
    for i in range(30):
        colors, opt_state, l = step(colors, opt_state)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0 * 0.3, (l0, float(l))
