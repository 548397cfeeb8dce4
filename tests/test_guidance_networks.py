"""Structural tests for the flax diffusion networks (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soar_tpu.guidance.networks import MultiViewUNet, VAEEncoder


@pytest.fixture(scope="module")
def tiny_unet():
    unet = MultiViewUNet(
        model_channels=32,
        channel_mult=(1, 2),
        num_res_blocks=1,
        attention_levels=(0, 1),
        num_head_channels=16,
        context_dim=64,
    )
    B, V = 8, 4
    x = jnp.zeros((B, 16, 16, 4))
    t = jnp.zeros((B,), jnp.int32)
    ctx = {
        "context": jnp.zeros((B, 7, 64)),
        "camera": jnp.zeros((B, 16)),
        "num_frames": V,
    }
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    return unet, _randomize_zeros(params)


def _randomize_zeros(params):
    """SD zero-inits output projections, making the init-state net a no-op;
    randomize zeros so structural tests can observe information flow."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    key = jax.random.PRNGKey(99)
    new_leaves = []
    for leaf in leaves:
        key, k = jax.random.split(key)
        zero = jnp.all(leaf == 0)
        new_leaves.append(
            jnp.where(zero, jax.random.normal(k, leaf.shape) * 0.02, leaf)
        )
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def test_unet_shapes(tiny_unet):
    unet, params = tiny_unet
    B = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 16, 16, 4))
    t = jnp.full((B,), 10, jnp.int32)
    ctx = {
        "context": jax.random.normal(jax.random.PRNGKey(2), (B, 7, 64)),
        "camera": jax.random.normal(jax.random.PRNGKey(3), (B, 16)),
        "num_frames": 4,
    }
    out = unet.apply(params, x, t, ctx)
    assert out.shape == (B, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_multiview_coupling(tiny_unet):
    """With num_frames=V, perturbing view 0 must change the output of view 1
    (joint attention across views); with num_frames=1 it must not."""
    unet, params = tiny_unet
    B = 8  # 2 groups of 4 views
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (B, 16, 16, 4))
    t = jnp.full((B,), 10, jnp.int32)

    def ctx(nf):
        return {
            "context": jnp.ones((B, 7, 64)) * 0.1,
            "camera": jnp.ones((B, 16)) * 0.1,
            "num_frames": nf,
        }

    x2 = x.at[0].add(1.0)

    out_a = unet.apply(params, x, t, ctx(4))
    out_b = unet.apply(params, x2, t, ctx(4))
    # view 1 (same group as view 0) changes:
    assert float(jnp.abs(out_a[1] - out_b[1]).max()) > 1e-6
    # view 4 (different CFG half/group) unchanged:
    np.testing.assert_allclose(out_a[4], out_b[4], atol=1e-6)

    out_c = unet.apply(params, x, t, ctx(1))
    out_d = unet.apply(params, x2, t, ctx(1))
    np.testing.assert_allclose(out_c[1], out_d[1], atol=1e-6)


def test_unet_ip_tokens_change_output(tiny_unet):
    unet, params = tiny_unet
    B = 4
    x = jax.random.normal(jax.random.PRNGKey(5), (B, 16, 16, 4))
    t = jnp.full((B,), 10, jnp.int32)
    base = {
        "context": jnp.ones((B, 7, 64)) * 0.1,
        "camera": jnp.zeros((B, 16)),
        "num_frames": 4,
    }
    with_ip = dict(base, ip=jnp.ones((B, 3, 64)))
    p2 = _randomize_zeros(unet.init(jax.random.PRNGKey(6), x, t, with_ip))
    out0 = unet.apply(p2, x, t, base)
    out1 = unet.apply(p2, x, t, with_ip)
    assert float(jnp.abs(out0 - out1).max()) > 1e-6


def test_vae_encoder_shapes():
    vae = VAEEncoder(base_channels=32, channel_mult=(1, 2, 2))
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), imgs)
    lat = vae.apply(params, imgs)  # deterministic (mode)
    assert lat.shape == (2, 8, 8, 4)
    lat2 = vae.apply(params, imgs, key=jax.random.PRNGKey(2))
    assert lat2.shape == (2, 8, 8, 4)
    assert float(jnp.abs(lat2 - lat).max()) > 0  # sampled != mode

    # gradient flows back to images (the SDS path needs encoder grads)
    g = jax.grad(lambda im: jnp.sum(vae.apply(params, im) ** 2))(imgs)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
