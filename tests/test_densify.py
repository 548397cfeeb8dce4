import jax
import jax.numpy as jnp
import numpy as np

from soar_tpu.avatar.densify import (
    DensifyState,
    accumulate_stats,
    adaptive_densify,
    adaptive_prune,
    pad_to_capacity,
)
from soar_tpu.avatar.state import AvatarParams


def _params(n, cap):
    p = AvatarParams(
        xyz=jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3) * 0.01,
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
        scaling=jnp.full((n, 1), -4.0),
        opacity=jnp.full((n, 1), 2.0),
        colors=jnp.zeros((n, 3)),
        occ=jnp.zeros((n, 1)),
        field={},
        latent_pose=jnp.zeros((1, 2)),
    )
    return pad_to_capacity(p, cap), DensifyState.create(cap, n)


def test_pad_and_alive():
    params, state = _params(4, 10)
    assert params.xyz.shape == (10, 3)
    assert int(state.alive.sum()) == 4
    assert float(params.xyz[5, 0]) == 1e6  # parked


def test_clone_into_dead_slots():
    params, state = _params(4, 10)
    # Give surfels 0 and 2 high positional gradients; small scales -> clone.
    grads = jnp.zeros((10, 3)).at[0].set(1.0).at[2].set(1.0)
    state = accumulate_stats(
        state, grads, jnp.zeros((10, 1)), params.opacity * 0, jnp.arange(10) < 4
    )
    p2, s2 = adaptive_densify(
        params, state, jax.random.PRNGKey(0), grad_threshold=0.5, extent=100.0
    )
    assert int(s2.alive.sum()) == 6  # 2 clones appended
    # Clones carry the source position.
    np.testing.assert_allclose(p2.xyz[4], params.xyz[0], atol=1e-6)
    np.testing.assert_allclose(p2.xyz[5], params.xyz[2], atol=1e-6)


def test_split_large_surfels():
    params, state = _params(4, 10)
    params = params._replace(
        scaling=params.scaling.at[1, 0].set(jnp.log(0.5))
    )  # big surfel
    grads = jnp.zeros((10, 3)).at[1].set(1.0)
    state = accumulate_stats(
        state, grads, jnp.zeros((10, 1)), params.opacity * 0, jnp.arange(10) < 4
    )
    p2, s2 = adaptive_densify(
        params, state, jax.random.PRNGKey(0), grad_threshold=0.5,
        extent=1.0, percent_dense=0.01,
    )
    assert int(s2.alive.sum()) == 5  # one child added
    # Parent scale shrank by 1.6.
    np.testing.assert_allclose(
        float(jnp.exp(p2.scaling[1, 0])), 0.5 / 1.6, rtol=1e-5
    )


def test_prune_low_opacity_and_invisible():
    params, state = _params(6, 10)
    params = params._replace(opacity=params.opacity.at[3, 0].set(-10.0))
    # Mark everyone visible except index 5.
    state = accumulate_stats(
        state,
        jnp.zeros((10, 3)),
        jnp.zeros((10, 1)),
        params.opacity * 0,
        (jnp.arange(10) < 6) & (jnp.arange(10) != 5),
    )
    p2, s2 = adaptive_prune(params, state, min_opacity=0.05)
    alive = np.asarray(s2.alive)
    assert not alive[3]  # low opacity pruned
    assert not alive[5]  # never visible pruned
    assert alive[[0, 1, 2, 4]].all()
