"""Pallas composite kernel vs the XLA cumprod formulation (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from soar_tpu.render.composite import composite_weights, splat_alpha
from soar_tpu.render.pallas_composite import composite_tiles_pallas


def make_gathered(NT=4, K=16, tile=16, seed=0):
    rng = np.random.RandomState(seed)
    origins = (rng.randint(0, 4, (NT, 2)) * tile).astype(np.int32)
    # Means near the tile centers so splats actually cover pixels.
    xy = origins[:, None, :] + rng.uniform(0, tile, (NT, K, 2))
    conic = np.zeros((NT, K, 3), np.float32)
    conic[..., 0] = rng.uniform(0.02, 0.3, (NT, K))
    conic[..., 2] = rng.uniform(0.02, 0.3, (NT, K))
    conic[..., 1] = rng.uniform(-0.02, 0.02, (NT, K))
    opac = rng.uniform(0.2, 1.0, (NT, K)).astype(np.float32)
    colors = rng.uniform(0, 1, (NT, K, 3)).astype(np.float32)
    normals = rng.uniform(-1, 1, (NT, K, 3)).astype(np.float32)
    depths = np.sort(rng.uniform(1, 4, (NT, K)), axis=-1).astype(np.float32)
    jinv = rng.uniform(-0.5, 0.5, (NT, K, 10)).astype(np.float32)
    slot_valid = rng.rand(NT, K) > 0.1
    counts = np.full((NT,), K, np.int32)
    return (
        jnp.asarray(xy.astype(np.float32)),
        jnp.asarray(conic),
        jnp.asarray(opac),
        jnp.asarray(colors),
        jnp.asarray(normals),
        jnp.asarray(depths),
        jnp.asarray(jinv),
        jnp.asarray(slot_valid),
        jnp.asarray(counts),
        jnp.asarray(origins),
    )


def xla_reference(xy, conic, opac, colors, normals, depths, jinv, slot_valid,
                  counts, origins, tile=16):
    NT, K = xy.shape[:2]
    lx = jnp.tile(jnp.arange(tile, dtype=jnp.float32), tile)
    ly = jnp.repeat(jnp.arange(tile, dtype=jnp.float32), tile)
    pixf = jnp.stack(
        [origins[:, None, 0] + lx[None], origins[:, None, 1] + ly[None]], -1
    )
    d = xy[:, None, :, :] - pixf[:, :, None, :]
    k_ar = jnp.arange(K)
    valid = slot_valid & (k_ar[None, :] < counts[:, None])
    alpha = splat_alpha(d, conic[:, None], opac[:, None], valid[:, None])
    weights, t_final = composite_weights(alpha)
    du0 = d[..., 0] * jinv[:, None, :, 0] + d[..., 1] * jinv[:, None, :, 1]
    du1 = d[..., 0] * jinv[:, None, :, 2] + d[..., 1] * jinv[:, None, :, 3]
    depth_k = depths[:, None, :] - (
        du0 * jinv[:, None, :, 6] + du1 * jinv[:, None, :, 9]
    )
    color = jnp.einsum("npk,nkc->npc", weights, colors)
    normal = jnp.einsum("npk,nkc->npc", weights, normals)
    depth = jnp.sum(weights * depth_k, -1)
    return color, normal, depth, t_final


def test_pallas_matches_xla_composite():
    data = make_gathered()
    ref = xla_reference(*data)
    got = composite_tiles_pallas(*data, tile=16, interpret=True)
    for g, r, name in zip(got, ref, ("color", "normal", "depth", "T")):
        np.testing.assert_allclose(g, r, atol=1e-4, err_msg=name)


def test_pallas_early_stop_is_sticky():
    """A splat that would push T below t_min ends the pixel PERMANENTLY
    (``forward.cu:548-552`` done=true): a later low-alpha splat must not
    re-pass the transmittance test.  Crafted stack: several near-opaque
    splats drive T to ~1e-4-adjacent, then a violator, then a weak splat
    that would pass a non-sticky test."""
    NT, K, tile = 1, 8, 16
    origins = np.zeros((1, 2), np.int32)
    xy = np.full((NT, K, 2), tile / 2.0, np.float32)  # all centered
    conic = np.zeros((NT, K, 3), np.float32)
    conic[..., 0] = conic[..., 2] = 1e-4  # ~flat over the tile
    # T walk: 1 -> 0.01 (alpha clamped 0.99) -> 0.005 -> VIOLATE (0.005 *
    # 0.01 = 5e-5 < 1e-4, done) -> the 0.5 splat behind it would give
    # test_T = 2.5e-3 >= t_min and re-pass a NON-sticky test with weight
    # ~2.5e-3 (>> atol); sticky semantics composite nothing after the
    # violator.
    opac = np.array(
        [[0.999, 0.5, 0.999, 0.5, 0.3, 0.2, 0.1, 0.05]], np.float32
    )
    colors = np.ones((NT, K, 3), np.float32)
    normals = np.ones((NT, K, 3), np.float32)
    depths = np.arange(1, K + 1, dtype=np.float32)[None].repeat(NT, 0)
    jinv = np.zeros((NT, K, 10), np.float32)
    slot_valid = np.ones((NT, K), bool)
    counts = np.full((NT,), K, np.int32)
    data = tuple(
        jnp.asarray(a)
        for a in (xy, conic, opac, colors, normals, depths, jinv,
                  slot_valid, counts, origins)
    )
    ref = xla_reference(*data)
    got = composite_tiles_pallas(*data, tile=16, interpret=True)
    for g, r, name in zip(got, ref, ("color", "normal", "depth", "T")):
        np.testing.assert_allclose(g, r, atol=1e-6, err_msg=name)


def test_pallas_respects_counts():
    data = list(make_gathered(seed=1))
    data[8] = jnp.asarray([3, 0, 16, 16], jnp.int32)  # per-tile counts
    ref = xla_reference(*data)
    got = composite_tiles_pallas(*data, tile=16, interpret=True)
    for g, r, name in zip(got, ref, ("color", "normal", "depth", "T")):
        np.testing.assert_allclose(g, r, atol=1e-4, err_msg=name)
