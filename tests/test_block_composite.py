"""Blocked Pallas composite (fwd + hand-derived bwd) vs the XLA cumprod
formulation — interpret mode on CPU; the same kernels compile natively on
TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soar_tpu.render.block_composite import composite_block
from soar_tpu.render.composite import composite_weights, splat_alpha


def _has_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def make_scene(NT=6, K=24, tile=16, C=7, seed=0, saturate=False):
    rng = np.random.RandomState(seed)
    origins = (rng.randint(0, 4, (NT, 2)) * tile).astype(np.float32)
    xy = origins[:, None, :] + rng.uniform(0, tile, (NT, K, 2))
    conic = np.zeros((NT, K, 3), np.float32)
    conic[..., 0] = rng.uniform(0.02, 0.3, (NT, K))
    conic[..., 2] = rng.uniform(0.02, 0.3, (NT, K))
    conic[..., 1] = rng.uniform(-0.02, 0.02, (NT, K))
    if saturate:
        opac = rng.uniform(0.9, 1.0, (NT, K)).astype(np.float32)
    else:
        opac = rng.uniform(0.2, 0.9, (NT, K)).astype(np.float32)
    attrs = rng.uniform(-1, 1, (NT, K, C)).astype(np.float32)
    e = rng.uniform(-0.3, 0.3, (NT, K, 2)).astype(np.float32)
    valid = rng.rand(NT, K) > 0.15
    lx = np.tile(np.arange(tile, dtype=np.float32), tile)
    ly = np.repeat(np.arange(tile, dtype=np.float32), tile)
    pixf = np.stack(
        [origins[:, None, 0] + lx[None], origins[:, None, 1] + ly[None]], -1
    ).astype(np.float32)
    return tuple(
        jnp.asarray(a)
        for a in (xy.astype(np.float32), conic, opac, valid, attrs, e, pixf)
    )


def xla_composite(xy, conic, opac, valid, attrs, e, pixf):
    """Reference: the production XLA chain at the [NT, P, K] level."""
    d = xy[:, None, :, :] - pixf[:, :, None, :]
    alpha = splat_alpha(d, conic[:, None], opac[:, None], valid[:, None])
    weights, t_final = composite_weights(alpha)
    accum = jnp.einsum("npk,nkc->npc", weights, attrs)
    corr = jnp.sum(
        weights
        * (d[..., 0] * e[:, None, :, 0] + d[..., 1] * e[:, None, :, 1]),
        axis=-1,
    )
    return accum, corr, t_final


def test_forward_matches_xla():
    for seed, saturate in [(0, False), (1, True), (2, True)]:
        scene = make_scene(seed=seed, saturate=saturate)
        a_ref, c_ref, t_ref = xla_composite(*scene)
        a, c, t = composite_block(*scene, interpret=True, block=4)
        # 1e-4: the kernel's log-space cumprod round-trip costs ~5e-5 vs
        # the XLA direct cumprod on TPU (both f32-exact vs an f64 oracle
        # once jax_default_matmul_precision=float32 is in effect).
        np.testing.assert_allclose(a, a_ref, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(c, c_ref, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(t, t_ref, atol=1e-4, rtol=1e-4)


def test_forward_padding_and_counts():
    # NT not divisible by block; fully-invalid tiles must come out empty.
    scene = list(make_scene(NT=5, K=8, seed=3))
    valid = np.array(scene[3])
    valid[4] = False
    scene[3] = jnp.asarray(valid)
    a, c, t = composite_block(*scene, interpret=True, block=4)
    assert a.shape[0] == 5
    np.testing.assert_allclose(a[4], 0.0, atol=0)
    np.testing.assert_allclose(t[4], 1.0, atol=0)


def test_gradients_match_xla():
    scene = make_scene(NT=4, K=16, C=5, seed=5, saturate=True)
    xy, conic, opac, valid, attrs, e, pixf = scene
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    def loss(fn, xy, conic, opac, attrs, e):
        a, c, t = fn(xy, conic, opac, valid, attrs, e, pixf)
        r1 = jax.random.normal(k1, a.shape)
        r2 = jax.random.normal(k2, c.shape)
        r3 = jax.random.normal(k3, t.shape)
        return jnp.sum(a * r1) + jnp.sum(c * r2) + jnp.sum(t * r3)

    args = (xy, conic, opac, attrs, e)
    g_ref = jax.grad(
        lambda *a: loss(xla_composite, *a), argnums=(0, 1, 2, 3, 4)
    )(*args)
    g_pl = jax.grad(
        lambda *a: loss(
            lambda *s: composite_block(*s, interpret=True, block=4), *a
        ),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    names = ["xy", "conic", "opac", "attrs", "e"]
    for n, gr, gp in zip(names, g_ref, g_pl):
        # Per-array absolute tolerance scaled to each gradient's own
        # magnitude (ADVICE r3): the saturated scene's 1/(1-alpha) (up to
        # 100x) rounding amplifier justifies a loose ABSOLUTE floor only on
        # the large-magnitude arrays (measured rel agreement ~2e-5); a
        # blanket 2e-3 floor would mask real regressions in the
        # small-magnitude xy/conic gradients.
        scale = float(jnp.max(jnp.abs(gr)))
        np.testing.assert_allclose(
            gp, gr, atol=max(4e-5 * scale, 1e-7), rtol=5e-4,
            err_msg=f"grad mismatch: {n}",
        )


def test_rasterizer_pallas_composite_matches_xla():
    """Full rasterizer (main + occ + front/back) with composite="pallas" vs
    the XLA path — values and gradients."""
    import dataclasses

    from soar_tpu.render.tiled import rasterize_front_back, rasterize_with_occ
    from soar_tpu.render.types import RasterConfig
    from tests.test_render import make_camera, make_scene

    cfg_x = RasterConfig(max_per_tile=32, dup_side=4)
    cfg_p = dataclasses.replace(cfg_x, composite="pallas")
    g = make_scene(n=50)
    cam = make_camera()
    bg = jnp.array([0.3, 0.3, 0.3])
    occ_colors = jnp.asarray(
        np.random.RandomState(1).rand(50, 3).astype(np.float32)
    )

    for fn in (rasterize_with_occ, rasterize_front_back):
        outs_x = fn(g, occ_colors, cam, (64, 64), bg, cfg_x)
        outs_p = fn(g, occ_colors, cam, (64, 64), bg, cfg_p)
        for ox, op in zip(outs_x, outs_p):
            np.testing.assert_allclose(op.color, ox.color, atol=3e-5)
            np.testing.assert_allclose(op.normal, ox.normal, atol=3e-5)
            np.testing.assert_allclose(op.depth, ox.depth, atol=2e-4)
            np.testing.assert_allclose(op.opac, ox.opac, atol=3e-5)

    def loss(xyz, colors, opac, cfg):
        gg = g._replace(means3d=xyz, colors=colors, opacities=opac)
        main, occ = rasterize_with_occ(
            gg, occ_colors, cam, (64, 64), bg, cfg
        )
        return (
            jnp.sum(main.color ** 2)
            + jnp.sum(main.normal * 0.3)
            + jnp.sum(main.depth * 0.01)
            + jnp.sum(occ.color * 0.2)
            + jnp.sum(occ.opac * 0.1)
        )

    args = (g.means3d, g.colors, g.opacities)
    gx = jax.grad(loss, argnums=(0, 1, 2))(*args, cfg_x)
    gp = jax.grad(loss, argnums=(0, 1, 2))(*args, cfg_p)
    for n, (a, b) in zip(("xyz", "colors", "opac"), zip(gx, gp)):
        np.testing.assert_allclose(
            b, a, atol=1e-4, rtol=5e-4, err_msg=f"grad mismatch: {n}"
        )


def test_pallas_composite_under_selective_remat():
    """The trainer's selective-remat policy (save only named post-sort
    residuals, rematerialize the composite) must compose with the fused
    kernel's custom VJP: the remat backward re-runs the forward kernel and
    then calls the hand-written backward kernel — gradients identical to
    the un-rematted pallas path."""
    import dataclasses

    from soar_tpu.render.tiled import rasterize_with_occ
    from soar_tpu.render.types import RasterConfig
    from tests.test_render import make_camera, make_scene

    cfg = dataclasses.replace(
        RasterConfig(max_per_tile=48, dup_side=4), composite="pallas"
    )
    g = make_scene(n=60)
    cam = make_camera()
    bg = jnp.zeros(3)
    occ_colors = jnp.broadcast_to(jnp.asarray(0.4), (60, 3))

    def loss(xyz, colors, opac):
        gg = g._replace(means3d=xyz, colors=colors, opacities=opac)
        main, occ = rasterize_with_occ(gg, occ_colors, cam, (64, 64), bg, cfg)
        return (
            jnp.sum(main.color**2)
            + jnp.sum(main.normal)
            + jnp.sum(main.depth * main.opac)
            + jnp.sum(occ.color)
        )

    policy = jax.checkpoint_policies.save_only_these_names(
        "raster_gather",
        "raster_gidx",
        "raster_slot_valid",
        "raster_overflow",
        "raster_occ_gather",
    )
    args = (g.means3d, g.colors, g.opacities)
    plain = jax.grad(loss, argnums=(0, 1, 2))(*args)
    remat = jax.grad(jax.checkpoint(loss, policy=policy), argnums=(0, 1, 2))(
        *args
    )
    for a, b in zip(plain, remat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(
    not _has_tpu(), reason="Mosaic lowering needs a real TPU backend"
)
def test_pallas_kernel_lowers_without_interpret():
    """ADVICE r2: interpret=True skips Mosaic's (8,128) tiling constraints,
    so the block-shape rules (singleton middle dim on per-pixel operands)
    were unguarded.  Lower + compile the real pallas_call on the TPU
    backend — a block-spec regression fails here instead of only on
    real-chip bench runs.  Value + grad parity with XLA is asserted too
    (cheap at this size once compiled)."""
    scene = make_scene(NT=6, K=24, seed=7, saturate=True)

    fwd = jax.jit(lambda *s: composite_block(*s, interpret=False, block=4))
    lowered = fwd.lower(*scene)
    compiled = lowered.compile()  # Mosaic compile — the regression gate
    a, c, t = compiled(*scene)
    a_ref, c_ref, t_ref = xla_composite(*scene)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               atol=5e-4, rtol=5e-4)

    xy, conic, opac, valid, attrs, e, pixf = scene

    def loss(xy, opac, attrs):
        a, c, t = composite_block(
            xy, conic, opac, valid, attrs, e, pixf,
            interpret=False, block=4,
        )
        return jnp.sum(a * a) + jnp.sum(c) + jnp.sum(t)

    def loss_ref(xy, opac, attrs):
        a, c, t = xla_composite(xy, conic, opac, valid, attrs, e, pixf)
        return jnp.sum(a * a) + jnp.sum(c) + jnp.sum(t)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xy, opac, attrs)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(xy, opac, attrs)
    for a_, b_ in zip(g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), atol=5e-3, rtol=5e-3
        )
