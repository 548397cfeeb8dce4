import jax
import jax.numpy as jnp
import numpy as np

from soar_tpu.field import (
    AttributeFieldConfig,
    HashGridConfig,
    attribute_field_apply,
    hash_encode,
    init_attribute_field,
    init_hash_grid,
    reset_field,
)
from soar_tpu.field.hashgrid import _hash3, normalize_positions

TINY = HashGridConfig(
    num_levels=4, min_res=4, max_res=32, log2_hashmap_size=10,
    mode="corner", dtype="float32",
)
TINY_CELL = HashGridConfig(
    num_levels=4, min_res=4, max_res=32, log2_hashmap_size=10,
    mode="cell", dtype="float32",
)
TINY_FIELD = AttributeFieldConfig(grid=TINY, hidden_dim=16)


def test_hash_encode_matches_numpy_trilerp():
    cfg = TINY
    key = jax.random.PRNGKey(0)
    table = init_hash_grid(key, cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))

    got = hash_encode(table, pts, cfg)

    tbl = np.asarray(table)
    P = np.asarray(pts)
    mask = cfg.table_size - 1
    primes = np.array([1, 2654435761, 805459861], np.uint64)
    out = np.zeros((len(P), cfg.out_dim), np.float32)
    for li, res in enumerate(cfg.resolutions()):
        scaled = P * res
        base = np.floor(scaled).astype(np.int64)
        w = scaled - base
        acc = np.zeros((len(P), cfg.features_per_level))
        for c in range(8):
            cx, cy, cz = c & 1, (c >> 1) & 1, (c >> 2) & 1
            corner = base + [cx, cy, cz]
            h = (
                (corner[:, 0].astype(np.uint64) * primes[0])
                ^ (corner[:, 1].astype(np.uint64) * primes[1])
                ^ (corner[:, 2].astype(np.uint64) * primes[2])
            ) & 0xFFFFFFFF
            idx = (h & mask).astype(np.int64)
            cw = (
                (w[:, 0] if cx else 1 - w[:, 0])
                * (w[:, 1] if cy else 1 - w[:, 1])
                * (w[:, 2] if cz else 1 - w[:, 2])
            )
            acc += tbl[li][idx] * cw[:, None]
        out[:, li * 2 : li * 2 + 2] = acc
    np.testing.assert_allclose(got, out, atol=1e-6)


def test_hash_encode_continuity():
    """Encoding is continuous across a cell boundary (trilerp sanity)."""
    cfg = TINY
    table = init_hash_grid(jax.random.PRNGKey(0), cfg)
    p = jnp.array([[0.25 - 1e-5, 0.3, 0.7], [0.25 + 1e-5, 0.3, 0.7]])
    f = hash_encode(table, p, cfg)
    np.testing.assert_allclose(f[0], f[1], atol=1e-3)


def test_cell_mode_shapes_and_gradients():
    """Cell-packed mode: same output dim, within-cell continuity, gradient
    flows to the packed table."""
    cfg = TINY_CELL
    table = init_hash_grid(jax.random.PRNGKey(0), cfg)
    assert table.shape == (4, cfg.table_size, 16)  # 8 corners x 2 features
    pts = jax.random.uniform(jax.random.PRNGKey(1), (13, 3))
    out = hash_encode(table, pts, cfg)
    assert out.shape == (13, cfg.out_dim)

    # Continuity inside one cell of the finest level (no boundary crossing):
    eps = 1e-5
    p0 = jnp.array([[0.51, 0.52, 0.53]])
    f0 = hash_encode(table, p0, cfg)
    f1 = hash_encode(table, p0 + eps, cfg)
    np.testing.assert_allclose(f0, f1, atol=1e-2)

    g = jax.grad(lambda t: jnp.sum(hash_encode(t, pts, cfg) ** 2))(table)
    assert float(jnp.abs(g).max()) > 0

    # Exact trilerp: at a corner of every level's lattice... use weight sum:
    # weights must sum to 1 => encoding of a constant table is that constant.
    const = jnp.ones_like(table) * 0.25
    f = hash_encode(const, pts, cfg)
    np.testing.assert_allclose(f, 0.25, atol=1e-5)


def test_attribute_field_shapes_and_activations():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    params = init_attribute_field(jax.random.PRNGKey(0), aabb, TINY_FIELD)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (50, 3), minval=-0.9, maxval=0.9)
    out = attribute_field_apply(params, xyz, cfg=TINY_FIELD)
    assert out["shs"].shape == (50, 3)
    assert out["scales"].shape == (50, 1)
    assert out["quats"].shape == (50, 4)
    assert out["offsets"].shape == (50, 3)
    assert out["opacities"].shape == (50, 1)
    assert (np.asarray(out["shs"]) >= 0).all() and (np.asarray(out["shs"]) <= 1).all()
    assert (np.asarray(out["scales"]) >= 0).all() and (
        np.asarray(out["scales"]) <= 2e-2
    ).all()
    np.testing.assert_allclose(np.linalg.norm(out["quats"], axis=-1), 1.0, atol=1e-5)
    # Zero-init offsets head -> exactly zero at init (sdf_fields.py:133-134).
    np.testing.assert_allclose(out["offsets"], 0.0, atol=1e-8)


def test_out_of_box_positions_are_zeroed():
    aabb = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    pos, sel = normalize_positions(jnp.array([[2.0, 0.5, 0.5], [0.5, 0.5, 0.5]]), aabb)
    assert not bool(sel[0]) and bool(sel[1])
    np.testing.assert_allclose(pos[0], 0.0)


def test_reset_field_distills():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    params = init_attribute_field(jax.random.PRNGKey(0), aabb, TINY_FIELD)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (200, 3), minval=-0.8, maxval=0.8)
    gt_shs = jax.random.uniform(jax.random.PRNGKey(2), (200, 3))
    gt_scales = jax.random.uniform(jax.random.PRNGKey(3), (200, 1)) * 2e-2
    q = jax.random.normal(jax.random.PRNGKey(4), (200, 4))
    gt_quats = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    trained, losses = reset_field(
        params, xyz, gt_shs, gt_scales, gt_quats, cfg=TINY_FIELD, steps=200
    )
    assert float(losses[-1]) < float(losses[0]) * 0.5
    out = attribute_field_apply(trained, xyz, cfg=TINY_FIELD)
    assert float(jnp.mean((out["shs"] - gt_shs) ** 2)) < 0.05


def test_reset_field_partial_chunk_is_exact():
    """A non-chunk-multiple step count pads the final scan with MASKED
    no-op steps (same program shape, one compile) — the trajectory must be
    exactly ``steps`` updates: in full-batch mode (deterministic, keys
    unused) a 55-step run's first 50 losses equal a 50-step run's, and the
    padded tail changes nothing after step 55."""
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    params = init_attribute_field(jax.random.PRNGKey(0), aabb, TINY_FIELD)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.8, maxval=0.8)
    gt_shs = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))
    gt_scales = jax.random.uniform(jax.random.PRNGKey(3), (64, 1)) * 2e-2
    q = jax.random.normal(jax.random.PRNGKey(4), (64, 4))
    gt_quats = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    args = (xyz, gt_shs, gt_scales, gt_quats)
    _, l50 = reset_field(params, *args, cfg=TINY_FIELD, steps=50)
    p55, l55 = reset_field(params, *args, cfg=TINY_FIELD, steps=55)
    assert l55.shape == (55,)
    np.testing.assert_allclose(np.asarray(l50), np.asarray(l55[:50]), rtol=1e-6)
    # The 100-step padded run agrees with the 55-step run at step 55
    # (identical prefix trajectory; the pad steps froze nothing extra in).
    p60, l60 = reset_field(params, *args, cfg=TINY_FIELD, steps=60)
    np.testing.assert_allclose(np.asarray(l55), np.asarray(l60[:55]), rtol=1e-6)
