"""Golden tests for the surfel rasterizer.

Strategy (SURVEY.md §4): a literal sequential numpy re-implementation of the
reference kernel semantics (projection -> EWA -> depth sort -> front-to-back
blend with skip/early-stop rules) is the golden model; the vectorized oracle
must match it exactly, and the production tiled renderer must match the
oracle whenever its static capacities are large enough.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soar_tpu.core.camera import camera_from_c2w, look_at_c2w
from soar_tpu.core.transforms import quat_normalize, quat_to_rotmat
from soar_tpu.render import (
    GaussianInputs,
    RasterConfig,
    rasterize,
    rasterize_oracle,
)


def make_scene(n=60, seed=0, spread=0.4):
    rng = np.random.RandomState(seed)
    means = rng.randn(n, 3).astype(np.float32) * spread
    quats = quat_normalize(jnp.asarray(rng.randn(n, 4).astype(np.float32)))
    scales = np.abs(rng.randn(n, 3)).astype(np.float32) * 0.05 + 0.02
    opac = rng.uniform(0.3, 1.0, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    g = GaussianInputs(
        means3d=jnp.asarray(means),
        quats=quats,
        scales=jnp.asarray(scales),
        opacities=jnp.asarray(opac),
        colors=jnp.asarray(colors),
    )
    return g


def make_camera(dist=3.0, fov_deg=40.0, azim=0.3, elev=0.2):
    pos = np.array(
        [
            dist * np.cos(elev) * np.sin(azim),
            dist * np.sin(elev),
            dist * np.cos(elev) * np.cos(azim),
        ],
        np.float32,
    )
    c2w = look_at_c2w(
        jnp.asarray(pos), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    fov = jnp.asarray(np.deg2rad(fov_deg))
    return camera_from_c2w(c2w, fov, fov)


def numpy_reference_render(g, cam, H, W, bg, cfg: RasterConfig):
    """Sequential per-pixel blend with the reference's exact rules
    (``forward.cu:497-633``), written independently in numpy."""
    n = np.asarray(g.means3d).shape[0]
    w2c = np.asarray(cam.w2c)
    full_proj = np.asarray(cam.full_proj)
    fx = W / (2 * np.tan(float(cam.fovx) / 2))
    fy = H / (2 * np.tan(float(cam.fovy) / 2))

    means = np.asarray(g.means3d)
    R = np.asarray(quat_to_rotmat(g.quats))
    scales = np.asarray(g.scales).copy()
    if cfg.surface:
        scales[:, 2] = 0.0
    opac = np.asarray(g.opacities)
    colors = np.asarray(g.colors)

    data = []
    for i in range(n):
        ph = full_proj @ np.append(means[i], 1.0)
        pw = 1.0 / (ph[3] + 1e-7)
        ndc = ph[:3] * pw
        pv = (w2c @ np.append(means[i], 1.0))[:3]
        x = ((ndc[0] + 1) * W - 1) * 0.5
        y = ((ndc[1] + 1) * H - 1) * 0.5
        # near-plane cull at cfg.near (see RasterConfig.near: deviation from
        # the reference's z >= 0, which explodes EWA on the 0..znear band)
        if pv[2] < cfg.near or x < -0.2 * W or x >= 1.2 * W or y < -0.2 * H or y >= 1.2 * H:
            continue
        n_view = w2c[:3, :3] @ R[i][:, 2]
        ax0 = w2c[:3, :3] @ R[i][:, 0]
        ax1 = w2c[:3, :3] @ R[i][:, 1]
        vdot = pv @ n_view
        if cfg.render_front and vdot > -0.01:
            continue
        # local homography
        jinv = np.zeros(10)
        if cfg.surface and cfg.perpix_depth:
            s_fix, svp = 1000.0, (fx + fy) / 2
            pp = np.array([pv[0] / pv[2], pv[1] / pv[2]])
            d0 = np.array([pp[0] + 1 / s_fix, pp[1], 1.0])
            d1 = np.array([pp[0], pp[1] + 1 / s_fix, 1.0])
            m0, m1 = np.linalg.norm(d0), np.linalg.norm(d1)
            d0, d1 = d0 / m0, d1 / m1
            pr0, pr1 = d0 @ n_view, d1 @ n_view
            if abs(pr0 / m0) < 0.01 or abs(pr1 / m1) < 0.01:
                continue
            tt = pv @ n_view
            xu0 = d0 * (tt / pr0) - pv
            xu1 = d1 * (tt / pr1) - pv
            sc = svp / s_fix
            jinv[:4] = [xu0 @ ax0 / sc, xu1 @ ax0 / sc, xu0 @ ax1 / sc, xu1 @ ax1 / sc]
            jinv[4:7] = ax0
            jinv[7:10] = ax1
        cov3d = R[i] @ np.diag(scales[i] ** 2) @ R[i].T
        tz = pv[2]
        lim = 1.3 * np.tan(float(cam.fovx) / 2)
        tx = np.clip(pv[0] / tz, -lim, lim) * tz
        limy = 1.3 * np.tan(float(cam.fovy) / 2)
        ty = np.clip(pv[1] / tz, -limy, limy) * tz
        J = np.array(
            [[fx / tz, 0, -fx * tx / tz**2], [0, fy / tz, -fy * ty / tz**2]]
        )
        cov2 = J @ w2c[:3, :3] @ cov3d @ w2c[:3, :3].T @ J.T
        a, b, c = cov2[0, 0] + cfg.low_pass, cov2[0, 1], cov2[1, 1] + cfg.low_pass
        det = a * c - b * b
        if det == 0:
            continue
        conic = np.array([c / det, -b / det, a / det])
        mid = 0.5 * (a + c)
        radius = np.ceil(3 * np.sqrt(mid + np.sqrt(max(0.1, mid * mid - det))))
        tile = cfg.tile
        ntx, nty = -(-W // tile), -(-H // tile)
        rect = (
            np.clip(np.floor((x - radius) / tile), 0, ntx),
            np.clip(np.floor((y - radius) / tile), 0, nty),
            np.clip(np.floor((x + radius + tile - 1) / tile), 0, ntx),
            np.clip(np.floor((y + radius + tile - 1) / tile), 0, nty),
        )
        data.append((pv[2], x, y, conic, opac[i], colors[i], n_view, jinv, rect))

    data.sort(key=lambda e: -e[0] if cfg.sort_descending else e[0])

    img = np.zeros((H, W, 3))
    nrm = np.zeros((H, W, 3))
    dep = np.zeros((H, W))
    opa = np.zeros((H, W))
    for py in range(H):
        for px in range(W):
            T = 1.0
            C = np.zeros(3)
            Nv = np.zeros(3)
            D = 0.0
            for depth, x, y, conic, op, col, n_view, jinv, rect in data:
                tpx, tpy = px // cfg.tile, py // cfg.tile
                if not (rect[0] <= tpx < rect[2] and rect[1] <= tpy < rect[3]):
                    continue
                dx, dy = x - px, y - py
                power = -0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) - conic[1] * dx * dy
                if power > 0:
                    continue
                alpha = min(0.99, op * np.exp(power))
                if alpha < 1 / 255:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                w = alpha * T
                dtmp = depth
                if cfg.surface and cfg.perpix_depth:
                    du0 = dx * jinv[0] + dy * jinv[1]
                    du1 = dx * jinv[2] + dy * jinv[3]
                    dtmp = depth - (du0 * jinv[6] + du1 * jinv[9])
                D += dtmp * w
                C += col * w
                if cfg.surface:
                    Nv += n_view * w
                T = test_T
            T = min(1 - 1e-6, T)
            img[py, px] = C + T * np.asarray(bg)
            nrm[py, px] = Nv
            dep[py, px] = D / (1 - T) if cfg.normalize_depth else D + T * 10
            opa[py, px] = 1 - T
    return img, nrm, dep, opa


@pytest.mark.parametrize("sort_descending", [False, True])
def test_oracle_matches_numpy_reference(sort_descending):
    cfg = RasterConfig(sort_descending=sort_descending)
    g = make_scene(n=40)
    cam = make_camera()
    H = W = 32
    bg = jnp.array([0.2, 0.3, 0.4])
    out = rasterize_oracle(g, cam, (H, W), bg, cfg, pixel_chunk=256)
    img, nrm, dep, opa = numpy_reference_render(g, cam, H, W, bg, cfg)
    np.testing.assert_allclose(out.color, img, atol=2e-4)
    np.testing.assert_allclose(out.normal, nrm, atol=2e-4)
    np.testing.assert_allclose(out.opac, opa, atol=2e-4)
    np.testing.assert_allclose(out.depth, dep, atol=2e-3)


def test_oracle_render_front_culls():
    cfg = RasterConfig(render_front=True)
    g = make_scene(n=40)
    cam = make_camera()
    out = rasterize_oracle(g, cam, (32, 32), jnp.zeros(3), cfg, pixel_chunk=256)
    img, nrm, dep, opa = numpy_reference_render(g, cam, 32, 32, np.zeros(3), cfg)
    np.testing.assert_allclose(out.color, img, atol=2e-4)
    np.testing.assert_allclose(out.opac, opa, atol=2e-4)


@pytest.mark.parametrize("sort_descending", [False, True])
def test_tiled_matches_oracle(sort_descending):
    cfg = RasterConfig(
        sort_descending=sort_descending, max_per_tile=64, dup_side=4
    )
    g = make_scene(n=60)
    cam = make_camera()
    H = W = 64
    bg = jnp.array([0.1, 0.1, 0.1])
    a = rasterize_oracle(g, cam, (H, W), bg, cfg, pixel_chunk=512)
    b = rasterize(g, cam, (H, W), bg, cfg)
    np.testing.assert_allclose(b.color, a.color, atol=3e-4)
    np.testing.assert_allclose(b.normal, a.normal, atol=3e-4)
    np.testing.assert_allclose(b.opac, a.opac, atol=3e-4)
    np.testing.assert_allclose(b.depth, a.depth, atol=3e-3)


def test_oracle_at_pixels_matches_full_oracle():
    """rasterize_oracle_at (the bench truncation-probe's subsampled
    oracle) must agree EXACTLY with the full-image oracle at the probed
    coordinates — it is the same chunk renderer behind both."""
    from soar_tpu.render.oracle import rasterize_oracle_at

    cfg = RasterConfig(max_per_tile=64, dup_side=4)
    g = make_scene(n=60)
    cam = make_camera()
    H = W = 64
    bg = jnp.array([0.1, 0.1, 0.1])
    full = rasterize_oracle(g, cam, (H, W), bg, cfg, pixel_chunk=512)
    rng = np.random.RandomState(0)
    xs = rng.randint(0, W, 200)
    ys = rng.randint(0, H, 200)
    pix = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))
    color, normal, depth, opac, _t = rasterize_oracle_at(
        g, cam, (H, W), bg, pix, cfg
    )
    np.testing.assert_allclose(color, np.asarray(full.color)[ys, xs], atol=1e-6)
    np.testing.assert_allclose(opac, np.asarray(full.opac)[ys, xs], atol=1e-6)
    np.testing.assert_allclose(
        normal, np.asarray(full.normal)[ys, xs], atol=1e-6
    )


@pytest.mark.slow
def test_tiled_gradients_match_oracle():
    cfg = RasterConfig(max_per_tile=64, dup_side=4)
    g = make_scene(n=30)
    cam = make_camera()
    H = W = 32
    bg = jnp.zeros(3)
    target = jnp.ones((H, W, 3)) * 0.5

    def loss_tiled(means, colors):
        gg = g._replace(means3d=means, colors=colors)
        out = rasterize(gg, cam, (H, W), bg, cfg)
        return jnp.mean((out.color - target) ** 2) + jnp.mean(out.normal**2)

    def loss_oracle(means, colors):
        gg = g._replace(means3d=means, colors=colors)
        out = rasterize_oracle(gg, cam, (H, W), bg, cfg, pixel_chunk=256)
        return jnp.mean((out.color - target) ** 2) + jnp.mean(out.normal**2)

    gm_t, gc_t = jax.grad(loss_tiled, argnums=(0, 1))(g.means3d, g.colors)
    gm_o, gc_o = jax.grad(loss_oracle, argnums=(0, 1))(g.means3d, g.colors)
    assert np.isfinite(np.asarray(gm_t)).all()
    assert float(jnp.abs(gc_t).max()) > 0  # gradient actually flows
    np.testing.assert_allclose(gc_t, gc_o, atol=1e-5)
    np.testing.assert_allclose(gm_t, gm_o, atol=1e-4)


def test_rasterize_with_occ_matches_separate_pass():
    """Shared-binning occ pass == an independent front-face-culled render
    (capacity ample so truncation differences vanish)."""
    from soar_tpu.render.tiled import rasterize_with_occ

    cfg = RasterConfig(max_per_tile=96, dup_side=4)
    g = make_scene(n=50)
    cam = make_camera()
    bg = jnp.array([0.3, 0.3, 0.3])
    occ_colors = jnp.asarray(
        np.random.RandomState(1).rand(50, 3).astype(np.float32)
    )

    main, occ = rasterize_with_occ(g, occ_colors, cam, (64, 64), bg, cfg)

    main_ref = rasterize(g, cam, (64, 64), bg, cfg)
    occ_ref = rasterize(
        g._replace(colors=occ_colors),
        cam,
        (64, 64),
        bg,
        RasterConfig(max_per_tile=96, dup_side=4, render_front=True),
    )
    np.testing.assert_allclose(main.color, main_ref.color, atol=1e-5)
    np.testing.assert_allclose(occ.color, occ_ref.color, atol=1e-5)
    np.testing.assert_allclose(occ.opac, occ_ref.opac, atol=1e-5)


def test_gradients_finite_difference():
    """Color gradients against central finite differences (the analogue of
    finite-difference-checking the hand-written CUDA backward)."""
    cfg = RasterConfig(max_per_tile=64, dup_side=4)
    g = make_scene(n=10)
    cam = make_camera()
    bg = jnp.zeros(3)

    def loss(colors):
        out = rasterize(g._replace(colors=colors), cam, (24, 24), bg, cfg)
        return jnp.sum(out.color**2)

    grad = jax.grad(loss)(g.colors)
    eps = 1e-3
    rng = np.random.RandomState(0)
    for _ in range(5):
        i, j = rng.randint(0, 10), rng.randint(0, 3)
        e = np.zeros_like(np.asarray(g.colors))
        e[i, j] = eps
        lp = float(loss(g.colors + e))
        lm = float(loss(g.colors - e))
        fd = (lp - lm) / (2 * eps)
        np.testing.assert_allclose(float(grad[i, j]), fd, rtol=2e-2, atol=1e-4)


def test_two_tier_slot_budget_matches_single_tier():
    """With fat_budget < N, only the largest-radius surfels get the 5x5
    slot grid; the image (and grads) must match the ample single-tier
    grid as long as every >2x2-footprint surfel is in the fat set — and
    the capped canary must fire when one is not."""
    from soar_tpu.render.tiled import bin_and_sort
    from soar_tpu.render.preprocess import preprocess

    rng = np.random.RandomState(3)
    n = 40
    g = make_scene(n=n)
    # A few huge surfels (multi-tile footprint), the rest small.
    scales = np.array(g.scales)
    scales[:, :2] *= 0.25
    scales[:5, :2] *= 20.0
    g = g._replace(scales=jnp.asarray(scales))
    cam = make_camera()
    bg = jnp.array([0.1, 0.2, 0.3])

    single = RasterConfig(max_per_tile=96, dup_side=5, fat_budget=n)
    tiered = RasterConfig(max_per_tile=96, dup_side=5, fat_budget=8)

    def loss(xyz, colors, cfg):
        out = rasterize(
            g._replace(means3d=xyz, colors=colors), cam, (64, 64), bg, cfg
        )
        return jnp.sum(out.color**2) + jnp.sum(out.opac), out

    (l1, o1), g1 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        g.means3d, g.colors, single
    )
    (l2, o2), g2 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        g.means3d, g.colors, tiered
    )
    assert int(o2.overflow[1]) == 0  # all wide surfels fit the fat set
    np.testing.assert_allclose(o2.color, o1.color, atol=1e-5)
    np.testing.assert_allclose(o2.opac, o1.opac, atol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)

    # Canary: starve the fat set so a wide surfel lands in the small tier.
    pre = preprocess(g, cam, (64, 64), single)
    starved = RasterConfig(max_per_tile=96, dup_side=5, fat_budget=1)
    *_, overflow = bin_and_sort(pre, (64, 64), starved)
    assert int(overflow[1]) > 0


def test_compose_reverse_matches_descending_sort():
    """Back-surface pass via reversed per-tile composite (shared ascending
    sort) == the descending-sort back pass, in values AND gradients — both
    with ample capacity and under max_per_tile truncation (farthest-K kept
    either way)."""
    g = make_scene(n=60)
    cam = make_camera()
    bg = jnp.array([0.2, 0.1, 0.4])

    for K in (96, 4):  # ample / truncating
        cfg_desc = RasterConfig(max_per_tile=K, dup_side=4,
                                sort_descending=True)
        cfg_rev = RasterConfig(max_per_tile=K, dup_side=4,
                               compose_reverse=True)

        def loss(xyz, colors, cfg):
            out = rasterize(
                g._replace(means3d=xyz, colors=colors), cam, (64, 64), bg, cfg
            )
            return (
                jnp.sum(out.color**2) + jnp.sum(out.normal * out.depth[..., None]),
                out,
            )

        (l1, o1), g1 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            g.means3d, g.colors, cfg_desc
        )
        (l2, o2), g2 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            g.means3d, g.colors, cfg_rev
        )
        np.testing.assert_allclose(o2.color, o1.color, atol=1e-5)
        np.testing.assert_allclose(o2.normal, o1.normal, atol=1e-5)
        np.testing.assert_allclose(o2.depth, o1.depth, atol=1e-5)
        np.testing.assert_allclose(o2.opac, o1.opac, atol=1e-5)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_rasterize_front_back_matches_separate():
    """One-sort front+back+occ == the three separate rasterizations."""
    from soar_tpu.render.tiled import rasterize_front_back, rasterize_with_occ

    cfg = RasterConfig(max_per_tile=96, dup_side=4)
    g = make_scene(n=50)
    cam = make_camera()
    bg = jnp.array([0.3, 0.3, 0.3])
    occ_colors = jnp.asarray(
        np.random.RandomState(1).rand(50, 3).astype(np.float32)
    )

    front, back, occ = rasterize_front_back(
        g, occ_colors, cam, (64, 64), bg, cfg
    )
    front_ref, occ_ref = rasterize_with_occ(
        g, occ_colors, cam, (64, 64), bg, cfg
    )
    back_ref = rasterize(
        g, cam, (64, 64), bg,
        RasterConfig(max_per_tile=96, dup_side=4, sort_descending=True),
    )
    np.testing.assert_allclose(front.color, front_ref.color, atol=1e-5)
    np.testing.assert_allclose(back.color, back_ref.color, atol=1e-5)
    np.testing.assert_allclose(back.normal, back_ref.normal, atol=1e-5)
    np.testing.assert_allclose(occ.color, occ_ref.color, atol=1e-5)
    np.testing.assert_allclose(occ.opac, occ_ref.opac, atol=1e-5)


def test_selective_remat_gradients_identical():
    """The trainer's selective-remat policy (save only the named post-sort
    per-tile gathers, rematerialize the per-pixel composite) must be a pure
    memory/schedule transform: gradients bit-identical to no remat."""
    from soar_tpu.render.tiled import rasterize_with_occ

    cfg = RasterConfig(max_per_tile=48, dup_side=4)
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


def test_overflow_counters():
    """Capacity diagnostics (VERDICT r1 weak #3): ample capacities -> 0;
    a starved max_per_tile reports dropped splats; a starved dup_side
    reports footprint-capped surfels."""
    g = make_scene(n=50)
    cam = make_camera()
    bg = jnp.zeros(3)

    ok = rasterize(g, cam, (64, 64), bg, RasterConfig(max_per_tile=96, dup_side=4))
    assert ok.overflow.shape == (2,)
    assert int(ok.overflow[0]) == 0 and int(ok.overflow[1]) == 0

    starved_k = rasterize(g, cam, (64, 64), bg, RasterConfig(max_per_tile=1, dup_side=4))
    assert int(starved_k.overflow[0]) > 0

    starved_s = rasterize(g, cam, (64, 64), bg, RasterConfig(max_per_tile=96, dup_side=1))
    assert int(starved_s.overflow[1]) > 0


def test_degenerate_camera_plane_surfel_stays_finite():
    """A surfel at (or within float noise of) the camera plane produces
    inf/NaN in its projected row; it is culled, but its packed row is still
    reachable as first-K PADDING of short tile runs.  The image and its
    gradient must stay finite (NaN-defense: zeroed invalid rows +
    select-based alpha masking)."""
    g = make_scene(n=40)
    cam = make_camera(dist=2.0)
    # Place surfels exactly on and just behind the camera plane: view-space
    # z == 0 and z < 0.  Camera position in world space:
    cam_pos = np.asarray(
        jnp.linalg.inv(cam.w2c) @ jnp.array([0.0, 0.0, 0.0, 1.0])
    )[:3]
    # Camera forward direction in world space (view +z):
    fwd = np.asarray(jnp.linalg.inv(cam.w2c))[:3, 2]
    means = np.array(g.means3d)
    means[0] = cam_pos  # z exactly 0
    means[1] = cam_pos * 1.001  # slightly behind
    means[2] = np.nan  # fully degenerate row (e.g. upstream LBS blowup)
    g = g._replace(means3d=jnp.asarray(means))

    cfg = RasterConfig(max_per_tile=32, dup_side=3)
    out = rasterize(g, cam, (64, 64), jnp.zeros(3), cfg)
    assert np.isfinite(np.asarray(out.color)).all()
    assert np.isfinite(np.asarray(out.depth)).all()

    # A surfel in the 0..near band (z ~ 0.05): EWA scales as (fx/z)^2, so
    # without the near cull it composites as a giant nearest-depth opaque
    # blob over the whole frame.  It must contribute NOTHING — the image
    # must equal one with that surfel behind the camera (also culled).
    means_band = np.array(means)
    means_band[3] = cam_pos + 0.05 * fwd
    means_gone = np.array(means)
    means_gone[3] = cam_pos - 1.0 * fwd
    out_band = rasterize(
        g._replace(means3d=jnp.asarray(means_band)), cam, (64, 64),
        jnp.zeros(3), cfg,
    )
    out_gone = rasterize(
        g._replace(means3d=jnp.asarray(means_gone)), cam, (64, 64),
        jnp.zeros(3), cfg,
    )
    np.testing.assert_allclose(
        np.asarray(out_band.color), np.asarray(out_gone.color), atol=1e-6
    )

    def loss(means3d):
        o = rasterize(
            g._replace(means3d=means3d), cam, (64, 64), jnp.zeros(3), cfg
        )
        return jnp.sum(o.color) + jnp.sum(o.normal)

    grad = np.asarray(jax.grad(loss)(g.means3d))
    # The NaN surfel's OWN gradient goes through a NaN projection Jacobian
    # (0-cotangent * NaN = NaN) — unavoidable and harmless (the optimizer
    # never receives NaN params from finite ones); every other surfel's
    # gradient must be finite.
    assert np.isfinite(grad[:2]).all() and np.isfinite(grad[3:]).all()


def test_bf16_composite_tracks_f32():
    """``RasterConfig.composite_dtype="bf16"`` rides the [NT, P, K]
    composite intermediates in bf16 (f32 channel accumulation) — the fast
    knob for the bandwidth-bound production step.  Values must track the
    f32 composite to bf16 quantization error and gradients must stay
    finite and directionally aligned."""
    g = make_scene(n=60)
    cam = make_camera()
    H = W = 64
    bg = jnp.array([0.1, 0.1, 0.1])
    f32 = RasterConfig(max_per_tile=64, dup_side=4)
    b16 = RasterConfig(max_per_tile=64, dup_side=4, composite_dtype="bf16")
    a = rasterize(g, cam, (H, W), bg, f32)
    b = rasterize(g, cam, (H, W), bg, b16)
    assert b.color.dtype == jnp.float32  # outputs stay f32
    np.testing.assert_allclose(b.color, a.color, atol=2e-2)
    np.testing.assert_allclose(b.opac, a.opac, atol=2e-2)
    np.testing.assert_allclose(b.normal, a.normal, atol=3e-2)

    target = jnp.full((H, W, 3), 0.5)

    def loss(colors, cfg):
        out = rasterize(g._replace(colors=colors), cam, (H, W), bg, cfg)
        return jnp.mean((out.color - target) ** 2)

    ga = np.asarray(jax.grad(loss)(g.colors, f32)).ravel()
    gb = np.asarray(jax.grad(loss)(g.colors, b16)).ravel()
    assert np.isfinite(gb).all()
    cos = ga @ gb / max(np.linalg.norm(ga) * np.linalg.norm(gb), 1e-12)
    assert cos > 0.99, cos
