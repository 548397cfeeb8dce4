import jax.numpy as jnp
import numpy as np

from soar_tpu.render.mesh_raster import get_proj_mat, render_mesh


def make_K(f, W, H):
    return jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)


def test_single_triangle_coverage_and_depth():
    """One triangle facing the camera: center pixel hit, corners not; depth
    equals the plane depth."""
    W = H = 64
    K = make_K(64.0, W, H)
    # Camera convention: w2c maps world -> camera with +z in front.
    w2c = jnp.eye(4)
    verts = jnp.asarray(
        [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.75, 2.0]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    proj = get_proj_mat(K, (W, H))
    out = render_mesh(verts, faces, w2c, proj, (W, H))
    mask = np.asarray(out["mask"])[..., 0]
    # Projected triangle spans roughly the middle of the image.
    assert mask[H // 2, W // 2] == 1.0
    assert mask[0, 0] == 0.0 and mask[-1, -1] == 0.0
    d = np.asarray(out["depth"])
    np.testing.assert_allclose(d[mask > 0.5], 2.0, atol=1e-3)
    # Normal of a z-facing triangle is +-z -> encoded 0.5,0.5,0 or 0.5,0.5,1.
    n = np.asarray(out["normal"])[H // 2, W // 2]
    np.testing.assert_allclose(n[:2], 0.5, atol=1e-5)
    assert abs(n[2] - 0.5) > 0.49


def test_zbuffer_orders_two_triangles():
    W = H = 32
    K = make_K(32.0, W, H)
    w2c = jnp.eye(4)
    verts = jnp.asarray(
        [
            # near triangle at z=1.5
            [-1.0, -1.0, 1.5], [1.0, -1.0, 1.5], [0.0, 1.5, 1.5],
            # far triangle at z=3
            [-2.0, -2.0, 3.0], [2.0, -2.0, 3.0], [0.0, 3.0, 3.0],
        ],
        jnp.float32,
    )
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    proj = get_proj_mat(K, (W, H))
    out = render_mesh(verts, faces, w2c, proj, (W, H))
    d = np.asarray(out["depth"])
    assert abs(d[H // 2, W // 2] - 1.5) < 1e-3  # near wins at center


def test_body_mesh_render():
    from soar_tpu.body import make_test_body

    body = make_test_body(num_joints=4, segments_per_bone=3, ring=8)
    # Place camera looking down +z at the tube (tube along +y from origin).
    w2c = jnp.eye(4)
    verts = np.asarray(body.v_template)
    verts = verts + np.array([0.0, -0.5, 2.0], np.float32)  # center + in front
    W = H = 96
    K = make_K(180.0, W, H)
    proj = get_proj_mat(K, (W, H))
    out = render_mesh(
        jnp.asarray(verts), body.faces, w2c, proj, (W, H), max_per_tile=96
    )
    mask = np.asarray(out["mask"])[..., 0]
    assert 0.02 < mask.mean() < 0.9
    # Visible surface normals should on average face the camera (-z in world
    # -> dot with view dir negative): encoded z < 0.5 on hit pixels.
    nz = np.asarray(out["normal"])[..., 2]
    assert (nz[mask > 0.5] < 0.5).mean() > 0.9


def test_truncation_keeps_nearest_faces():
    """When a tile bins more than max_per_tile faces, the first-K gather must
    keep the NEAREST ones (regression: tile-only sort kept the lowest-INDEX
    faces, so a late-indexed near face lost the z-test entirely).  Stack 12
    parallel quads over the same pixels with the nearest LAST in face order
    and max_per_tile=8."""
    W = H = 16
    K = make_K(16.0, W, H)
    w2c = jnp.eye(4)
    n_layers, v, f = 12, [], []
    for i in range(n_layers):
        # Far-to-near as index grows: z = 5.0 ... 1.7 (nearest is LAST).
        # One oversized triangle per layer (a quad's diagonal seam can
        # drop isolated pixels to the next layer by float rounding).
        z = 5.0 - 0.3 * i
        b = len(v)
        v += [[-8.0, -8.0, z], [8.0, -8.0, z], [0.0, 12.0, z]]
        f += [[b, b + 1, b + 2]]
    verts = jnp.asarray(v, jnp.float32)
    faces = jnp.asarray(f, jnp.int32)
    proj = get_proj_mat(K, (W, H))
    out = render_mesh(verts, faces, w2c, proj, (W, H), max_per_tile=8)
    d = np.asarray(out["depth"])
    mask = np.asarray(out["mask"])[..., 0]
    z_near = 5.0 - 0.3 * (n_layers - 1)
    np.testing.assert_allclose(d[mask > 0.5], z_near, atol=1e-3)
    # The canary reports the dropped (farthest) entries.
    ov = np.asarray(out["overflow"])
    assert ov[0] > 0 and ov[1] == 0


def test_back_surface_truncation_keeps_farthest():
    """Same stack under the flipped-projection far-surface trick
    (``compute_normal.py:176``): truncation must keep the FARTHEST faces."""
    W = H = 16
    K = make_K(16.0, W, H)
    w2c = jnp.eye(4)
    n_layers, v, f = 12, [], []
    for i in range(n_layers):
        # Near-to-far as index grows: the farthest is LAST in face order.
        z = 1.7 + 0.3 * i
        b = len(v)
        v += [[-8.0, -8.0, z], [8.0, -8.0, z], [0.0, 12.0, z]]
        f += [[b, b + 1, b + 2]]
    verts = jnp.asarray(v, jnp.float32)
    faces = jnp.asarray(f, jnp.int32)
    proj = np.array(get_proj_mat(K, (W, H)))
    proj[2] *= -1.0
    out = render_mesh(verts, faces, w2c, jnp.asarray(proj), (W, H),
                      max_per_tile=8)
    d = np.asarray(out["depth"])
    mask = np.asarray(out["mask"])[..., 0]
    z_far = 1.7 + 0.3 * (n_layers - 1)
    np.testing.assert_allclose(d[mask > 0.5], z_far, atol=1e-3)
