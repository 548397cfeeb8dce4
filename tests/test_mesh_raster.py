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
