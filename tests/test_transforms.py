import jax
import jax.numpy as jnp
import numpy as np

from soar_tpu.core import transforms as T


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return T.quat_normalize(q)


def test_quat_rotmat_roundtrip():
    q = random_quats(jax.random.PRNGKey(0), 64)
    R = T.quat_to_rotmat(q)
    # Valid rotations: orthonormal, det 1.
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    q2 = T.rotmat_to_quat(R)
    R2 = T.quat_to_rotmat(q2)
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_multiply_matches_matmul():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    qa, qb = random_quats(k1, 32), random_quats(k2, 32)
    Rab = T.quat_to_rotmat(T.quat_multiply(qa, qb))
    np.testing.assert_allclose(
        Rab, T.quat_to_rotmat(qa) @ T.quat_to_rotmat(qb), atol=1e-5
    )


def test_rodrigues_small_and_known_angles():
    # 90 degrees about z.
    R = T.batch_rodrigues(jnp.array([[0.0, 0.0, np.pi / 2]]))[0]
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-5)
    # Zero rotation stays near identity (eps-shifted like smplx).
    R0 = T.batch_rodrigues(jnp.zeros((1, 3)))[0]
    np.testing.assert_allclose(R0, np.eye(3), atol=1e-5)


def test_normal_to_rotmat_third_column_is_normal():
    key = jax.random.PRNGKey(2)
    n = jax.random.normal(key, (100, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    R = T.normal_to_rotmat(n)
    np.testing.assert_allclose(R[..., :, 2], n, atol=1e-5)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (100, 1, 1)), atol=1e-5)


def test_sh_degree0_is_flat_color():
    from soar_tpu.core import sh

    rgb = jnp.array([0.25, 0.5, 0.75])
    coeff = sh.rgb_to_sh(rgb)
    dirs = jax.random.normal(jax.random.PRNGKey(3), (10, 3))
    out = sh.eval_sh(0, jnp.tile(coeff, (10, 1, 1)), dirs) + 0.5
    np.testing.assert_allclose(out, np.tile(np.asarray(rgb), (10, 1)), atol=1e-5)


def test_camera_projection_maps_center():
    """A point on the optical axis projects to the principal point."""
    from soar_tpu.core import camera as cam

    c2w = jnp.eye(4)  # camera at origin looking down -z (OpenGL)
    fov = jnp.array(np.pi / 3)
    c = cam.camera_from_c2w(c2w, fov, fov)
    # After convert_pose the camera looks down +z in the rasterizer frame.
    p = jnp.array([0.0, 0.0, -2.0, 1.0])  # in front of an OpenGL camera
    clip = c.full_proj @ p
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-6)
    # view-space depth positive
    pv = c.w2c @ p
    assert pv[2] > 0

    px = cam.ndc2pix(ndc[0], 512, jnp.array(0.5))
    np.testing.assert_allclose(px, (512 - 1) / 2.0, atol=1e-4)
