import jax
import jax.numpy as jnp
import numpy as np

from soar_tpu.body import make_test_body
from soar_tpu.body.model import smplx_forward
from soar_tpu.preproc.smplify import (
    SMPLify,
    SMPLifyConfig,
    gmof,
    matrix_to_rotation_6d,
    rotation_6d_to_matrix,
    rotmat_to_rotvec,
)


def test_rotation_6d_roundtrip():
    from soar_tpu.core.transforms import batch_rodrigues

    aa = jax.random.normal(jax.random.PRNGKey(0), (16, 3)) * 0.8
    R = batch_rodrigues(aa)
    d6 = matrix_to_rotation_6d(R)
    R2 = rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(R2, R, atol=1e-5)
    aa2 = rotmat_to_rotvec(R2)
    R3 = batch_rodrigues(aa2)
    np.testing.assert_allclose(R3, R, atol=1e-4)


def test_rotmat_to_rotvec_near_pi():
    """Log map must stay exact where the skew part vanishes (angle ~ pi) —
    a camera-facing global_orient is conventionally ~pi about x."""
    from soar_tpu.core.transforms import batch_rodrigues

    cases = np.array(
        [
            [np.pi, 0.0, 0.0],
            [3.141, 0.01, 0.02],
            [0.0, np.pi, 0.0],
            [0.0, 0.0, -np.pi + 1e-4],
            [1e-9, 0.0, 0.0],
            [0.0, 0.0, 0.0],
        ],
        np.float32,
    )
    R = batch_rodrigues(jnp.asarray(cases))
    back = rotmat_to_rotvec(R)
    np.testing.assert_allclose(batch_rodrigues(back), R, atol=2e-5)
    # pi about x must come back with magnitude pi (the old skew-part
    # formula returned ~identity here).
    assert abs(float(jnp.linalg.norm(back[0])) - np.pi) < 1e-3
    # Gradients finite everywhere, including the angle ~ 0 limit.
    g = jax.grad(lambda r: jnp.sum(rotmat_to_rotvec(batch_rodrigues(r)) ** 2))(
        jnp.asarray(cases)
    )
    assert bool(jnp.all(jnp.isfinite(g)))


def test_gmof_saturates():
    x = jnp.asarray([0.0, 1.0, 1e6])
    y = gmof(x, 100.0)
    assert float(y[0]) == 0.0
    assert abs(float(y[1]) - 1.0) < 0.01  # ~quadratic near 0
    assert float(y[2]) <= 100.0**2 + 1  # saturates at sigma^2


def test_smplify_recovers_perturbed_pose():
    """Generate GT keypoints from a known pose, perturb the init, and check
    the fit reduces keypoint error."""
    body = make_test_body(num_joints=4, segments_per_bone=3, ring=8)
    F = 3
    rng = np.random.RandomState(0)
    gt_pose = (rng.randn(F, (body.num_joints - 1) * 3) * 0.2).astype(np.float32)
    gt = {
        "betas": jnp.zeros((F, body.num_betas)),
        "body_pose": jnp.asarray(gt_pose),
        "global_orient": jnp.zeros((F, 3)),
        "transl": jnp.asarray(np.tile([[0.0, -0.4, -2.0]], (F, 1)).astype(np.float32)),
    }
    out = smplx_forward(body, gt)
    joint_map = np.arange(body.num_joints)
    joints = np.asarray(out.joints)  # [F, J, 3]

    W = H = 256
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
    Ks = np.tile(K[None], (F, 1, 1))
    w2c = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)  # OpenCV-style

    pc = np.einsum("ij,fkj->fki", w2c[:3], np.concatenate(
        [joints, np.ones_like(joints[..., :1])], -1))
    pix = np.einsum("fij,fkj->fki", Ks, pc)
    pix = pix[..., :2] / pix[..., 2:]
    target = np.concatenate(
        [pix / [W, H], np.ones_like(pix[..., :1])], -1
    ).astype(np.float32)

    init = dict(gt)
    init["body_pose"] = gt["body_pose"] + 0.25 * jnp.asarray(
        rng.randn(F, (body.num_joints - 1) * 3).astype(np.float32)
    )

    def kp_err(params):
        o = smplx_forward(body, params)
        j = np.asarray(o.joints)
        pc = np.einsum("ij,fkj->fki", w2c[:3], np.concatenate(
            [j, np.ones_like(j[..., :1])], -1))
        px = np.einsum("fij,fkj->fki", Ks, pc)
        px = px[..., :2] / px[..., 2:]
        return float(np.abs(px - pix).mean())

    err0 = kp_err(init)
    fitter = SMPLify(
        body,
        joint_map,
        SMPLifyConfig(body_steps=15, hand_steps=0, smooth_weight=0.0,
                      preserve_weight=0.1),
    )
    fitted = fitter.fit(init, jnp.asarray(Ks), jnp.asarray(w2c), target, (W, H))
    err1 = kp_err(fitted)
    assert err1 < err0 * 0.5, (err0, err1)
