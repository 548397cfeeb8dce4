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


# ---------------------------------------------------------------------------
# Full SMPL-X -> OpenPose-137 mapping (vertex landmarks + face + contour)


def _with_landmark_tables(body, seed=3):
    """Fabricate landmark tables on a procedural 55-joint body: the mapping
    machinery (selector indices, barycentric interpolation, dynamic-contour
    LUT) is exercised without the proprietary SMPL-X npz."""
    rng = np.random.RandomState(seed)
    V = body.num_verts
    Fc = body.faces.shape[0]
    bary = rng.rand(51, 3).astype(np.float32)
    bary /= bary.sum(-1, keepdims=True)
    dyn_bary = rng.rand(79, 17, 3).astype(np.float32)
    dyn_bary /= dyn_bary.sum(-1, keepdims=True)
    return body._replace(
        extra_joint_idxs=jnp.asarray(rng.randint(0, V, 21), jnp.int32),
        lmk_faces_idx=jnp.asarray(rng.randint(0, Fc, 51), jnp.int32),
        lmk_bary_coords=jnp.asarray(bary),
        dyn_lmk_faces_idx=jnp.asarray(rng.randint(0, Fc, (79, 17)), jnp.int32),
        dyn_lmk_bary_coords=jnp.asarray(dyn_bary),
    )


def test_vertices2landmarks_matches_numpy():
    from soar_tpu.body.model import vertices2landmarks

    rng = np.random.RandomState(0)
    verts = rng.randn(2, 30, 3).astype(np.float32)
    faces = rng.randint(0, 30, (40, 3)).astype(np.int32)
    lidx = rng.randint(0, 40, 7).astype(np.int32)
    bary = rng.rand(7, 3).astype(np.float32)
    got = np.asarray(
        vertices2landmarks(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(lidx),
            jnp.asarray(bary),
        )
    )
    want = np.zeros((2, 7, 3), np.float32)
    for b in range(2):
        for l in range(7):
            tri = verts[b, faces[lidx[l]]]  # [3, 3]
            want[b, l] = bary[l] @ tri
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_neck_y_bucket_reference_semantics():
    """Bucket index = round(clamp(-y_euler_deg, max 39)) with the negative
    branch remap (39 - y for y in [-39, 0), 78 below; smplx lbs.py:91-99)."""
    from soar_tpu.body.model import _neck_y_bucket

    body = make_test_body(num_joints=55, segments_per_bone=1, ring=4)
    J = body.num_joints

    def bucket_for(theta_deg):
        pose = np.zeros((1, J * 3), np.float32)
        pose[0, 12 * 3 + 1] = np.deg2rad(theta_deg)  # neck y rotation
        return int(_neck_y_bucket(jnp.asarray(pose), body.parents)[0])

    assert bucket_for(0.0) == 0
    assert bucket_for(-20.0) == 20  # looking one way: bucket = -y = 20
    assert bucket_for(20.0) == 39 + 20  # negative branch: 39 - (-20)
    assert bucket_for(60.0) == 78  # below -39: pinned to row 78
    assert bucket_for(-60.0) == 39  # clamp max=39


def test_convert_kps_137_matches_reference_math():
    from soar_tpu.preproc.smplify import convert_kps_137, smplx_to_openpose137

    src, dst, mask = smplx_to_openpose137()
    assert len(src) == len(dst) == 123
    assert mask.shape == (137,)
    assert mask.sum() == 123.0
    rng = np.random.RandomState(1)
    j144 = rng.randn(2, 144, 3).astype(np.float32)

    got = np.asarray(
        convert_kps_137(jnp.asarray(j144), jnp.asarray(src), jnp.asarray(dst))
    )

    want = np.zeros((2, 137, 3), np.float32)
    want[:, dst] = j144[:, src]
    want[:, 8] = 0.5 * (want[:, 9] + want[:, 12])
    hips = want[:, [9, 12], :2].copy()
    swap = want[:, [12, 9], :2].copy()
    want[:, [9, 12], :2] = (
        hips
        + 0.25 * (hips - swap)
        + 0.5 * (want[:, [8], :2] - 0.5 * (hips + swap))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    # The scatter covers every unmasked column.
    assert set(dst) == {i for i in range(137) if mask[i] == 1.0}


def test_smplify_openpose137_recovers_perturbed_pose():
    """Fit against FULL 137-column targets (incl. vertex-landmark feet,
    fingertips, face landmarks, dynamic contour) generated from a known
    pose: the landmark columns must carry usable gradients."""
    from soar_tpu.body.model import smplx_forward_full
    from soar_tpu.preproc.smplify import convert_kps_137, smplx_to_openpose137

    body = _with_landmark_tables(
        make_test_body(num_joints=55, segments_per_bone=1, ring=4)
    )
    src, dst, mask = smplx_to_openpose137()
    F = 2
    rng = np.random.RandomState(0)
    gt_pose = (rng.randn(F, 21 * 3) * 0.05).astype(np.float32)
    # The 55-joint procedural chain is ~13.75 units tall: center it and
    # back the camera off far enough that all keypoints project in-frame
    # (an ill-conditioned projection swamps the fit signal).
    gt = {
        "betas": jnp.zeros((F, body.num_betas)),
        "body_pose": jnp.asarray(gt_pose),
        "global_orient": jnp.zeros((F, 3)),
        "transl": jnp.asarray(
            np.tile([[0.0, -7.0, -40.0]], (F, 1)).astype(np.float32)
        ),
    }

    W = H = 256
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
    Ks = np.tile(K[None], (F, 1, 1))
    w2c = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)

    def project137(params):
        _, j144 = smplx_forward_full(body, params)
        kps = np.asarray(
            convert_kps_137(j144, jnp.asarray(src), jnp.asarray(dst))
        )
        pc = np.einsum(
            "ij,fkj->fki", w2c[:3],
            np.concatenate([kps, np.ones_like(kps[..., :1])], -1),
        )
        px = np.einsum("fij,fkj->fki", Ks, pc)
        # Masked columns stay at the (0,0,0) scatter default; clamp like the
        # production loss so they project to a finite dummy instead of 0/0.
        return px[..., :2] / np.maximum(px[..., 2:], 1e-5)

    pix = project137(gt)
    target = np.concatenate(
        [pix / [W, H], np.ones_like(pix[..., :1])], -1
    ).astype(np.float32)

    init = dict(gt)
    init["body_pose"] = gt["body_pose"] + 0.1 * jnp.asarray(
        rng.randn(F, 21 * 3).astype(np.float32)
    )

    def kp_err(params):
        return float(
            (np.abs(project137(params) - pix) * mask[None, :, None]).mean()
        )

    err0 = kp_err(init)
    fitter = SMPLify(
        body,
        cfg=SMPLifyConfig(body_steps=15, hand_steps=0, smooth_weight=0.0,
                          preserve_weight=0.1),
        hand_kp_slice=(25, 67),
        openpose137=True,
    )
    fitted = fitter.fit(init, jnp.asarray(Ks), jnp.asarray(w2c), target, (W, H))
    err1 = kp_err(fitted)
    assert err1 < err0 * 0.5, (err0, err1)
