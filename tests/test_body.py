import jax
import jax.numpy as jnp
import numpy as np

from soar_tpu.body import BodyModel, lbs, make_test_body
from soar_tpu.body.model import smplx_forward
from soar_tpu.body.skinning import (
    knn_idw_weights,
    make_skinning_data,
    mean_knn_sq_dist,
    point_skinning_mats,
    apply_point_mats,
)


def test_lbs_rest_pose_identity():
    body = make_test_body()
    B = 1
    out = lbs(
        body,
        jnp.zeros((B, body.num_betas)),
        jnp.zeros((B, body.num_joints * 3)),
    )
    np.testing.assert_allclose(out.vertices[0], body.v_template, atol=1e-5)
    # Rest-pose affines are identity.
    np.testing.assert_allclose(
        out.A[0], np.tile(np.eye(4), (body.num_joints, 1, 1)), atol=1e-5
    )


def test_lbs_two_joint_chain_rotation():
    """Hand-computed check: rotating joint 1 by 90deg about z pivots everything
    above joint 1 around its rest location."""
    body = make_test_body(num_joints=3, segments_per_bone=2, ring=4)
    pose = np.zeros((1, body.num_joints * 3), np.float32)
    pose[0, 3 + 2] = np.pi / 2  # joint 1, z-axis
    out = lbs(body, jnp.zeros((1, body.num_betas)), jnp.asarray(pose))

    rest = lbs(
        body,
        jnp.zeros((1, body.num_betas)),
        jnp.zeros((1, body.num_joints * 3)),
    )
    j1 = np.asarray(rest.joints[0, 1])
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)

    # Joint 2 should move to j1 + Rz @ (j2_rest - j1).
    j2_rest = np.asarray(rest.joints[0, 2])
    expected = j1 + Rz @ (j2_rest - j1)
    np.testing.assert_allclose(out.joints[0, 2], expected, atol=1e-4)

    # A[1] should equal the affine x -> j1 + Rz (x - j1) (posedirs are tiny
    # but nonzero in the fixture, hence loose-ish tolerance on verts only).
    A1 = np.asarray(out.A[0, 1])
    np.testing.assert_allclose(A1[:3, :3], Rz, atol=1e-5)
    np.testing.assert_allclose(A1[:3, 3], j1 - Rz @ j1, atol=1e-5)


def test_lbs_translation_baked_into_A():
    body = make_test_body()
    t = jnp.array([[0.3, -0.2, 0.75]])
    out = lbs(
        body,
        jnp.zeros((1, body.num_betas)),
        jnp.zeros((1, body.num_joints * 3)),
        transl=t,
    )
    np.testing.assert_allclose(
        out.vertices[0], body.v_template + t[0], atol=1e-5
    )
    np.testing.assert_allclose(out.A[0, :, :3, 3], np.tile(t, (body.num_joints, 1)), atol=1e-5)


def test_smplx_forward_param_dict():
    body = make_test_body()
    params = {
        "betas": jnp.zeros((1, body.num_betas)),
        "global_orient": jnp.zeros((1, 3)),
        "body_pose": jnp.zeros((1, (body.num_joints - 1) * 3)),
        "transl": jnp.array([[0.0, 0.1, 0.0]]),
    }
    out = smplx_forward(body, params)
    assert out.vertices.shape == (1, body.num_verts, 3)
    assert out.A.shape == (1, body.num_joints, 4, 4)


def test_smplx_pose_mean_added():
    """SMPL-X under flat_hand_mean=False adds the MANO hand means to the
    full pose (``body_models.py:1321`` full_pose += pose_mean): a zero hand
    pose must articulate like an explicit pose equal to the mean."""
    body = make_test_body()
    rng = np.random.RandomState(0)
    pm = (rng.randn(body.num_joints * 3) * 0.1).astype(np.float32)
    body_pm = body._replace(pose_mean=jnp.asarray(pm))

    params = {
        "betas": jnp.zeros((1, body.num_betas)),
        "global_orient": jnp.zeros((1, 3)),
        "body_pose": jnp.zeros((1, (body.num_joints - 1) * 3)),
    }
    out_mean = smplx_forward(body_pm, params)
    explicit = {
        "betas": params["betas"],
        "global_orient": pm[None, :3],
        "body_pose": pm[None, 3:],
    }
    out_explicit = smplx_forward(body, explicit)
    np.testing.assert_allclose(
        np.asarray(out_mean.vertices),
        np.asarray(out_explicit.vertices),
        atol=1e-5,
    )
    # No pose_mean (SMPL / test body): zero pose stays the rest pose.
    out_rest = smplx_forward(body, params)
    np.testing.assert_allclose(
        np.asarray(out_rest.vertices),
        np.asarray(body.v_template)[None],
        atol=1e-5,
    )


def test_smplx_forward_batch_from_orient_only():
    """Batch size must come from ANY batched param (review finding: it was
    inferred only from betas/body_pose, crashing on batched global_orient
    with unbatched everything-else)."""
    body = make_test_body()
    params = {
        "betas": jnp.zeros((1, body.num_betas)),
        "global_orient": jnp.zeros((4, 3)),
    }
    out = smplx_forward(body, params)
    assert out.vertices.shape[0] == 4
    # Mixed: one batched segment, the rest provided-but-unbatched — every
    # unbatched segment must broadcast, not crash in reshape (review repro).
    params_mixed = {
        "betas": jnp.zeros((1, body.num_betas)),
        "global_orient": jnp.zeros((1, 3)),
        "body_pose": jnp.zeros((4, (body.num_joints - 1) * 3)),
        "transl": jnp.ones((1, 3)),
    }
    out_m = smplx_forward(body, params_mixed)
    assert out_m.vertices.shape[0] == 4
    np.testing.assert_allclose(
        np.asarray(out_m.vertices[0]), np.asarray(out_m.vertices[1]), atol=0
    )
    # Unbatched 1-D pose vectors must not be mistaken for a batch axis.
    params2 = {
        "betas": jnp.zeros((1, body.num_betas)),
        "body_pose": jnp.zeros(((body.num_joints - 1) * 3,)),
    }
    out2 = smplx_forward(body, params2)
    assert out2.vertices.shape[0] == 1
    # ... nor unbatched PER-JOINT [k, 3] matrices (the standard smplx
    # layout): one body, not k bodies (review repro).
    params3 = {
        "betas": jnp.zeros((1, body.num_betas)),
        "body_pose": jnp.zeros((body.num_joints - 1, 3)),
        "global_orient": jnp.zeros((1, 3)),
    }
    out3 = smplx_forward(body, params3)
    assert out3.vertices.shape[0] == 1


def _smplx55_body():
    """A shape-realistic 55-joint SMPL-X-layout body (tiny vert count)."""
    from soar_tpu.body.model import BodyModel

    rng = np.random.RandomState(3)
    J, V = 55, 60
    parents = [-1] + [rng.randint(0, j) for j in range(1, J)]
    return BodyModel(
        v_template=jnp.asarray(rng.randn(V, 3).astype(np.float32)),
        shapedirs=jnp.asarray(rng.randn(V, 3, 10).astype(np.float32) * 0.01),
        posedirs=jnp.zeros(((J - 1) * 9, V * 3)),
        J_regressor=jnp.asarray(
            (np.eye(J, V) / 1.0).astype(np.float32)
        ),
        lbs_weights=jax.nn.softmax(
            jnp.asarray(rng.randn(V, J).astype(np.float32)), -1
        ),
        parents=tuple(parents),
        faces=jnp.zeros((1, 3), jnp.int32),
        num_betas=10,
    )


def test_smplx_full_tail_body_pose():
    """canonical_pose_params emits body_pose = full[:, 3:] covering ALL
    J-1 non-root joints (162 values for J=55); assemble must accept it —
    the real-SMPL-X avatar-init path crashed on this (review repro)."""
    from soar_tpu.body.model import assemble_smplx_pose, smplx_forward

    body = _smplx55_body()
    full_tail = jnp.arange((55 - 1) * 3, dtype=jnp.float32)[None] * 0.001
    params = {
        "betas": jnp.zeros((1, 10)),
        "global_orient": jnp.zeros((1, 3)),
        "body_pose": full_tail,
        "transl": jnp.zeros((1, 3)),
    }
    fp = assemble_smplx_pose(params, 1, 55)
    assert fp.shape == (1, 165)
    np.testing.assert_allclose(np.asarray(fp[0, 3:]), np.asarray(full_tail[0]))
    out = smplx_forward(body, params)
    assert out.vertices.shape[0] == 1
    # Segmented layout still works and batches from a hand pose alone.
    seg = {
        "betas": jnp.zeros((1, 10)),
        "body_pose": jnp.zeros((1, 63)),
        "left_hand_pose": jnp.zeros((4, 45)),
    }
    out_seg = smplx_forward(body, seg)
    assert out_seg.vertices.shape[0] == 4
    # A standard [B, 63] body_pose whose batch is a multiple of 18 has
    # size divisible by 162 — layout must be judged per-item (trailing
    # shape), not by total-size divisibility (review repro: an 18/36/90-
    # frame capture batch crashed in the full-tail reshape).
    b18 = {
        "betas": jnp.zeros((1, 10)),
        "global_orient": jnp.zeros((18, 3)),
        "body_pose": jnp.zeros((18, 63)),
        "transl": jnp.zeros((18, 3)),
    }
    out18 = smplx_forward(body, b18)
    assert out18.vertices.shape[0] == 18
    fp18 = assemble_smplx_pose(b18, 18, 55)
    assert fp18.shape == (18, 165)
    # ...and the per-joint [B, 54, 3] full-tail form still routes full-tail.
    tail3d = dict(b18, body_pose=jnp.zeros((18, 54, 3)))
    assert assemble_smplx_pose(tail3d, 18, 55).shape == (18, 165)


def test_knn_idw_weights_matches_bruteforce():
    key = jax.random.PRNGKey(0)
    verts = jax.random.normal(key, (200, 3))
    w_ref = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (200, 5)))
    pts = jax.random.normal(jax.random.PRNGKey(2), (50, 3)) * 0.5

    K = 7
    got = knn_idw_weights(pts, verts, w_ref, k=K)

    # numpy brute force mirroring utils/smpl.py:617-637
    P, V = np.asarray(pts), np.asarray(verts)
    d2 = ((P[:, None] - V[None]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :K]
    dist = np.clip(np.sqrt(np.take_along_axis(d2, idx, 1)), 1e-4, 1.0)
    ws = 1.0 / dist
    ws = ws / ws.sum(-1, keepdims=True)
    expected = (ws[..., None] * np.asarray(w_ref)[idx]).sum(-2)
    np.testing.assert_allclose(got, expected, atol=1e-4)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-4)


def test_mean_knn_sq_dist_grid():
    # Unit-spaced 1D lattice: the 3 nearest others are at distances 1, 1, 2.
    pts = jnp.stack(
        [jnp.arange(10.0), jnp.zeros(10), jnp.zeros(10)], axis=-1
    )
    d2 = mean_knn_sq_dist(pts, k=3)
    # Interior points: (1 + 1 + 4) / 3 = 2.
    np.testing.assert_allclose(d2[2:8], 2.0, atol=1e-5)


def test_point_skinning_rigid_consistency():
    """Skinning with weights=onehot(j) must reproduce A_live @ A_cano^-1."""
    body = make_test_body()
    cano_pose = np.zeros((1, body.num_joints * 3), np.float32)
    cano_pose[0, 5] = 0.3  # some canonical pose
    cano = lbs(body, jnp.zeros((1, body.num_betas)), jnp.asarray(cano_pose))

    live_pose = np.zeros((1, body.num_joints * 3), np.float32)
    live_pose[0, 3:6] = [0.2, -0.4, 0.1]
    live = lbs(body, jnp.zeros((1, body.num_betas)), jnp.asarray(live_pose))

    pts = cano.vertices[0][:16]
    skin = make_skinning_data(
        body.lbs_weights, cano.A[0], cano.vertices[0], pts, k=4
    )
    mats = point_skinning_mats(skin, live.A[0])
    posed = apply_point_mats(mats, pts)
    assert posed.shape == (16, 3)

    # One-hot check for joint 1.
    onehot = jnp.zeros((1, body.num_joints)).at[0, 1].set(1.0)
    skin1 = skin._replace(point_weights=onehot)
    m1 = point_skinning_mats(skin1, live.A[0])[0]
    expected = np.asarray(live.A[0, 1]) @ np.linalg.inv(np.asarray(cano.A[0, 1]))
    np.testing.assert_allclose(m1, expected, atol=1e-4)


def test_vertex_normals_point_outward():
    """Regression: bincount weight alignment + consistent tube winding."""
    from soar_tpu.body.template import vertex_normals

    body = make_test_body(num_joints=4, segments_per_bone=3, ring=8)
    v, f = np.asarray(body.v_template), np.asarray(body.faces)
    vn = vertex_normals(v, f)
    radial = v.copy()
    radial[:, 1] = 0.0  # outward = away from the tube's +y axis
    frac_outward = (np.sum(vn * radial, axis=1) > 0).mean()
    assert frac_outward > 0.99, frac_outward


def test_template_subdivision_counts():
    from soar_tpu.body.template import subdivide_n, init_qso_on_mesh

    body = make_test_body()
    v, f = np.asarray(body.v_template), np.asarray(body.faces)
    v2, f2 = subdivide_n(v, f, 2)
    assert len(f2) == len(f) * 16
    q, s, o = init_qso_on_mesh(v2, f2)
    assert q.shape == (len(v2), 4) and s.shape == (len(v2), 3)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-4)
