"""Rotation / quaternion math (pure jnp).

Conventions
-----------
Quaternions are ``wxyz`` (scalar first), matching the reference rasterizer
(``cuda_rasterizer/forward.cu:141-156`` reads ``r=q.x, x=q.y, ...``) and
pytorch3d's ``quaternion_to_matrix``.  Rotation matrices are standard: columns
are the rotated basis vectors, so a surfel's normal is ``R[:, 2]``
(``utils/general_utils.py:198-233``, ``geometry/surfel_base.py:486-488`` in the
reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize with a gradient that is finite at x == 0.

    ``x / max(||x||, eps)`` has a NaN gradient at zero (d||x||/dx is 0/0);
    adding eps² under the sqrt keeps both value and gradient well-defined,
    which matters for masked-out pixels in image-space ops.
    """
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps * eps)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize quaternions along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion(s) -> 3x3 rotation matrix(es).

    Does NOT normalize its input: the reference kernel consumes pre-normalized
    quaternions and skips in-kernel normalization
    (``cuda_rasterizer/forward.cu:141-156``); callers normalize explicitly.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y),
            2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x),
            2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix(es) -> wxyz quaternion(s), w >= 0.

    Branchless variant of the standard Shepperd method: compute all four
    candidate quaternions and select the one seeded by the largest diagonal
    element (numerically safe under jit, unlike the if/else ladder).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four candidates, each valid when its pivot (1 + ...) is largest.
    qw = jnp.stack([1.0 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(cand), 4(wxyz)]

    pivots = jnp.stack(
        [1.0 + m00 + m11 + m22, 1.0 + m00 - m11 - m22,
         1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=cands.dtype)  # [..., 4]
    q = jnp.einsum("...c,...cw->...w", onehot, cands)
    q = quat_normalize(q)
    # Canonicalize sign (w >= 0) so round-trips are stable.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def batch_rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle vectors [..., 3] -> rotation matrices [..., 3, 3].

    Mirrors the smplx formulation (``utils/smplx/lbs.py:293-328``): angle is the
    norm of the (eps-shifted) vector, R = I + sin K + (1-cos) K².
    """
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(rot_vecs.shape[:-1] + (3, 3))
    ident = jnp.eye(3, dtype=rot_vecs.dtype)
    return ident + sin * K + (1.0 - cos) * (K @ K)


def rotmat_to_rotvec(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Matrix -> axis-angle, exact at every angle including pi.

    The naive log map (axis from the skew part / 2 sin(angle)) degenerates
    as angle -> pi because the skew part itself vanishes; a camera-facing
    person's ``global_orient`` is conventionally ~pi about x, so that
    failure mode corrupts real SMPLify inputs. Route through a unit
    quaternion instead: build all four diagonal-dominant quaternion
    candidates (each stable on its own region), select the numerically
    largest branchlessly, then ``2 * atan2(|v|, w)`` for the angle.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # 4x the squared quaternion components (clamped against rounding).
    comp2 = jnp.stack(
        [
            jnp.maximum(1.0 + tr, 0.0),
            jnp.maximum(1.0 + m00 - m11 - m22, 0.0),
            jnp.maximum(1.0 - m00 + m11 - m22, 0.0),
            jnp.maximum(1.0 - m00 - m11 + m22, 0.0),
        ],
        axis=-1,
    )
    S = 2.0 * jnp.sqrt(comp2 + eps)  # [..., 4]
    s_w, s_x, s_y, s_z = S[..., 0], S[..., 1], S[..., 2], S[..., 3]
    cands = jnp.stack(
        [
            jnp.stack(
                [0.25 * s_w, (m21 - m12) / s_w, (m02 - m20) / s_w, (m10 - m01) / s_w],
                axis=-1,
            ),
            jnp.stack(
                [(m21 - m12) / s_x, 0.25 * s_x, (m01 + m10) / s_x, (m02 + m20) / s_x],
                axis=-1,
            ),
            jnp.stack(
                [(m02 - m20) / s_y, (m01 + m10) / s_y, 0.25 * s_y, (m12 + m21) / s_y],
                axis=-1,
            ),
            jnp.stack(
                [(m10 - m01) / s_z, (m02 + m20) / s_z, (m12 + m21) / s_z, 0.25 * s_z],
                axis=-1,
            ),
        ],
        axis=-2,
    )  # [..., 4 candidates, 4 wxyz]
    pick = jnp.argmax(comp2, axis=-1)
    q = jnp.take_along_axis(cands, pick[..., None, None], axis=-2)[..., 0, :]
    q = q * jnp.sign(jnp.where(q[..., :1] == 0.0, 1.0, q[..., :1]))  # w >= 0
    # Double-where so the |v| -> 0 branch has a finite gradient (sqrt at 0
    # inside an unselected where branch still back-propagates NaN).
    v2 = jnp.sum(q[..., 1:] ** 2, axis=-1)
    small = v2 < 1e-12
    vnorm = jnp.sqrt(jnp.where(small, 1.0, v2))
    angle = 2.0 * jnp.arctan2(jnp.where(small, 0.0, vnorm), q[..., 0])
    # angle/|v| -> 2/w as |v| -> 0.
    scale = jnp.where(small, 2.0 / jnp.maximum(q[..., 0], 1e-6), angle / vnorm)
    return q[..., 1:] * scale[..., None]


def normal_to_rotmat(normals: jnp.ndarray, key=None) -> jnp.ndarray:
    """Build frames whose local z-axis (3rd column) equals ``normals``.

    Equivalent to the mesh-normal-aligned quaternion init
    (``utils/smpl.py:99-121`` ``init_qso_on_mesh``): pick an arbitrary tangent,
    orthonormalize.  Deterministic (uses a fixed helper axis) unless ``key`` is
    given for randomized tangents.
    """
    uz = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    if key is not None:
        helper = jax.random.normal(key, uz.shape, uz.dtype)
    else:
        # Fixed helper; switch axis where nearly parallel to the normal.
        h0 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], uz.dtype), uz.shape)
        h1 = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], uz.dtype), uz.shape)
        helper = jnp.where(jnp.abs(uz[..., :1]) > 0.9, h1, h0)
    ux = jnp.cross(uz, helper)
    ux = ux / jnp.maximum(jnp.linalg.norm(ux, axis=-1, keepdims=True), 1e-12)
    uy = jnp.cross(uz, ux)
    uy = uy / jnp.maximum(jnp.linalg.norm(uy, axis=-1, keepdims=True), 1e-12)
    return jnp.stack([ux, uy, uz], axis=-1)  # columns


def transform_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Pack rotation [..., 3, 3] and translation [..., 3] into [..., 4, 4]."""
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
