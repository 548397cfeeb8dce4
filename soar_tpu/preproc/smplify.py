"""SMPLify: keypoint-based SMPL-X parameter refinement in JAX.

Rebuild of the reference refiner (``preproc/utils.py:593-982``): optimize 6D
joint rotations + translation + (frame-averaged) betas against 2D keypoints
with an L-BFGS (strong-Wolfe zoom linesearch via ``optax.lbfgs``) in two
stages — body only (20 steps, hands ignored), then body+hands (40 steps).

Losses (``preproc/utils.py:638-683``):
- GMoF-robustified keypoint reprojection, scale-normalized to 200px, x100
- preserve-to-initialization L2, x60
- temporal smoothness: geodesic distance between consecutive frame rotations,
  x10000

TPU-first: ALL frames are optimized jointly as one batched jitted problem
(the reference also batches frames; its LBFGS closure re-launches per step).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..body.model import BodyModel, smplx_forward
from ..core.transforms import rotmat_to_rotvec  # noqa: F401  (re-export:
# historical home of the hardened log map; tests + callers import it here)


# --- rotation parameterizations (``preproc/utils.py:156-167``) -------------


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    return R[..., :2, :].reshape(R.shape[:-2] + (6,))


def gmof(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman-McClure robustifier (``preproc/utils.py:135-139``)."""
    x2 = x * x
    s2 = sigma * sigma
    return s2 * x2 / (s2 + x2)


def smooth_loss_6d(d6: jnp.ndarray) -> jnp.ndarray:
    """Geodesic distance between consecutive frames' rotations
    (``preproc/utils.py:149-152``).  d6: [F, J*6] (or [F, 6])."""
    R = rotation_6d_to_matrix(d6.reshape(d6.shape[0], -1, 6))
    R12 = jnp.einsum("fjab,fjcb->fjac", R[1:], R[:-1])
    return jnp.mean(jnp.sum(rotmat_to_rotvec(R12) ** 2, axis=-1))


def target_scales_from_kps(target_kps_px: np.ndarray) -> np.ndarray:
    """Per-frame keypoint bbox extent (``preproc/utils.py:170-178``)."""
    scales = []
    for frame in target_kps_px:
        valid = frame[frame[:, -1] > 0.3]
        if len(valid) == 0:
            scales.append(1.0)
            continue
        ext = valid[:, :2].max(0) - valid[:, :2].min(0)
        scales.append(float(max(ext[0], ext[1])))
    return np.asarray(scales, np.float32)


@dataclasses.dataclass(frozen=True)
class SMPLifyConfig:
    body_steps: int = 20
    hand_steps: int = 40
    kp_weight: float = 100.0
    preserve_weight: float = 60.0
    smooth_weight: float = 10000.0
    sigma: float = 100.0


_POSE_KEYS = ("body_pose", "global_orient", "left_hand_pose", "right_hand_pose")


def _to_6d(params: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    from ..core.transforms import batch_rodrigues

    out = {}
    for k, v in params.items():
        if k in _POSE_KEYS:
            aa = v.reshape(v.shape[0], -1, 3)
            out[k] = matrix_to_rotation_6d(batch_rodrigues(aa)).reshape(
                v.shape[0], -1
            )
        elif k == "betas":
            out[k] = jnp.mean(jnp.atleast_2d(v), axis=0, keepdims=True)
        else:
            out[k] = v
    return out


def _to_axis_angle(params6: Dict[str, jnp.ndarray], n_frames: int):
    out = {}
    for k, v in params6.items():
        if k in _POSE_KEYS:
            R = rotation_6d_to_matrix(v.reshape(v.shape[0], -1, 6))
            out[k] = rotmat_to_rotvec(R).reshape(v.shape[0], -1)
        elif k == "betas":
            out[k] = jnp.broadcast_to(v, (n_frames, v.shape[-1]))
        else:
            out[k] = v
    return out


class SMPLify:
    """Two-stage keypoint refinement.

    Args:
        body: the body model.
        joint_map: [K] indices selecting model joints corresponding to the
            target keypoints' columns (the kinematic-joint reduction; see
            :func:`smplx_to_openpose25`).  Ignored when ``openpose137``.
        hand_kp_slice: (start, end) of hand keypoints in the target columns
            to zero during stage 1 (``kp_confs[:, 25:-70] = 0``).
        openpose137: use the reference's FULL SMPL-X -> OpenPose-137
            mapping (``preproc/utils.py:180-592``): the 144-joint output
            (vertex landmarks + face landmarks + dynamic contour), the
            scatter mapping with mid-hip synthesis and hip widening, and
            the 137-column validity mask.  Requires the body's landmark
            tables (:func:`soar_tpu.body.model.load_smplx_npz`).
    """

    def __init__(
        self,
        body: BodyModel,
        joint_map: Optional[np.ndarray] = None,
        cfg: SMPLifyConfig = SMPLifyConfig(),
        hand_kp_slice: Optional[Tuple[int, int]] = None,
        openpose137: bool = False,
    ):
        self.body = body
        self.joint_map = (
            None if joint_map is None else jnp.asarray(joint_map, jnp.int32)
        )
        self.cfg = cfg
        self.hand_kp_slice = hand_kp_slice
        self.openpose137 = openpose137
        self.kp_mask = None
        if openpose137:
            src, dst, mask = smplx_to_openpose137()
            self._src = jnp.asarray(src, jnp.int32)
            self._dst = jnp.asarray(dst, jnp.int32)
            self.kp_mask = jnp.asarray(mask, jnp.float32)
        elif joint_map is None:
            raise ValueError("need joint_map unless openpose137=True")

    def _loss(
        self,
        opt6,  # optimized 6D params (dict)
        fixed6,  # non-optimized params (dict)
        init6,
        Ks,
        w2c,
        target_kps_px,  # [F, K, 3] (x px, y px, conf)
        target_scales,  # [F]
        ignore_hands: bool,
    ):
        params6 = {**fixed6, **opt6}
        n_frames = Ks.shape[0]
        aa = _to_axis_angle(params6, n_frames)
        if self.openpose137:
            from ..body.model import smplx_forward_full

            _, j144 = smplx_forward_full(self.body, aa)
            pred = convert_kps_137(j144, self._src, self._dst)  # [F, 137, 3]
        else:
            out = smplx_forward(self.body, aa)
            joints = out.joints[:, : self.body.num_joints]
            pred = joints[:, self.joint_map]  # [F, K, 3]

        ones = jnp.ones_like(pred[..., :1])
        pred_c = jnp.einsum(
            "ij,fkj->fki", w2c[:3], jnp.concatenate([pred, ones], -1)
        )
        pix = jnp.einsum("fij,fkj->fki", Ks, pred_c)
        pix = pix[..., :2] / jnp.maximum(pix[..., 2:], 1e-5)

        conf = target_kps_px[..., 2:]
        if self.kp_mask is not None:
            conf = conf * self.kp_mask[None, :, None]
        if ignore_hands and self.hand_kp_slice is not None:
            s, e = self.hand_kp_slice
            conf = conf.at[:, s:e].set(0.0)
        resid = (pix - target_kps_px[..., :2]) / target_scales[:, None, None] * 200.0
        kp_loss = jnp.mean(gmof(resid, self.cfg.sigma) * conf)

        # eps-safe norm: params == init at stage start and the exact L2 norm
        # has a NaN gradient at 0.
        preserve = sum(
            jnp.mean(
                jnp.sqrt(jnp.sum((params6[k] - init6[k]) ** 2, -1) + 1e-12)
            )
            for k in params6
        )
        smooth = sum(
            smooth_loss_6d(params6[k]) for k in _POSE_KEYS if k in params6
        )
        return (
            self.cfg.kp_weight * kp_loss
            + self.cfg.preserve_weight * preserve
            + self.cfg.smooth_weight * smooth
        )

    def _run_stage(self, opt6, fixed6, init6, aux, steps, ignore_hands):
        loss_fn = lambda p: self._loss(
            p, fixed6, init6, *aux, ignore_hands=ignore_hands
        )
        opt = optax.lbfgs()
        value_and_grad = optax.value_and_grad_from_state(loss_fn)

        @jax.jit
        def step(params, state):
            value, grad = value_and_grad(params, state=state)
            updates, state = opt.update(
                grad, state, params, value=value, grad=grad, value_fn=loss_fn
            )
            params = optax.apply_updates(params, updates)
            return params, state, value

        state = opt.init(opt6)
        value = None
        for _ in range(steps):
            opt6, state, value = step(opt6, state)
        return opt6, value

    def fit(
        self,
        init_params: Dict[str, jnp.ndarray],  # axis-angle, per-frame
        Ks: jnp.ndarray,  # [F, 3, 3]
        w2c: jnp.ndarray,  # [4, 4]
        target_kps: np.ndarray,  # [F, K, 3] normalized (x, y in [0,1], conf)
        img_wh: Tuple[int, int],
    ) -> Dict[str, jnp.ndarray]:
        target_px = np.concatenate(
            [
                np.asarray(target_kps[..., :2]) * np.asarray(img_wh, np.float32),
                np.asarray(target_kps[..., 2:]),
            ],
            axis=-1,
        ).astype(np.float32)
        scales = target_scales_from_kps(target_px)
        aux = (
            jnp.asarray(Ks),
            jnp.asarray(w2c),
            jnp.asarray(target_px),
            jnp.asarray(scales),
        )

        params6 = _to_6d({k: jnp.asarray(v) for k, v in init_params.items()})
        init6 = jax.tree_util.tree_map(jnp.copy, params6)

        stage1_keys = ("betas", "body_pose", "global_orient", "transl")
        opt6 = {k: params6[k] for k in stage1_keys if k in params6}
        fixed6 = {k: v for k, v in params6.items() if k not in opt6}
        opt6, _ = self._run_stage(
            opt6, fixed6, init6, aux, self.cfg.body_steps, ignore_hands=True
        )
        params6 = {**fixed6, **opt6}

        stage2_keys = stage1_keys + ("left_hand_pose", "right_hand_pose")
        opt6 = {k: params6[k] for k in stage2_keys if k in params6}
        fixed6 = {k: v for k, v in params6.items() if k not in opt6}
        opt6, final = self._run_stage(
            opt6, fixed6, init6, aux, self.cfg.hand_steps, ignore_hands=False
        )
        params6 = {**fixed6, **opt6}

        n_frames = int(Ks.shape[0])
        return _to_axis_angle(params6, n_frames)


def smplx_to_openpose137():
    """``(src_inds, dst_inds, kp_mask)`` of the reference's full SMPL-X ->
    OpenPose-137 keypoint mapping (numeric mapping data transcribed from
    ``/root/reference/preproc/utils.py:180-592``).

    ``src_inds`` index the smplx 144-joint output
    (:func:`soar_tpu.body.model.smplx_forward_full`), ``dst_inds`` the
    OpenPose-137 columns ([25 body, 21 L hand, 21 R hand, 70 face]);
    ``kp_mask`` zeroes the columns SMPL-X cannot represent (the duplicate
    hand-wrist columns 25/46, the 10 jawline-contour points 84-93 beyond
    smplx's 17-point contour, and the eye pupils 135/136)."""
    # fmt: off
    src = [
        55, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,        # body
        56, 57, 58, 59, 60, 61, 62, 63, 64, 65,                     # face/feet
        37, 38, 39, 66, 25, 26, 27, 67, 28, 29, 30, 68,             # L hand
        34, 35, 36, 69, 31, 32, 33, 70,
        52, 53, 54, 71, 40, 41, 42, 72, 43, 44, 45, 73,             # R hand
        49, 50, 51, 74, 46, 47, 48, 75,
        127, 128, 129, 130, 131, 132, 133, 134, 135, 136, 137, 138,  # contour
        139, 140, 141, 142, 143,
        86, 87, 88, 89, 90, 91, 92, 93, 94, 95, 96, 97, 98, 99,     # face 51
        100, 101, 102, 103, 104, 105, 106, 107, 108, 109, 110, 111,
        112, 113, 114, 115, 116, 117, 118, 119, 120, 121, 122, 123,
        124, 125, 126,
    ]
    dst = [
        0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
        15, 16, 17, 18, 19, 20, 21, 22, 23, 24,
        26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37,
        38, 39, 40, 41, 42, 43, 44, 45,
        47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
        59, 60, 61, 62, 63, 64, 65, 66,
        67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 77, 78,
        79, 80, 81, 82, 83,
        94, 95, 96, 97, 98, 99, 100, 101, 102, 103, 104, 105, 106,
        107, 108, 109, 110, 111, 112, 113, 114, 115, 116, 117, 118,
        119, 120, 121, 122, 123, 124, 125, 126, 127, 128, 129, 130,
        131, 132, 133, 134,
    ]
    # fmt: on
    mask = np.ones(137, np.float32)
    mask[[25, 46, 84, 85, 86, 87, 88, 89, 90, 91, 92, 93, 135, 136]] = 0.0
    return (
        np.asarray(src, np.int64),
        np.asarray(dst, np.int64),
        mask,
    )


def convert_kps_137(
    j144: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray
) -> jnp.ndarray:
    """[F, 144, 3] smplx joints -> [F, 137, 3] OpenPose columns, with the
    reference's mid-hip synthesis (col 8 = mean of hips) and hip WIDENING
    (cols 9/12 pushed outward in x/y: +-0.25 of the hip-to-hip vector plus
    re-centering on the mid-hip; ``preproc/utils.py:574-589``).  Applied to
    3D joints BEFORE projection, exactly like the reference."""
    F = j144.shape[0]
    new = jnp.zeros((F, 137, 3), j144.dtype)
    new = new.at[:, dst].set(j144[:, src])
    mid = 0.5 * (new[:, 9] + new[:, 12])
    new = new.at[:, 8].set(mid)
    hips = new[:, jnp.asarray([9, 12]), :2]
    swapped = new[:, jnp.asarray([12, 9]), :2]
    adj = (
        hips
        + 0.25 * (hips - swapped)
        + 0.5 * (mid[:, None, :2] - 0.5 * (hips + swapped))
    )
    new = new.at[:, jnp.asarray([9, 12]), :2].set(adj)
    return new


def smplx_to_openpose25() -> np.ndarray:
    """Model-joint indices for the OpenPose BODY_25 columns, using SMPL-X
    kinematic joints only (reference additionally uses vertex landmarks via
    smplx's VertexJointSelector, ``preproc/utils.py:180-592``; nose/eye/ear/
    toe columns here reuse the head/foot joints, which the confidence
    weighting tolerates)."""
    return np.asarray(
        [
            15,  # nose -> head
            12,  # neck
            17, 19, 21,  # R shoulder, elbow, wrist
            16, 18, 20,  # L shoulder, elbow, wrist
            0,  # mid hip -> pelvis
            2, 5, 8,  # R hip, knee, ankle
            1, 4, 7,  # L hip, knee, ankle
            15, 15, 15, 15,  # eyes/ears -> head
            10, 10, 7,  # L toe, toe, heel -> L foot/ankle
            11, 11, 8,  # R toe, toe, heel -> R foot/ankle
        ],
        np.int64,
    )


def smplx_to_openpose_hands() -> np.ndarray:
    """Model-joint indices for the OpenPose hand-21 columns (left then
    right), matching :func:`load_keypoints`' [25 body, 21 L, 21 R, 70 face]
    stacking. OpenPose hand layout per hand: wrist, then 4 points per finger
    (thumb, index, middle, ring, pinky) ending at the tip. SMPL-X kinematic
    joints 25-39 (left) / 40-54 (right) are finger joints 1..3 per finger in
    (index, middle, pinky, ring, thumb) order; fingertips are vertex
    landmarks in the reference (VertexJointSelector) and reuse the distal
    joint here, which the confidence weighting tolerates (same reduction as
    the nose/ear columns in :func:`smplx_to_openpose25`)."""
    left = [
        20,              # wrist
        37, 38, 39, 39,  # thumb 1..3 + tip
        25, 26, 27, 27,  # index
        28, 29, 30, 30,  # middle
        34, 35, 36, 36,  # ring
        31, 32, 33, 33,  # pinky
    ]
    right = [
        21,
        52, 53, 54, 54,
        40, 41, 42, 42,
        43, 44, 45, 45,
        49, 50, 51, 51,
        46, 47, 48, 48,
    ]
    return np.asarray(left + right, np.int64)
