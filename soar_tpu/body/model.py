"""SMPL-family body model as a pure pytree + fused jnp LBS.

Replaces the vendored torch smplx package of the reference
(``utils/smplx/body_models.py``, ``utils/smplx/lbs.py``).  The model is a
NamedTuple of arrays; ``lbs()`` is one jit-friendly function returning
vertices, joints and — like the reference's modified smplx — the per-joint
4x4 affines ``A`` needed for avatar re-skinning
(``utils/smplx/body_models.py:1332-1400``, ``utils/smplx/lbs.py:147-246``).

The kinematic-chain accumulation unrolls over the (static) parent array: with
J<=55 joints this traces to a short chain of batched 4x4 matmuls, which XLA
fuses far better than a ``lax.scan`` with gather-by-parent.

Loading the official SMPL-X ``.npz`` (user-supplied, proprietary — never
vendored) is supported via :func:`load_smplx_npz`; tests use
:func:`make_test_body`, a small procedurally generated articulated "body" with
the same structure.
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.transforms import batch_rodrigues, transform_mat


class BodyModel(NamedTuple):
    v_template: jnp.ndarray  # [V, 3]
    shapedirs: jnp.ndarray  # [V, 3, S] (betas [+ expression] dirs concatenated)
    posedirs: jnp.ndarray  # [(J-1)*9, V*3]
    J_regressor: jnp.ndarray  # [J, V]
    lbs_weights: jnp.ndarray  # [V, J]
    parents: Tuple[int, ...]  # static kinematic tree, parents[0] == -1
    faces: jnp.ndarray  # [F, 3] int32
    num_betas: int  # leading shape coords that are betas (rest: expression)
    # [J*3] additive mean pose, or None.  SMPL-X under the reference's
    # flat_hand_mean=False carries the MANO hand means here (zeros for all
    # non-hand segments); SMPLX.forward does ``full_pose += pose_mean``
    # (``utils/smplx/body_models.py:1321``).  SMPL has no pose mean.
    pose_mean: Optional[jnp.ndarray] = None
    # SMPL-X landmark machinery (None for SMPL / procedural bodies): the
    # extra vertex joints + face landmark barycentric tables that extend the
    # 55 kinematic joints to the smplx package's 144-joint output
    # (``utils/smplx/body_models.py:1345-1374``, ``vertex_joint_selector.py``)
    # — required by the SMPLify OpenPose-137 mapping.
    extra_joint_idxs: Optional[jnp.ndarray] = None  # [21] vertex ids
    lmk_faces_idx: Optional[jnp.ndarray] = None  # [51] static face lmks
    lmk_bary_coords: Optional[jnp.ndarray] = None  # [51, 3]
    dyn_lmk_faces_idx: Optional[jnp.ndarray] = None  # [79, 17] contour LUT
    dyn_lmk_bary_coords: Optional[jnp.ndarray] = None  # [79, 17, 3]

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


class LBSOutput(NamedTuple):
    vertices: jnp.ndarray  # [B, V, 3]
    joints: jnp.ndarray  # [B, J, 3]
    A: jnp.ndarray  # [B, J, 4, 4] per-joint world affines (transl included)


def lbs(
    model: BodyModel,
    shape_components: jnp.ndarray,  # [B, S]
    full_pose: jnp.ndarray,  # [B, J*3] axis-angle (global_orient first)
    transl: Optional[jnp.ndarray] = None,  # [B, 3]
) -> LBSOutput:
    """Linear blend skinning, mirroring ``utils/smplx/lbs.py:147-246``.

    Translation is applied to vertices, joints AND baked into ``A[..., :3, 3]``
    exactly as the reference does (``utils/smplx/body_models.py:1381-1384``),
    so ``A`` maps canonical-joint-local points directly to world space.
    """
    B = full_pose.shape[0]
    J = model.num_joints

    # Shape blendshapes: [B, V, 3].
    v_shaped = model.v_template + jnp.einsum(
        "bl,mkl->bmk", shape_components, model.shapedirs
    )
    # Joint locations from the shaped template.
    joints = jnp.einsum("bik,ji->bjk", v_shaped, model.J_regressor)

    rot_mats = batch_rodrigues(full_pose.reshape(B, J, 3))  # [B, J, 3, 3]

    # Pose blendshapes (exclude root joint).
    ident = jnp.eye(3, dtype=v_shaped.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    pose_offsets = (pose_feature @ model.posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    # Rigid kinematic chain (``lbs.py:343-396`` batch_rigid_transform),
    # unrolled over the static parent list.
    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, list(model.parents[1:])]], axis=1
    )
    local_T = transform_mat(rot_mats, rel_joints)  # [B, J, 4, 4]
    chain = [local_T[:, 0]]
    for j in range(1, J):
        chain.append(chain[model.parents[j]] @ local_T[:, j])
    world_T = jnp.stack(chain, axis=1)  # [B, J, 4, 4]
    posed_joints = world_T[..., :3, 3]

    # Subtract the rest-pose joint contribution: A = T - [0 | T @ j_rest].
    joints_h = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    shifted = jnp.einsum("bjxy,bjy->bjx", world_T, joints_h)  # [B, J, 4]
    A = world_T.at[..., :, 3].add(-shifted)

    # Skinning.
    T = jnp.einsum("vj,bjxy->bvxy", model.lbs_weights, A)
    v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = jnp.einsum("bvxy,bvy->bvx", T, v_h)[..., :3]

    if transl is not None:
        verts = verts + transl[:, None]
        posed_joints = posed_joints + transl[:, None]
        A = A.at[..., :3, 3].add(transl[:, None, :])

    return LBSOutput(vertices=verts, joints=posed_joints, A=A)


# SMPL-X full-pose segment layout (``utils/smplx/body_models.py:1290-1320``):
# global_orient(1) body(21) jaw(1) leye(1) reye(1) lhand(15) rhand(15) = 55.
SMPLX_SEGMENTS = (
    ("global_orient", 1),
    ("body_pose", 21),
    ("jaw_pose", 1),
    ("leye_pose", 1),
    ("reye_pose", 1),
    ("left_hand_pose", 15),
    ("right_hand_pose", 15),
)


def _pose_segments(params, num_joints: int):
    """Pick the segment layout for ``assemble_smplx_pose``: the SMPL-X
    7-segment layout for 55 joints, or the degraded global+rest layout for
    other joint counts AND for a ``body_pose`` that covers the full (J-1)
    tail (``canonical_pose_params`` emits ``full[:, 3:]``, i.e. body + jaw +
    eyes + hands in one vector, matching smplx's ``full_pose`` slicing)."""
    full_tail = (("global_orient", 1), ("body_pose", num_joints - 1))
    if num_joints != 55:
        return full_tail
    bp = params.get("body_pose")
    if bp is not None:
        # Judge the PER-ITEM layout from the trailing shape, never from
        # total-size divisibility (a [B, 63] standard body_pose has size
        # 63*B, which is divisible by 162 whenever B % 18 == 0 — e.g. a
        # 90-frame capture batch — and must NOT route to the full tail).
        n_tail = (num_joints - 1) * 3
        if bp.shape[-1] == n_tail or (
            bp.ndim >= 2 and bp.shape[-2:] == (num_joints - 1, 3)
        ):
            return full_tail
    return SMPLX_SEGMENTS


def assemble_smplx_pose(
    params: Dict[str, jnp.ndarray], batch: int, num_joints: int = 55
) -> jnp.ndarray:
    """Concatenate SMPL-X pose segments (axis-angle, flattened) into the full
    [B, J*3] pose vector; missing segments default to zeros.

    For non-SMPL-X joint counts (e.g. the synthetic test body), and for a
    ``body_pose`` already covering all J-1 non-root joints, the layout
    degrades to global_orient + body_pose.
    """
    parts = []
    for name, njoints in _pose_segments(params, num_joints):
        p = params.get(name)
        if p is None:
            p = jnp.zeros((batch, njoints * 3))
        else:
            p = _to_batch(p, batch, njoints * 3)
        parts.append(p)
    return jnp.concatenate(parts, axis=-1)


def _seg_rows(p, n: int) -> int:
    """Batch rows of a segment param whose flat per-item length is ``n``:
    total size must be a multiple of n, and the leading axis (if any) must
    agree — so an unbatched per-joint [k, 3] matrix (size == n) reads as ONE
    item, never as k items."""
    if p is None or p.size % n:
        return 1
    rows = p.size // n
    return rows if (rows == 1 or (p.ndim >= 2 and p.shape[0] == rows)) else 1


def _to_batch(p: jnp.ndarray, batch: int, n: int) -> jnp.ndarray:
    """[n] / [k,3] / [1, n] / [batch, n] / [batch, k, 3] -> [batch, n]
    (unbatched params broadcast; a genuine row mismatch still errors in
    broadcast_to)."""
    p = jnp.reshape(p, (-1, n))
    if p.shape[0] != batch:
        p = jnp.broadcast_to(p, (batch, n))
    return p


def smplx_forward(
    model: BodyModel,
    params: Dict[str, jnp.ndarray],
) -> LBSOutput:
    """SMPL-X forward from a reference-style param dict
    (betas / body_pose / global_orient / transl / hand & face poses /
    expression), cf. ``utils/smpl.py:601-607``."""
    shape_components, full_pose, transl = _assemble_lbs_inputs(model, params)
    return lbs(model, shape_components, full_pose, transl)


def _assemble_lbs_inputs(model: BodyModel, params: Dict[str, jnp.ndarray]):
    """Param dict -> (shape_components, full_pose incl. pose_mean, transl)."""
    betas = jnp.atleast_2d(params["betas"])

    # Batch size = max rows over EVERY provided segment (each judged
    # against its own flat length, so unbatched [k, 3] per-joint matrices
    # are one item, not k).
    J = model.num_joints
    n_expr_total = model.shapedirs.shape[-1] - model.num_betas
    seg_lens = {name: nj * 3 for name, nj in _pose_segments(params, J)}
    seg_lens["transl"] = 3
    rows = [betas.shape[0]]
    rows += [_seg_rows(params.get(k), n) for k, n in seg_lens.items()]
    if params.get("expression") is not None:
        # Expression is conventionally 2-D [B, n] (and may carry extra
        # trailing coeffs that get sliced below) — rows come from its shape.
        rows.append(jnp.atleast_2d(params["expression"]).shape[0])
    B = max(rows)
    if betas.shape[0] != B:
        betas = jnp.broadcast_to(betas, (B, betas.shape[-1]))
    n_expr = n_expr_total
    expr = params.get("expression")
    if n_expr > 0:
        if expr is None:
            expr = jnp.zeros((B, n_expr))
        expr = jnp.atleast_2d(expr)[:, :n_expr]  # may carry extra coeffs
        shape_components = jnp.concatenate(
            [betas[:, : model.num_betas], _to_batch(expr, B, n_expr)],
            axis=-1,
        )
    else:
        shape_components = betas[:, : model.num_betas]
    full_pose = assemble_smplx_pose(params, B, model.num_joints)
    if model.pose_mean is not None:
        # ``full_pose += self.pose_mean`` (``body_models.py:1321``) — under
        # flat_hand_mean=False this re-adds the MANO hand means that
        # SMPLer-X / smplx fits are expressed relative to.
        full_pose = full_pose + model.pose_mean
    transl = params.get("transl")
    if transl is not None:
        transl = _to_batch(transl, B, 3)
    return shape_components, full_pose, transl


# ---------------------------------------------------------------------------
# 144-joint output (kinematic 55 + vertex joints 21 + face lmk 51 + contour
# 17) — the smplx package's joint layout consumed by the reference's
# SMPL-X -> OpenPose-137 keypoint mapping (``preproc/utils.py:180-592``).


# segment_anything-independent transcription of smplx ``vertex_ids.py`` for
# the 'smplx' topology, in ``VertexJointSelector`` order (face 5, feet 6,
# hand tips l then r x 5).
SMPLX_EXTRA_JOINT_VERTEX_IDS = (
    9120,  # nose
    9929,  # reye
    9448,  # leye
    616,  # rear
    6,  # lear
    5770,  # LBigToe
    5780,  # LSmallToe
    8846,  # LHeel
    8463,  # RBigToe
    8474,  # RSmallToe
    8635,  # RHeel
    5361,  # lthumb
    4933,  # lindex
    5058,  # lmiddle
    5169,  # lring
    5286,  # lpinky
    8079,  # rthumb
    7669,  # rindex
    7794,  # rmiddle
    7905,  # rring
    8022,  # rpinky
)


def vertices2landmarks(
    vertices: jnp.ndarray,  # [B, V, 3]
    faces: jnp.ndarray,  # [F, 3]
    lmk_faces_idx: jnp.ndarray,  # [L] or [B, L]
    lmk_bary_coords: jnp.ndarray,  # [L, 3] or [B, L, 3]
) -> jnp.ndarray:
    """Barycentric landmark interpolation (``smplx/lbs.py:104-144``)."""
    if lmk_faces_idx.ndim == 1:
        lmk_faces_idx = jnp.broadcast_to(
            lmk_faces_idx[None], (vertices.shape[0],) + lmk_faces_idx.shape
        )
        lmk_bary_coords = jnp.broadcast_to(
            lmk_bary_coords[None], (vertices.shape[0],) + lmk_bary_coords.shape
        )
    lmk_faces = faces[lmk_faces_idx]  # [B, L, 3] vertex ids
    lmk_vertices = jnp.take_along_axis(
        vertices[:, :, None, :],
        lmk_faces[..., None].astype(jnp.int32),
        axis=1,
    )  # [B, L, 3, 3]
    return jnp.einsum("blfi,blf->bli", lmk_vertices, lmk_bary_coords)


def _neck_y_bucket(full_pose: jnp.ndarray, parents) -> jnp.ndarray:
    """Dynamic-contour LUT row from the neck chain's y rotation
    (``smplx/lbs.py:28-103``): accumulate the axis-angle rotations along the
    neck kinematic chain (joint 12 up to the root), convert to a y Euler
    angle, clamp/round to the [0, 78] bucket index."""
    chain = []
    j = 12
    while j != -1:
        chain.append(j)
        j = parents[j]
    B = full_pose.shape[0]
    aa = full_pose.reshape(B, -1, 3)[:, jnp.asarray(chain)]
    rots = batch_rodrigues(aa.reshape(-1, 3)).reshape(B, -1, 3, 3)
    rel = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    for i in range(len(chain)):
        rel = jnp.einsum("bij,bjk->bik", rots[:, i], rel)
    # rot_mat_to_euler: y angle = atan2(-R[2,0], sqrt(R[0,0]^2 + R[1,0]^2)).
    y = jnp.arctan2(
        -rel[:, 2, 0], jnp.sqrt(rel[:, 0, 0] ** 2 + rel[:, 1, 0] ** 2)
    )
    y_deg = jnp.round(jnp.minimum(-y * 180.0 / jnp.pi, 39.0)).astype(jnp.int32)
    neg = y_deg < 0
    very_neg = y_deg < -39
    neg_vals = jnp.where(very_neg, 78, 39 - y_deg)
    return jnp.where(neg, neg_vals, y_deg)


def smplx_forward_full(
    model: BodyModel, params: Dict[str, jnp.ndarray]
) -> Tuple[LBSOutput, jnp.ndarray]:
    """Forward returning ``(LBSOutput, joints144)`` — the smplx package's
    full joint set (``body_models.py:1345-1380``): [0:55] kinematic, [55:76]
    extra vertex joints, [76:127] static face landmarks, [127:144] dynamic
    face contour.  Requires the landmark fields loaded by
    :func:`load_smplx_npz` from a real SMPL-X npz."""
    if model.extra_joint_idxs is None or model.lmk_faces_idx is None:
        raise ValueError(
            "smplx_forward_full needs the SMPL-X landmark tables "
            "(extra_joint_idxs / lmk_*); load the body via load_smplx_npz"
        )
    shape_components, full_pose, transl = _assemble_lbs_inputs(model, params)
    # Landmarks interpolate PRE-translation vertices in the reference
    # (transl is added to joints and vertices after the landmark concat,
    # ``body_models.py:1380-1384``) — equivalent to adding transl to the
    # full 144 set, which is what we do by computing on the translated
    # vertices (barycentric interpolation commutes with translation:
    # sum(w)=1).
    out = lbs(model, shape_components, full_pose, transl)
    extra = out.vertices[:, jnp.asarray(model.extra_joint_idxs)]
    lmk_faces_idx = model.lmk_faces_idx
    lmk_bary = model.lmk_bary_coords
    static = vertices2landmarks(
        out.vertices, model.faces, lmk_faces_idx, lmk_bary
    )
    parts = [out.joints, extra, static]
    if model.dyn_lmk_faces_idx is not None:
        bucket = _neck_y_bucket(full_pose, model.parents)
        dyn_faces = model.dyn_lmk_faces_idx[bucket]  # [B, 17]
        dyn_bary = model.dyn_lmk_bary_coords[bucket]  # [B, 17, 3]
        parts.append(
            vertices2landmarks(out.vertices, model.faces, dyn_faces, dyn_bary)
        )
    return out, jnp.concatenate(parts, axis=1)


def load_smplx_npz(
    path: str, num_betas: int = 10, num_expression: int = 10
) -> BodyModel:
    """Load the official MPI SMPL-X ``.npz`` (e.g. SMPLX_NEUTRAL.npz).

    The file is user-supplied; layout follows the smplx package's
    ``data_struct`` fields (``utils/smplx/body_models.py:1100-1170``).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"SMPL-X model file not found: {path}. Download from "
            "https://smpl-x.is.tue.mpg.de/ (proprietary, not vendored)."
        )
    with np.load(path, allow_pickle=True) as data:
        v_template = np.asarray(data["v_template"], np.float32)
        shapedirs_all = np.asarray(data["shapedirs"], np.float32)
        # SMPL-X packs 300 shape + 100 expression dirs; slice like the
        # reference (``body_models.py:1135-1160``).
        if shapedirs_all.shape[-1] >= 400:
            shapedirs = np.concatenate(
                [
                    shapedirs_all[..., :num_betas],
                    shapedirs_all[..., 300 : 300 + num_expression],
                ],
                axis=-1,
            )
        else:
            shapedirs = shapedirs_all[..., : num_betas + num_expression]
        posedirs = np.asarray(data["posedirs"], np.float32)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # [(J-1)*9, V*3]
        # posedirs stored as [V, 3, P] -> [P, V*3]
        J_regressor = np.asarray(data["J_regressor"], np.float32)
        weights = np.asarray(data["weights"], np.float32)
        kintree = np.asarray(data["kintree_table"], np.int64)
        parents = kintree[0].astype(np.int64)
        parents[0] = -1
        faces = np.asarray(data["f"], np.int32)
        # flat_hand_mean=False (the reference's construction,
        # ``utils/smpl.py:294-300`` leaves the default): the MANO hand means
        # are ADDED to the hand pose segments in forward
        # (``body_models.py:652-665,1321``).  Layout: segments before the
        # hands (global 1 + body 21 + jaw/leye/reye 3 = 25 joints) are
        # zero-mean.
        J = len(parents)
        pose_mean = None  # stays None (= no add in forward) without hands
        if "hands_meanl" in data and J == 55:
            pose_mean = np.zeros((J * 3,), np.float32)
            pose_mean[25 * 3 : 40 * 3] = np.asarray(
                data["hands_meanl"], np.float32
            ).reshape(-1)
            pose_mean[40 * 3 : 55 * 3] = np.asarray(
                data["hands_meanr"], np.float32
            ).reshape(-1)
        # Landmark machinery for the 144-joint output (present in the
        # official SMPL-X npz; ``body_models.py:1085-1104``).
        lmk_f = lmk_b = dyn_f = dyn_b = extra = None
        if "lmk_faces_idx" in data and J == 55:
            lmk_f = np.asarray(data["lmk_faces_idx"], np.int32)
            lmk_b = np.asarray(data["lmk_bary_coords"], np.float32)
            extra = np.asarray(SMPLX_EXTRA_JOINT_VERTEX_IDS, np.int32)
            if "dynamic_lmk_faces_idx" in data:
                dyn_f = np.asarray(data["dynamic_lmk_faces_idx"], np.int32)
                dyn_b = np.asarray(
                    data["dynamic_lmk_bary_coords"], np.float32
                )
    return BodyModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(weights),
        parents=tuple(int(p) for p in parents),
        faces=jnp.asarray(faces),
        num_betas=num_betas,
        pose_mean=None if pose_mean is None else jnp.asarray(pose_mean),
        extra_joint_idxs=None if extra is None else jnp.asarray(extra),
        lmk_faces_idx=None if lmk_f is None else jnp.asarray(lmk_f),
        lmk_bary_coords=None if lmk_b is None else jnp.asarray(lmk_b),
        dyn_lmk_faces_idx=None if dyn_f is None else jnp.asarray(dyn_f),
        dyn_lmk_bary_coords=None if dyn_b is None else jnp.asarray(dyn_b),
    )


def load_smpl_pkl(path: str, num_betas: int = 10) -> BodyModel:
    """Load a legacy SMPL ``.pkl`` (basicModel_*_lbs_10_207_0_v1.0.0.pkl).

    These pickles contain chumpy arrays; we coerce anything array-like via
    ``np.array``.  Supports the reference's SMPL path (``utils/smpl.py:
    182-291`` insav_wild branch).  SMPL has 24 joints and no expression dirs.
    """
    import pickle

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"SMPL model file not found: {path} (download from "
            "https://smpl.is.tue.mpg.de/; proprietary, not vendored)"
        )
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    def arr(x, dtype=np.float32):
        if hasattr(x, "toarray"):  # scipy sparse J_regressor
            x = x.toarray()
        return np.array(x, dtype=dtype)

    v_template = arr(data["v_template"])
    shapedirs = arr(data["shapedirs"])[..., :num_betas]
    posedirs = arr(data["posedirs"])
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    J_regressor = arr(data["J_regressor"])
    weights = arr(data["weights"])
    parents = np.asarray(data["kintree_table"], np.int64)[0]
    parents[0] = -1
    faces = np.asarray(data["f"], np.int32)
    return BodyModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(weights),
        parents=tuple(int(p) for p in parents),
        faces=jnp.asarray(faces),
        num_betas=num_betas,
    )


def make_test_body(
    num_joints: int = 5,
    segments_per_bone: int = 4,
    ring: int = 8,
    num_betas: int = 4,
    seed: int = 0,
) -> BodyModel:
    """Procedural articulated "capsule chain" body for tests.

    A chain of ``num_joints`` bones along +y, each bone wrapped in a tube of
    vertices; LBS weights interpolate linearly between adjacent joints.  Same
    array structure as SMPL-X so every downstream component (skinning, avatar
    init, renderer) exercises identically.
    """
    rng = np.random.RandomState(seed)
    J = num_joints
    bone_len = 0.25
    verts = []
    weights = []
    radius = 0.06
    n_rows = J * segments_per_bone
    for row in range(n_rows + 1):
        y = row / segments_per_bone * bone_len
        joint_f = row / segments_per_bone  # fractional joint coordinate
        j0 = min(int(np.floor(joint_f)), J - 1)
        j1 = min(j0 + 1, J - 1)
        t = joint_f - j0 if j1 > j0 else 0.0
        for k in range(ring):
            a = 2 * np.pi * k / ring
            verts.append([radius * np.cos(a), y, radius * np.sin(a)])
            w = np.zeros(J)
            w[j0] = 1.0 - t
            w[j1] += t
            weights.append(w)
    v_template = np.asarray(verts, np.float32)
    lbs_weights = np.asarray(weights, np.float32)
    V = v_template.shape[0]

    # Faces: triangulate the tube between consecutive rings (winding chosen
    # so vertex normals point outward).
    faces = []
    for row in range(n_rows):
        for k in range(ring):
            a = row * ring + k
            b = row * ring + (k + 1) % ring
            c = (row + 1) * ring + k
            d = (row + 1) * ring + (k + 1) % ring
            faces.append([a, c, b])
            faces.append([b, c, d])
    faces = np.asarray(faces, np.int32)

    # J_regressor: joint j at the ring nearest y = j * bone_len.
    J_regressor = np.zeros((J, V), np.float32)
    for j in range(J):
        row = j * segments_per_bone
        J_regressor[j, row * ring : (row + 1) * ring] = 1.0 / ring

    parents = tuple([-1] + list(range(J - 1)))
    shapedirs = (rng.randn(V, 3, num_betas) * 0.01).astype(np.float32)
    posedirs = (rng.randn((J - 1) * 9, V * 3) * 1e-4).astype(np.float32)

    return BodyModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=parents,
        faces=jnp.asarray(faces),
        num_betas=num_betas,
    )
