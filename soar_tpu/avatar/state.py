"""Avatar state: trainable surfel pytree + frozen model context.

Replaces the reference's stateful ``GaussianSurfelModel`` nn.Module
(``geometry/surfel_base.py:77-687``) with an explicit split:

- :class:`AvatarParams` — everything the optimizer touches (per-surfel
  xyz/rotation/scaling/opacity/colors/occ logits, the attribute-field pytree,
  and the per-frame ``latent_pose`` embedding), mirroring the reference's
  parameter groups (``surfel_base.py:546-567, 596-687``);
- :class:`AvatarModel` — frozen context: body model, canonical-pose skinning
  data, per-frame SMPL parameter arrays, field AABB.

Initialization follows the ``smpl:`` branch (``surfel_base.py:225-276`` +
``utils/smpl.py:443-547``): canonical 30°-leg A-pose, 2x-subdivided template,
normal-aligned quats, 3-NN scale init, 0.5-gray colors, occ=1e-2, opacity 0.1,
then field distillation on (points ∪ points+0.001·normal).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..body.model import BodyModel, LBSOutput, smplx_forward
from ..body.skinning import (
    SkinningData,
    make_skinning_data,
    mean_knn_sq_dist,
)
from ..body.template import init_qso_on_mesh, subdivide_n
from ..core.transforms import quat_to_rotmat
from ..field.attribute_field import (
    AttributeFieldConfig,
    init_attribute_field,
    reset_field,
)


class AvatarParams(NamedTuple):
    xyz: jnp.ndarray  # [N, 3] canonical positions
    rotation: jnp.ndarray  # [N, 4] raw quats (normalized by activation)
    scaling: jnp.ndarray  # [N, 1] log-scale (isotropic disk radius)
    opacity: jnp.ndarray  # [N, 1] logit
    colors: jnp.ndarray  # [N, 3] logit
    occ: jnp.ndarray  # [N, 1] logit occlusion channel
    field: Dict  # attribute-field pytree
    latent_pose: jnp.ndarray  # [F, 2] per-frame offset latents


@dataclasses.dataclass(frozen=True)
class AvatarModel:
    """Static (non-trained) context.  Hashable by id for jit closure use."""

    body: BodyModel
    skin: SkinningData
    smpl_params: Dict[str, jnp.ndarray]  # per-frame arrays, [F, ...]
    aabb: jnp.ndarray  # [2, 3]
    original_pos: jnp.ndarray  # [N, 3]
    num_frames: int
    field_cfg: AttributeFieldConfig = AttributeFieldConfig()

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


# --- activations (``surfel_base.py:127-143, 440-475``) ---------------------


def get_scaling(p: AvatarParams) -> jnp.ndarray:
    return jnp.exp(p.scaling)


def get_rotation(p: AvatarParams) -> jnp.ndarray:
    return p.rotation / jnp.maximum(
        jnp.linalg.norm(p.rotation, axis=-1, keepdims=True), 1e-12
    )


def get_opacity(p: AvatarParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity)


def get_colors(p: AvatarParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.colors)


def get_occ(p: AvatarParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.occ)


def get_normal(p: AvatarParams) -> jnp.ndarray:
    return quat_to_rotmat(get_rotation(p))[..., :, 2]


def canonical_pose_params(
    body: BodyModel, betas: jnp.ndarray, leg_angle_deg: float = 30.0
) -> Dict[str, jnp.ndarray]:
    """The 30°-spread-leg canonical A-pose with transl (0, 0.3, 0)
    (``utils/smpl.py:497-506``): full-pose flat indices 5 and 8 (z-rotation of
    the two hip joints for SMPL-X)."""
    J = body.num_joints
    full = np.zeros((1, J * 3), np.float32)
    a = leg_angle_deg / 180.0 * np.pi
    if J * 3 > 8:
        full[0, 5] = a
        full[0, 8] = -a
    return {
        "betas": jnp.atleast_2d(betas)[:1],
        "global_orient": jnp.asarray(full[:, :3]),
        "body_pose": jnp.asarray(full[:, 3:]),
        "transl": jnp.array([[0.0, 0.3, 0.0]]),
    }


def frame_params(
    model: AvatarModel,
    frame_idx: jnp.ndarray,
    zero_root: bool = False,
    override: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """Slice per-frame SMPL params; optionally zero global_orient/transl
    (+ the (0, 0.3, 0) shift) as the gen-view path does
    (``utils/smpl.py:597-599``).  ``override`` entries replace sliced values
    (novel-pose rendering, ``test/render_rot.py:159-164``)."""
    sp = model.smpl_params
    idx = frame_idx % model.num_frames
    out = {}
    for k, v in sp.items():
        if k == "betas":
            out[k] = v if v.ndim == 2 else v[None]
        elif k in ("w2c", "Ks", "normal_Ks", "img_wh"):
            continue
        else:
            out[k] = jax.lax.dynamic_index_in_dim(v, idx, keepdims=True)
    if zero_root:
        out["global_orient"] = jnp.zeros_like(out["global_orient"])
        out["transl"] = jnp.zeros_like(out["transl"]) + jnp.array([0.0, 0.3, 0.0])
    if override:
        for k, v in override.items():
            out[k] = jnp.reshape(jnp.asarray(v), out[k].shape)
    return out


def live_affines(
    model: AvatarModel,
    frame_idx: jnp.ndarray,
    zero_root: bool = False,
    override: Optional[Dict[str, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Per-joint live affines A [J, 4, 4] for a frame."""
    out = smplx_forward(
        model.body, frame_params(model, frame_idx, zero_root, override)
    )
    return out.A[0]


def init_avatar(
    body: BodyModel,
    smpl_params: Dict[str, jnp.ndarray],
    num_subdiv: int = 2,
    field_cfg: AttributeFieldConfig = AttributeFieldConfig(),
    seed: int = 0,
    distill_steps: int = 1000,
) -> Tuple[AvatarParams, AvatarModel]:
    key = jax.random.PRNGKey(seed)

    betas = jnp.atleast_2d(jnp.asarray(smpl_params["betas"]))[:1]
    cano = smplx_forward(body, canonical_pose_params(body, betas))
    cano_vertices = cano.vertices[0]

    # Subdivided template = fixed surfel set (SURVEY §3.5: no densification
    # in the SOAR path, so the count is static for the whole run).
    verts_np, faces_np = subdivide_n(
        np.asarray(cano_vertices), np.asarray(body.faces), num_subdiv
    )
    quats_np, _, _ = init_qso_on_mesh(verts_np, faces_np, seed=seed)
    points = jnp.asarray(verts_np)
    N = points.shape[0]

    # Initial isotropic scale from 3-NN mean squared distance
    # (``surfel_base.py:497-503``): log(sqrt(d2)).
    d2 = jnp.maximum(mean_knn_sq_dist(points, k=3), 1e-7)
    scaling = 0.5 * jnp.log(d2)[:, None]

    skin = make_skinning_data(
        body.lbs_weights, cano.A[0], cano_vertices, points, k=30
    )

    # Field AABB: canonical points' box, grown 1.5x about its center
    # (``surfel_base.py:566-573``).
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    center = (lo + hi) / 2.0
    aabb = jnp.stack([(lo - center) * 1.5 + center, (hi - center) * 1.5 + center])

    field = init_attribute_field(key, aabb, field_cfg)

    num_frames = int(np.asarray(smpl_params["body_pose"]).shape[0])
    gray = jnp.full((N, 3), 0.0)  # logit(0.5) = 0
    params = AvatarParams(
        xyz=points,
        rotation=jnp.asarray(quats_np),
        scaling=scaling,
        opacity=jnp.full((N, 1), _logit(0.1)),
        colors=gray,
        occ=jnp.full((N, 1), _logit(1e-2)),
        field=field,
        latent_pose=jnp.zeros((num_frames, 2)),
    )

    model = AvatarModel(
        body=body,
        skin=skin,
        smpl_params={k: jnp.asarray(v) for k, v in smpl_params.items()},
        aabb=aabb,
        original_pos=points,
        num_frames=num_frames,
        field_cfg=field_cfg,
    )

    if distill_steps > 0:
        # Distill explicit attrs into the field on points + normal-perturbed
        # copies (``surfel_base.py:264-276``).
        normals = get_normal(params)
        pts2 = jnp.concatenate([points, points + 0.001 * normals], axis=0)
        gray2 = jnp.full((2 * N, 3), 0.5)
        scales2 = jnp.concatenate([jnp.exp(scaling)] * 2, axis=0)
        quats2 = jnp.concatenate([get_rotation(params)] * 2, axis=0)
        field, _ = reset_field(
            field, pts2, gray2, scales2, quats2, cfg=field_cfg,
            steps=distill_steps,
            # Production scale distills on SGD minibatches: the full-batch
            # step is dominated by the hash-table scatter-add backward
            # (~1.25 s/step at 251k points on v5e → 21 min for the
            # reference's 1000 steps); 64k batches keep the same step
            # count at ~4x less work per step.  Small scenes (tests,
            # synthetic) keep exact full-batch reference semantics.
            batch_size=65536 if int(pts2.shape[0]) > 100_000 else None,
        )
        params = params._replace(field=field)

    return params, model


def _logit(x: float) -> float:
    return float(np.log(x / (1.0 - x)))


def refresh_skinning(model: AvatarModel, points: jnp.ndarray) -> AvatarModel:
    """Recompute the kNN-IDW skinning weights for the CURRENT points.

    The reference recomputes ``query_weights_smpl`` on every forward
    (``utils/smpl.py:611``); we precompute at init — valid because the delta
    loss pins xyz near the template (SOAR's points move sub-centimeter) —
    and refresh explicitly here after densification or large moves.
    """
    from ..body.skinning import knn_idw_weights

    weights = knn_idw_weights(
        points, model.skin.cano_vertices, model.body.lbs_weights, k=30
    )
    return dataclasses.replace(
        model, skin=model.skin._replace(point_weights=weights)
    )
