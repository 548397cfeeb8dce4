"""Checkpointing: orbax for native state, torch-state_dict import for parity.

Replaces Lightning ``ModelCheckpoint`` + the ``resume:`` geometry branch
(``geometry/surfel_base.py:278-344``, ``configs/...s0.yaml:144-147``) and the
inference-side state_dict consumption (``test/render_rot.py:121-135``).

Stage hand-off works the same way: stage 1 loads the stage-0 checkpoint into
a freshly built avatar (surfel params + field weights), optimizer state fresh.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ..avatar.state import AvatarParams


def save_avatar(path: str, params: AvatarParams, step: int = 0) -> None:
    """Save avatar params (+step) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params._asdict(), "step": np.asarray(step)}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_avatar(path: str, like: AvatarParams) -> Tuple[AvatarParams, int]:
    """Load params saved by :func:`save_avatar`; ``like`` provides the
    pytree structure/shapes (the stage-1 rebuild pattern,
    ``surfel_base.py:278-344``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": like._asdict(),
        "step": np.asarray(0),
    }
    restored = ckptr.restore(path, template)
    return AvatarParams(**restored["params"]), int(restored["step"])


# Reference (torch Lightning) state_dict key -> AvatarParams field for the
# explicit surfel tensors (``surfel_base.py:546-567``).
_REF_KEYMAP = {
    "geometry._xyz": "xyz",
    "geometry._rotation": "rotation",
    "geometry._scaling": "scaling",
    "geometry._opacity": "opacity",
    "geometry._colors": "colors",
    "geometry._occ": "occ",
    "geometry.latent_pose": "latent_pose",
}


def load_reference_state_dict(path: str) -> Dict:
    """torch.load a reference Lightning ``.ckpt`` once; shared by the
    explicit-tensor and attribute-field importers so ``cli/render_rot``
    deserializes the (multi-hundred-MB) checkpoint a single time."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def import_reference_ckpt(
    path: str,
    like: Optional[AvatarParams] = None,
    state_dict: Optional[Dict] = None,
) -> Dict[str, np.ndarray]:
    """Load a reference Lightning ``.ckpt`` and map the explicit surfel
    parameters to our field names.

    Returns a dict of numpy arrays keyed by AvatarParams field name; callers
    ``params._replace(**{k: jnp.asarray(v) ...})``.  This maps ONLY the
    explicit surfel tensors — the neural-field weights are a separate
    import: :func:`import_reference_field_from_ckpt` reconstructs the
    reference field exactly (both nerfstudio layouts), and callers either
    render straight from its predictions (``cli/render_rot``) or distill
    them into our hash field (``cli/train --import-ckpt``).
    """
    sd = load_reference_state_dict(path) if state_dict is None else state_dict
    out = {}
    for ref_key, field in _REF_KEYMAP.items():
        if ref_key in sd:
            out[field] = sd[ref_key].detach().cpu().numpy().astype(np.float32)
    missing = set(_REF_KEYMAP) - set(sd.keys())
    if missing:
        import warnings

        warnings.warn(f"reference ckpt missing keys: {sorted(missing)}")
    if like is not None:
        # Shape-validate against the target pytree: a mismatched surfel
        # count (wrong --num-subdiv / different capture) must fail HERE
        # with field names, not as an opaque broadcast error downstream.
        tgt = like._asdict()
        bad = {
            k: (v.shape, tuple(tgt[k].shape))
            for k, v in out.items()
            if k in tgt and v.shape != tuple(tgt[k].shape)
        }
        if bad:
            raise ValueError(
                "reference ckpt shapes do not match the built avatar "
                f"(field: (ckpt, avatar)): {bad} — check --num-subdiv / "
                "the capture the avatar was initialized from"
            )
    return out


def import_reference_field_from_ckpt(path: str, state_dict: Optional[Dict] = None):
    """Import the ``geometry.attribute_field.*`` weights of a reference
    Lightning ``.ckpt`` (consumed the same way at ``test/render_rot.py:
    129-135``) as a :class:`soar_tpu.field.reference_import.ReferenceField`,
    or None if the checkpoint carries no field.  Handles both nerfstudio
    implementations (tcnn packed buffers / torch hash tables)."""
    from ..field.reference_import import import_reference_field

    sd = load_reference_state_dict(path) if state_dict is None else state_dict
    prefix = "geometry.attribute_field."
    field_sd = {
        k: v.detach().cpu().numpy()
        for k, v in sd.items()
        if k.startswith(prefix) and hasattr(v, "detach")
    }
    if not field_sd:
        return None
    return import_reference_field(field_sd, prefix=prefix)
