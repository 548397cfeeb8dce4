"""Shared CLI helpers.

``synthetic_setup`` is the ONE definition of the demo avatar used by both
``cli.train --synthetic`` and ``cli.render_rot --synthetic``; the two must
build identical pytrees or checkpoints stop round-tripping (regression:
``tests/test_cli_roundtrip.py``).
"""

from __future__ import annotations


def synthetic_setup(distill_steps: int = 0, seed: int = 0):
    """Returns (ds, params, model) for the procedural demo sequence with the
    canonical synthetic avatar (body dims / field capacity / subdiv / frame
    count are part of the checkpoint contract)."""
    import jax.numpy as jnp

    from ..avatar import init_avatar
    from ..body import make_test_body
    from ..data.dataset import make_synthetic_sequence
    from ..field.attribute_field import AttributeFieldConfig
    from ..field.hashgrid import HashGridConfig

    ds, _ = make_synthetic_sequence(num_frames=8, image_size=(128, 128))
    body = make_test_body(num_joints=4, segments_per_bone=3, ring=8)
    field_cfg = AttributeFieldConfig(
        grid=HashGridConfig(
            num_levels=8, min_res=8, max_res=256, log2_hashmap_size=14
        )
    )
    params, model = init_avatar(
        body,
        {k: jnp.asarray(v) for k, v in ds.smpl_params.items()},
        num_subdiv=1,
        field_cfg=field_cfg,
        seed=seed,
        distill_steps=distill_steps,
    )
    return ds, params, model


def load_body_model(smpl_model: str):
    """SMPL-X .npz or legacy SMPL .pkl, by extension (the ONE dispatch rule
    — cli.train, cli.render_rot and cli.export_mesh must accept the same
    model files or checkpoints stop being loadable across tools).

    ``test:J,S,R`` builds the procedural test body (J joints, S segments
    per bone, R ring vertices) — the weights-free demo/bench path for this
    zero-egress environment (the proprietary SMPL-X npz cannot be
    downloaded here)."""
    from ..body.model import load_smpl_pkl, load_smplx_npz, make_test_body

    if smpl_model.startswith("test:"):
        j, s, r = (int(x) for x in smpl_model[5:].split(","))
        return make_test_body(num_joints=j, segments_per_bone=s, ring=r)
    return (
        load_smpl_pkl(smpl_model)
        if smpl_model.endswith(".pkl")
        else load_smplx_npz(smpl_model)
    )


def real_setup(
    dataroot: str,
    smpl_model: str,
    num_subdiv: int = 2,
    seed: int = 0,
    distill_steps: int = 1000,
    body=None,
):
    """Returns (ds, params, model) for a real capture — the shared rebuild
    all three CLIs use so a checkpoint trained by ``cli.train`` restores
    with matching shapes everywhere.  Handles the insav_wild
    (GaussianAvatar-style) layout: SMPL-24 params in train/smpl_parms.pth,
    images under <seq>/train (``utils/smpl.py:182-205``)."""
    import os

    import jax.numpy as jnp

    from ..avatar import init_avatar
    from ..data.dataset import load_sequence
    from ..field.attribute_field import AttributeFieldConfig

    insav_params = None
    for cand in ("train/smpl_parms.pth", "smpl_parms.pth"):
        if os.path.exists(os.path.join(dataroot, cand)):
            from ..data.dataset import load_insav_smpl_params

            insav_params = load_insav_smpl_params(dataroot)
            break
    img_root = dataroot
    if insav_params is not None and os.path.isdir(
        os.path.join(dataroot, "train", "images")
    ):
        img_root = os.path.join(dataroot, "train")
    ds = load_sequence(img_root)
    if body is None:
        body = load_body_model(smpl_model)
    smpl_params = insav_params if insav_params is not None else ds.smpl_params
    params, model = init_avatar(
        body,
        {k: jnp.asarray(v) for k, v in smpl_params.items()},
        num_subdiv=num_subdiv,
        field_cfg=AttributeFieldConfig(),
        seed=seed,
        distill_steps=distill_steps,
    )
    return ds, params, model
