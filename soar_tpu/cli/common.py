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
