import os

import jax
import jax.numpy as jnp
import numpy as np

from soar_tpu.avatar import init_avatar
from soar_tpu.body import make_test_body
from soar_tpu.field.attribute_field import AttributeFieldConfig
from soar_tpu.field.hashgrid import HashGridConfig
from soar_tpu.io.checkpoint import load_avatar, save_avatar
from soar_tpu.io.ply import avatar_to_ply, read_ply, write_ply

TINY_FIELD = AttributeFieldConfig(
    grid=HashGridConfig(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=8),
    hidden_dim=8,
)


def _tiny_avatar():
    body = make_test_body(num_joints=3, segments_per_bone=2, ring=4)
    smpl_params = {
        "betas": jnp.zeros((1, body.num_betas)),
        "body_pose": jnp.zeros((2, (body.num_joints - 1) * 3)),
        "global_orient": jnp.zeros((2, 3)),
        "transl": jnp.zeros((2, 3)),
    }
    return init_avatar(
        body, smpl_params, num_subdiv=0, field_cfg=TINY_FIELD, distill_steps=0
    )


def test_avatar_checkpoint_roundtrip(tmp_path):
    params, model = _tiny_avatar()
    path = os.path.join(str(tmp_path), "ckpt")
    save_avatar(path, params, step=42)
    params2, step = load_avatar(path, params)
    assert step == 42
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_allclose(a, b)


def test_ply_roundtrip(tmp_path):
    path = os.path.join(str(tmp_path), "t.ply")
    props = {
        "x": np.arange(5, dtype=np.float32),
        "y": np.arange(5, dtype=np.float32) * 2,
        "opacity": np.ones(5, np.float32),
    }
    write_ply(path, props)
    back = read_ply(path)
    assert list(back.keys()) == ["x", "y", "opacity"]
    for k in props:
        np.testing.assert_allclose(back[k], props[k])


def test_avatar_to_ply(tmp_path):
    params, model = _tiny_avatar()
    path = os.path.join(str(tmp_path), "avatar.ply")
    avatar_to_ply(path, params)
    back = read_ply(path)
    np.testing.assert_allclose(back["x"], np.asarray(params.xyz[:, 0]), atol=1e-6)
    assert "rot_3" in back and "occ" in back


def test_import_reference_ckpt(tmp_path):
    """A torch Lightning-style state_dict with the reference's geometry.*
    keys (``surfel_base.py:546-567``) maps onto AvatarParams fields."""
    import torch

    from soar_tpu.io.checkpoint import import_reference_ckpt

    params, _ = _tiny_avatar()
    n = int(params.xyz.shape[0])
    rng = np.random.RandomState(0)
    sd = {
        "geometry._xyz": torch.tensor(rng.randn(n, 3), dtype=torch.float32),
        "geometry._rotation": torch.tensor(rng.randn(n, 4), dtype=torch.float32),
        "geometry._scaling": torch.tensor(rng.randn(n, 1), dtype=torch.float32),
        "geometry._opacity": torch.tensor(rng.randn(n, 1), dtype=torch.float32),
        "geometry._colors": torch.tensor(rng.rand(n, 3), dtype=torch.float32),
        "geometry._occ": torch.tensor(rng.rand(n, 1), dtype=torch.float32),
        "geometry.latent_pose": torch.tensor(
            rng.randn(*params.latent_pose.shape), dtype=torch.float32
        ),
        "guidance.some_unrelated": torch.zeros(3),
    }
    p = tmp_path / "ref.ckpt"
    torch.save({"state_dict": sd, "epoch": 0}, str(p))

    mapped = import_reference_ckpt(str(p))
    assert set(mapped) == {
        "xyz", "rotation", "scaling", "opacity", "colors", "occ", "latent_pose"
    }
    np.testing.assert_allclose(mapped["xyz"], sd["geometry._xyz"].numpy())
    merged = params._replace(**{k: jnp.asarray(v) for k, v in mapped.items()})
    assert merged.xyz.shape == params.xyz.shape

    # Partial checkpoints warn but still return what they have.
    import warnings

    torch.save({"state_dict": {"geometry._xyz": sd["geometry._xyz"]}}, str(p))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mapped = import_reference_ckpt(str(p))
    assert set(mapped) == {"xyz"}
    assert any("missing keys" in str(x.message) for x in w)
