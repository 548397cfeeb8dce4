"""Reference HashMLPSDFField import tests (VERDICT r1 #5).

The tcnn grid semantics (grid.h: scale = 2^(l*log2(growth))*base - 1,
resolution = ceil(scale)+1, dense stride indexing when the level fits,
prime-XOR hash otherwise, +0.5 sample offset, rows rounded to 8) are pinned
against an independent numpy implementation written in this file, and the
layout constants against hand-computed values.  The torch layout reuses the
already-golden-tested corner-mode hash_encode.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soar_tpu.field.reference_import import (
    ReferenceField,
    import_reference_field,
    reference_field_apply,
    tcnn_grid_layout,
    tcnn_hash_encode,
    unpack_tcnn_mlp,
)

PRIMES = (1, 2654435761, 805459861)


def test_tcnn_layout_constants():
    # base 16, max 128, 4 levels -> growth 2: scales 15,31,63,127;
    # resolutions 16,32,64,128; all res^3 > 2^10 rows -> hashed, 1024 rows.
    lay = tcnn_grid_layout(4, 16, 128, 10)
    assert lay.scales == (15.0, 31.0, 63.0, 127.0)
    assert lay.resolutions == (16, 32, 64, 128)
    assert lay.dense == (False, False, False, False)
    assert lay.row_offsets == (0, 1024, 2048, 3072, 4096)

    # base 2, max 8, 3 levels -> growth 2: res 2,4,8; dense everywhere,
    # rows rounded up to multiples of 8: 8, 64, 512.
    lay2 = tcnn_grid_layout(3, 2, 8, 10)
    assert lay2.resolutions == (2, 4, 8)
    assert lay2.dense == (True, True, True)
    assert lay2.row_offsets == (0, 8, 72, 584)

    # mixed: base 4, max 16, 3 levels (growth 2, res 4,8,16): 64 and 512
    # dense, 4096 > 1024 hashed.
    lay3 = tcnn_grid_layout(3, 4, 16, 10)
    assert lay3.dense == (True, True, False)
    assert lay3.row_offsets == (0, 64, 576, 1600)


def _numpy_tcnn_encode(params, pos, lay, F=2):
    """Independent numpy re-implementation of tcnn grid sampling."""
    N = pos.shape[0]
    out = np.zeros((N, len(lay.resolutions) * F), np.float32)
    for lvl, (scale, res) in enumerate(zip(lay.scales, lay.resolutions)):
        rows = lay.row_offsets[lvl + 1] - lay.row_offsets[lvl]
        level = params[lay.row_offsets[lvl] * F : lay.row_offsets[lvl + 1] * F]
        level = level.reshape(rows, F)
        for n in range(N):
            p = pos[n] * scale + 0.5
            base = np.floor(p).astype(np.int64)
            frac = p - base
            acc = np.zeros(F, np.float32)
            for c in range(8):
                off = np.array([c & 1, (c >> 1) & 1, (c >> 2) & 1])
                idx3 = base + off
                w = np.prod(np.where(off == 1, frac, 1.0 - frac))
                if lay.dense[lvl]:
                    idx = (idx3[0] + idx3[1] * res + idx3[2] * res * res) % rows
                else:
                    h = 0
                    for d in range(3):
                        h ^= (int(idx3[d]) * PRIMES[d]) & 0xFFFFFFFF
                    idx = h % rows
                acc += w * level[idx]
            out[n, lvl * F : (lvl + 1) * F] = acc
    return out


def test_tcnn_encode_matches_numpy():
    lay = tcnn_grid_layout(3, 4, 16, 10)
    rng = np.random.RandomState(0)
    params = rng.randn(lay.row_offsets[-1] * 2).astype(np.float32)
    pos = rng.uniform(0.05, 0.95, (17, 3)).astype(np.float32)
    got = np.asarray(tcnn_hash_encode(jnp.asarray(params), jnp.asarray(pos), lay))
    want = _numpy_tcnn_encode(params, pos, lay)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tcnn_encode_constant_table():
    """Trilinear weights sum to 1: a constant table returns the constant."""
    lay = tcnn_grid_layout(2, 4, 8, 8)
    params = np.full(lay.row_offsets[-1] * 2, 0.25, np.float32)
    pos = np.random.RandomState(1).uniform(0.1, 0.9, (9, 3)).astype(np.float32)
    got = np.asarray(tcnn_hash_encode(jnp.asarray(params), jnp.asarray(pos), lay))
    np.testing.assert_allclose(got, 0.25, atol=1e-5)


def test_unpack_tcnn_mlp():
    """Pack known matrices in the FullyFusedMLP layout (row-major [out, in],
    input/output padded to 16, no biases) and verify the unpacked forward."""
    rng = np.random.RandomState(2)
    in_dim, hidden, out_dim = 32, 64, 3
    W0 = rng.randn(hidden, in_dim).astype(np.float32)  # in already aligned
    W1 = rng.randn(16, hidden).astype(np.float32)  # out padded 3 -> 16
    packed = np.concatenate([W0.ravel(), W1.ravel()])
    layers = unpack_tcnn_mlp(packed, in_dim, hidden, out_dim, num_layers=2)
    assert layers[0]["w"].shape == (in_dim, hidden)
    assert layers[1]["w"].shape == (hidden, out_dim)

    x = rng.randn(5, in_dim).astype(np.float32)
    want = np.maximum(x @ W0.T, 0.0) @ W1[:out_dim].T
    got = np.maximum(x @ layers[0]["w"], 0.0) @ layers[1]["w"]
    np.testing.assert_allclose(got, want, rtol=1e-5)

    with pytest.raises(ValueError):
        unpack_tcnn_mlp(packed[:-1], in_dim, hidden, out_dim, 2)


def test_unpack_tcnn_mlp_input_padding_bias():
    """tcnn pads input activations to 16-aligned width with ONES, so the
    weight columns beyond in_dim are effective biases (the offsets head has
    in_dim 34 -> padded 48). Dropping them silently shifts every first-layer
    pre-activation."""
    rng = np.random.RandomState(3)
    in_dim, hidden, out_dim = 34, 64, 3  # padded input 48
    W0 = rng.randn(hidden, 48).astype(np.float32)
    W1 = rng.randn(16, hidden).astype(np.float32)
    packed = np.concatenate([W0.ravel(), W1.ravel()])
    layers = unpack_tcnn_mlp(packed, in_dim, hidden, out_dim, num_layers=2)
    assert layers[0]["w"].shape == (in_dim, hidden)

    x = rng.randn(5, in_dim).astype(np.float32)
    x_pad = np.concatenate([x, np.ones((5, 48 - in_dim), np.float32)], -1)
    want = np.maximum(x_pad @ W0.T, 0.0) @ W1[:out_dim].T
    got = (
        np.maximum(x @ layers[0]["w"] + layers[0]["b"], 0.0) @ layers[1]["w"]
        + layers[1]["b"]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _make_field_sd(rng, layout="torch", num_levels=4, max_res=128,
                   log2=10, hidden=64):
    prefix = "geometry.attribute_field."
    enc_dim = num_levels * 2
    sd = {
        prefix + "aabb": np.asarray([[-1.0, -1, -1], [1, 1, 1]], np.float32),
        prefix + "num_levels": np.asarray(num_levels),
        prefix + "max_res": np.asarray(max_res),
        prefix + "log2_hashmap_size": np.asarray(log2),
    }
    heads = {
        "mlp_base_shs": 3,
        "mlp_base_scales": 1,
        "mlp_base_quats": 4,
        "mlp_base_offsets": 3,
        "mlp_base_opacities": 1,
    }
    if layout == "torch":
        T = 1 << log2
        for enc in ("encoding", "quat_encoding"):
            sd[f"{prefix}{enc}.hash_table"] = 0.01 * rng.randn(
                num_levels * T, 2
            ).astype(np.float32)
        for name, out in heads.items():
            ind = enc_dim + 2 if name == "mlp_base_offsets" else enc_dim
            sd[f"{prefix}{name}.layers.0.weight"] = rng.randn(
                hidden, ind
            ).astype(np.float32) * 0.1
            sd[f"{prefix}{name}.layers.0.bias"] = rng.randn(hidden).astype(
                np.float32
            ) * 0.1
            sd[f"{prefix}{name}.layers.1.weight"] = rng.randn(
                out, hidden
            ).astype(np.float32) * 0.1
            sd[f"{prefix}{name}.layers.1.bias"] = rng.randn(out).astype(
                np.float32
            ) * 0.1
    else:
        lay = tcnn_grid_layout(num_levels, 16, max_res, log2)
        for enc in ("encoding", "quat_encoding"):
            sd[f"{prefix}{enc}.tcnn_encoding.params"] = 0.01 * rng.randn(
                lay.row_offsets[-1] * 2
            ).astype(np.float32)
        for name, out in heads.items():
            if name == "mlp_base_offsets":  # torch impl in the reference
                sd[f"{prefix}{name}.layers.0.weight"] = rng.randn(
                    hidden, enc_dim + 2
                ).astype(np.float32) * 0.1
                sd[f"{prefix}{name}.layers.0.bias"] = np.zeros(
                    hidden, np.float32
                )
                sd[f"{prefix}{name}.layers.1.weight"] = np.zeros(
                    (out, hidden), np.float32
                )
                sd[f"{prefix}{name}.layers.1.bias"] = np.zeros(out, np.float32)
                continue
            out_p = -(-out // 16) * 16
            in_p = -(-enc_dim // 16) * 16
            size = hidden * in_p + out_p * hidden
            sd[f"{prefix}{name}.tcnn_encoding.params"] = 0.1 * rng.randn(
                size
            ).astype(np.float32)
    return sd


@pytest.mark.parametrize("layout", ["torch", "tcnn"])
def test_import_reference_field(layout):
    rng = np.random.RandomState(3)
    sd = _make_field_sd(rng, layout)
    rf = import_reference_field(sd)
    assert rf.tcnn == (layout == "tcnn")
    xyz = jnp.asarray(rng.uniform(-0.8, 0.8, (50, 3)).astype(np.float32))
    out = reference_field_apply(rf, xyz)
    assert out["shs"].shape == (50, 3)
    assert out["scales"].shape == (50, 1)
    assert out["quats"].shape == (50, 4)
    assert out["offsets"].shape == (50, 3)
    assert out["opacities"].shape == (50, 1)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # exact activations: scales in (0, 2e-2), unit quats, sigmoids in (0,1)
    assert (np.asarray(out["scales"]) > 0).all()
    assert (np.asarray(out["scales"]) < 2e-2).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["quats"]), axis=-1), 1.0, atol=1e-5
    )


def test_torch_layout_matches_manual_eval():
    """torch-layout import == corner-mode hash_encode + numpy linears."""
    from soar_tpu.field.hashgrid import hash_encode, normalize_positions

    rng = np.random.RandomState(4)
    sd = _make_field_sd(rng, "torch")
    rf = import_reference_field(sd)
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (20, 3)).astype(np.float32))
    out = reference_field_apply(rf, xyz)

    pos, _ = normalize_positions(xyz, rf.aabb)
    x = np.asarray(hash_encode(rf.enc_table, pos, rf.grid_cfg))
    p = "geometry.attribute_field.mlp_base_shs"
    h = np.maximum(x @ sd[p + ".layers.0.weight"].T + sd[p + ".layers.0.bias"], 0)
    want = 1.0 / (1.0 + np.exp(-(h @ sd[p + ".layers.1.weight"].T
                                 + sd[p + ".layers.1.bias"])))
    np.testing.assert_allclose(np.asarray(out["shs"]), want, rtol=2e-4,
                               atol=1e-5)


def test_ckpt_field_roundtrip(tmp_path):
    """Full .ckpt path: torch.save a reference-layout checkpoint, import via
    io.checkpoint, evaluate."""
    import torch

    from soar_tpu.io.checkpoint import import_reference_field_from_ckpt

    rng = np.random.RandomState(5)
    sd_np = _make_field_sd(rng, "tcnn")
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
    sd["geometry._xyz"] = torch.zeros(10, 3)
    p = tmp_path / "ref.ckpt"
    torch.save({"state_dict": sd}, str(p))

    rf = import_reference_field_from_ckpt(str(p))
    assert rf is not None and rf.tcnn
    out = reference_field_apply(rf, jnp.zeros((4, 3)))
    assert np.isfinite(np.asarray(out["shs"])).all()

    # no-field checkpoint -> None
    p2 = tmp_path / "nofield.ckpt"
    torch.save({"state_dict": {"geometry._xyz": torch.zeros(10, 3)}}, str(p2))
    assert import_reference_field_from_ckpt(str(p2)) is None
