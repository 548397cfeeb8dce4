"""Import the reference checkpoint's ``HashMLPSDFField`` into JAX.

The reference ships the attribute field inside the Lightning state_dict
(``geometry.attribute_field.*``, consumed at ``test/render_rot.py:129-135``)
in one of two layouts, depending on ``implementation``
(``geometry/sdf_fields.py:56``):

- **torch** (nerfstudio fallback): ``encoding.hash_table`` [L*T, F] with
  per-level resolutions ``floor(min_res * growth^l)``, prime-XOR hashing at
  EVERY level — byte-identical semantics to our ``corner``-mode
  :func:`soar_tpu.field.hashgrid.hash_encode`, so the table reshapes
  directly into our layout; MLP heads are plain Linear stacks.
- **tcnn** (the default the shipped configs train with): packed fp16
  buffers ``encoding.tcnn_encoding.params`` with tiny-cuda-nn's own grid
  layout (dense indexing at coarse levels, +0.5 sample offset, per-level
  row counts rounded to 8) and FullyFusedMLP packed weight matrices (no
  biases, widths padded to 16).  :func:`tcnn_hash_encode` re-implements the
  tcnn sampling semantics point-for-point in jnp so the packed buffer is
  evaluated exactly, and :func:`unpack_tcnn_mlp` splits the packed matrices.

Either way :func:`import_reference_field` returns a :class:`ReferenceField`
whose :func:`reference_field_apply` reproduces ``HashMLPSDFField.forward``
(``sdf_fields.py:163-220``): sigmoid shs, sigmoid*2e-2 scales, L2-normalized
quats, offsets with the 2-dim z latent, sigmoid opacities.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .attribute_field import _apply_mlp as _apply_layers
from .hashgrid import HashGridConfig, hash_encode, normalize_positions

_PRIMES = (1, 2654435761, 805459861)


# ---------------------------------------------------------------------------
# tcnn GridEncoding layout + sampling semantics


@dataclasses.dataclass(frozen=True)
class TcnnGridLayout:
    """Per-level geometry of a tcnn hash grid (grid.h semantics)."""

    resolutions: Tuple[int, ...]  # grid_resolution per level
    scales: Tuple[float, ...]  # grid_scale per level
    row_offsets: Tuple[int, ...]  # feature-row offset per level (+ total)
    dense: Tuple[bool, ...]  # stride-indexed (no hashing) per level
    features_per_level: int


def tcnn_grid_layout(
    num_levels: int,
    min_res: int,
    max_res: int,
    log2_hashmap_size: int,
    features_per_level: int = 2,
) -> TcnnGridLayout:
    """tiny-cuda-nn grid geometry: ``scale = 2^(l*log2(growth)) * base - 1``,
    ``resolution = ceil(scale) + 1``, rows/level = min(next_multiple(res^3, 8),
    2^log2_hashmap_size); a level is densely indexed when res^3 fits."""
    growth = (
        math.exp((math.log(max_res) - math.log(min_res)) / (num_levels - 1))
        if num_levels > 1
        else 1.0
    )
    hashmap_rows = 1 << log2_hashmap_size
    resolutions, scales, offsets, dense = [], [], [0], []
    for lvl in range(num_levels):
        scale = (2.0 ** (lvl * math.log2(growth))) * min_res - 1.0
        res = int(math.ceil(scale)) + 1
        n_dense = res**3
        rows = min(-(-n_dense // 8) * 8, hashmap_rows)  # next_multiple(.., 8)
        resolutions.append(res)
        scales.append(scale)
        dense.append(n_dense <= rows)
        offsets.append(offsets[-1] + rows)
    return TcnnGridLayout(
        tuple(resolutions), tuple(scales), tuple(offsets), tuple(dense),
        features_per_level,
    )


_CORNERS = np.asarray(
    [(c & 1, (c >> 1) & 1, (c >> 2) & 1) for c in range(8)], np.int32
)


def tcnn_hash_encode(
    params: jnp.ndarray,  # flat [total_rows * F] float
    positions: jnp.ndarray,  # [N, 3] in [0, 1]
    layout: TcnnGridLayout,
) -> jnp.ndarray:
    """Evaluate a packed tcnn grid: ``pos = scale * x + 0.5``; dense stride
    indexing where the level fits, prime-XOR hash otherwise; trilinear."""
    F = layout.features_per_level
    L = len(layout.resolutions)
    p = positions.reshape(-1, 3)
    N = p.shape[0]
    corners = jnp.asarray(_CORNERS)

    outs = []
    for lvl in range(L):
        scale = layout.scales[lvl]
        res = layout.resolutions[lvl]
        rows = layout.row_offsets[lvl + 1] - layout.row_offsets[lvl]
        pos = p * scale + 0.5
        base = jnp.floor(pos)
        w = pos - base
        base = base.astype(jnp.int32)
        cidx = base[:, None, :] + corners[None]  # [N, 8, 3]
        cw = jnp.prod(
            jnp.where(corners[None] == 1, w[:, None, :], 1.0 - w[:, None, :]),
            axis=-1,
        )  # [N, 8]
        if layout.dense[lvl]:
            # grid_index wraps with ``index % hashmap_size`` — the top
            # boundary cell (base+1 == resolution) overflows and wraps.
            idx = (
                cidx[..., 0]
                + cidx[..., 1] * res
                + cidx[..., 2] * res * res
            ) % rows
        else:
            h = (
                cidx[..., 0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
                ^ cidx[..., 1].astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
                ^ cidx[..., 2].astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
            )
            idx = (h % jnp.uint32(rows)).astype(jnp.int32)
        level = params[
            layout.row_offsets[lvl] * F : layout.row_offsets[lvl + 1] * F
        ].reshape(rows, F)
        g = jnp.take(level, idx.reshape(-1), axis=0).reshape(N, 8, F)
        outs.append(jnp.sum(g.astype(jnp.float32) * cw[..., None], axis=1))
    out = jnp.concatenate(outs, axis=-1)  # [N, L*F]
    return out.reshape(positions.shape[:-1] + (L * F,))


def unpack_tcnn_mlp(
    packed: np.ndarray, in_dim: int, hidden: int, out_dim: int,
    num_layers: int,
) -> List[Dict[str, np.ndarray]]:
    """Split a FullyFusedMLP packed weight buffer into dense layers.

    tcnn stores row-major [n_out, n_in] matrices back to back, input width
    padded to the next multiple of 16, output width padded to 16, no biases
    (network.h / fully_fused_mlp.cu).  Returns layers in our
    ``{"w": [in, out], "b": [out]}`` convention (biases zero)."""

    def pad16(n):
        return -(-n // 16) * 16

    in_p, out_p = pad16(in_dim), pad16(out_dim)
    shapes = [(hidden, in_p)]
    for _ in range(num_layers - 2):
        shapes.append((hidden, hidden))
    shapes.append((out_p, hidden))
    total = sum(a * b for a, b in shapes)
    if packed.size != total:
        raise ValueError(
            f"packed MLP size {packed.size} != expected {total} for "
            f"in={in_dim} hidden={hidden} out={out_dim} layers={num_layers}"
        )
    layers = []
    off = 0
    for i, (rows, cols) in enumerate(shapes):
        W = packed[off : off + rows * cols].reshape(rows, cols)
        off += rows * cols
        b = np.zeros(W.shape[0], np.float32)
        if i == 0:
            # tcnn pads the input activations to the 16-aligned width with
            # ONES (encodings fill padded_output_width with 1; tcnn.Network
            # is NetworkWithInputEncoding over an Identity encoding), so
            # the trained weight columns beyond in_dim act as per-neuron
            # biases — fold their row-sum into b instead of dropping them.
            b = np.asarray(W[:, in_dim:].sum(axis=1), np.float32)
            W = W[:, :in_dim]
        if i == len(shapes) - 1:
            W = W[:out_dim]
            b = b[:out_dim]
        layers.append({"w": np.asarray(W, np.float32).T, "b": b})
    return layers


# ---------------------------------------------------------------------------
# the imported field


@dataclasses.dataclass
class ReferenceField:
    """Imported ``HashMLPSDFField``; evaluate with
    :func:`reference_field_apply`."""

    aabb: jnp.ndarray  # [2, 3]
    heads: Dict[str, List[Dict[str, jnp.ndarray]]]  # shs/scales/quats/offsets/opacities
    # tcnn layout: packed buffers + layout; torch layout: corner-mode tables.
    tcnn: bool = False
    layout: Optional[TcnnGridLayout] = None
    enc_params: Optional[jnp.ndarray] = None  # tcnn packed (flat)
    quat_enc_params: Optional[jnp.ndarray] = None
    enc_table: Optional[jnp.ndarray] = None  # torch-layout [L, T, F]
    quat_enc_table: Optional[jnp.ndarray] = None
    grid_cfg: Optional[HashGridConfig] = None

    def encode(self, pos: jnp.ndarray, quat: bool = False) -> jnp.ndarray:
        if self.tcnn:
            params = self.quat_enc_params if quat else self.enc_params
            return tcnn_hash_encode(params, pos, self.layout)
        table = self.quat_enc_table if quat else self.enc_table
        return hash_encode(table, pos, self.grid_cfg)



def reference_field_apply(
    rf: ReferenceField,
    xyz: jnp.ndarray,
    z: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """``HashMLPSDFField.forward`` (``sdf_fields.py:163-220``)."""
    pos, _ = normalize_positions(xyz, rf.aabb)
    x = rf.encode(pos)
    shs = jax.nn.sigmoid(_apply_layers(rf.heads["shs"], x))
    scales = jax.nn.sigmoid(_apply_layers(rf.heads["scales"], x)) * 2e-2
    xq = rf.encode(pos, quat=True)
    quats = _apply_layers(rf.heads["quats"], xq)
    quats = quats / jnp.maximum(
        jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12
    )
    if z is None:
        zfeat = jnp.zeros(x.shape[:-1] + (2,), x.dtype)
    else:
        zfeat = jnp.broadcast_to(z, x.shape[:-1] + (2,))
    offsets = _apply_layers(
        rf.heads["offsets"], jnp.concatenate([x, zfeat], axis=-1)
    )
    opacities = jax.nn.sigmoid(_apply_layers(rf.heads["opacities"], x))
    return {
        "shs": shs,
        "scales": scales,
        "quats": quats,
        "offsets": offsets,
        "opacities": opacities,
    }


_HEADS = {
    "shs": ("mlp_base_shs", 3),
    "scales": ("mlp_base_scales", 1),
    "quats": ("mlp_base_quats", 4),
    "offsets": ("mlp_base_offsets", 3),
    "opacities": ("mlp_base_opacities", 1),
}


def _torch_mlp_layers(sd, prefix) -> List[Dict[str, np.ndarray]]:
    layers = []
    i = 0
    while f"{prefix}.layers.{i}.weight" in sd:
        layers.append(
            {
                "w": np.asarray(sd[f"{prefix}.layers.{i}.weight"], np.float32).T,
                "b": np.asarray(sd[f"{prefix}.layers.{i}.bias"], np.float32),
            }
        )
        i += 1
    if not layers:
        raise KeyError(f"{prefix}.layers.0.weight")
    return layers


def import_reference_field(
    sd: Dict[str, np.ndarray],
    prefix: str = "geometry.attribute_field.",
    hidden_dim: int = 64,
    num_layers: int = 2,
    base_res: int = 16,
) -> ReferenceField:
    """Build a :class:`ReferenceField` from reference state_dict arrays.

    ``sd`` values must already be numpy (the checkpoint loader converts).
    Field hyperparameters come from the stored buffers
    (``sdf_fields.py:62-65``: aabb, max_res, num_levels, log2_hashmap_size);
    base_res/hidden_dim are constructor defaults not stored in the ckpt."""
    aabb = np.asarray(sd[prefix + "aabb"], np.float32).reshape(2, 3)
    num_levels = int(sd[prefix + "num_levels"])
    max_res = int(sd[prefix + "max_res"])
    log2_hs = int(sd[prefix + "log2_hashmap_size"])

    enc_dim = num_levels * 2
    heads: Dict[str, List[Dict[str, np.ndarray]]] = {}
    tcnn = (prefix + "encoding.tcnn_encoding.params") in sd

    for name, (ref_name, out_dim) in _HEADS.items():
        torch_key = f"{prefix}{ref_name}.layers.0.weight"
        tcnn_key = f"{prefix}{ref_name}.tcnn_encoding.params"
        if torch_key in sd:
            heads[name] = _torch_mlp_layers(sd, prefix + ref_name)
        elif tcnn_key in sd:
            in_dim = enc_dim + 2 if name == "offsets" else enc_dim
            heads[name] = unpack_tcnn_mlp(
                np.asarray(sd[tcnn_key], np.float32).ravel(),
                in_dim, hidden_dim, out_dim, num_layers,
            )
        else:
            raise KeyError(f"no weights for head {ref_name}")

    heads = jax.tree_util.tree_map(jnp.asarray, heads)

    if tcnn:
        layout = tcnn_grid_layout(num_levels, base_res, max_res, log2_hs)
        return ReferenceField(
            aabb=jnp.asarray(aabb),
            heads=heads,
            tcnn=True,
            layout=layout,
            enc_params=jnp.asarray(
                np.asarray(sd[prefix + "encoding.tcnn_encoding.params"],
                           np.float32).ravel()
            ),
            quat_enc_params=jnp.asarray(
                np.asarray(sd[prefix + "quat_encoding.tcnn_encoding.params"],
                           np.float32).ravel()
            ),
        )

    # torch layout: hash_table [L * T, F] -> our corner-mode [L, T, F].
    cfg = HashGridConfig(
        num_levels=num_levels,
        min_res=base_res,
        max_res=max_res,
        log2_hashmap_size=log2_hs,
        mode="corner",
        dtype="float32",
    )
    table = np.asarray(sd[prefix + "encoding.hash_table"], np.float32)
    qtable = np.asarray(sd[prefix + "quat_encoding.hash_table"], np.float32)
    shape = (num_levels, cfg.table_size, cfg.features_per_level)
    return ReferenceField(
        aabb=jnp.asarray(aabb),
        heads=heads,
        tcnn=False,
        enc_table=jnp.asarray(table.reshape(shape)),
        quat_enc_table=jnp.asarray(qtable.reshape(shape)),
        grid_cfg=cfg,
    )
