"""Minimal binary-little-endian PLY I/O (the ``plyfile`` package is not in
this image, and the format needed is tiny).

Layout-compatible with the reference's surfel export
(``geometry/surfel_base.py:697-746`` ``save_ply`` /
``geometry/gaussian_io.py:51-118``): one vertex element with float properties
x y z nx ny nz f_dc_* [f_rest_*] opacity scale_* rot_*.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np


def write_ply(path: str, props: Dict[str, np.ndarray]) -> None:
    """props: name -> [N] float32 column, insertion-ordered."""
    names = list(props.keys())
    n = len(next(iter(props.values())))
    cols = [np.asarray(props[k], np.float32).reshape(n) for k in names]
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {k}" for k in names]
    header += ["end_header", ""]
    data = np.stack(cols, axis=1).astype("<f4")
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(data.tobytes())


def read_ply(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        blob = f.read()
    end = blob.index(b"end_header\n") + len(b"end_header\n")
    header = blob[:end].decode("ascii").splitlines()
    names: List[str] = []
    n = 0
    for line in header:
        parts = line.split()
        if parts[:2] == ["element", "vertex"]:
            n = int(parts[2])
        elif parts[0] == "property":
            assert parts[1] == "float", "only float properties supported"
            names.append(parts[2])
    data = np.frombuffer(blob[end:], dtype="<f4", count=n * len(names))
    data = data.reshape(n, len(names))
    return {k: data[:, i].copy() for i, k in enumerate(names)}


def ply_to_avatar(path: str, like):
    """Load surfel params exported by :func:`avatar_to_ply` (or a reference
    PLY with the same property names, ``gaussian_io.py:86-174``) into an
    AvatarParams pytree shaped like ``like`` (field/latent untouched)."""
    import jax.numpy as jnp

    props = read_ply(path)
    n = len(props["x"])
    xyz = np.stack([props["x"], props["y"], props["z"]], -1)
    colors = np.stack(
        [props[k] for k in sorted(p for p in props if p.startswith("f_dc_"))], -1
    )
    scaling = np.stack(
        [props[k] for k in sorted(p for p in props if p.startswith("scale_"))], -1
    )
    rotation = np.stack(
        [props[k] for k in sorted(p for p in props if p.startswith("rot_"))], -1
    )
    out = like._replace(
        xyz=jnp.asarray(xyz),
        colors=jnp.asarray(colors[:, : like.colors.shape[-1]]),
        scaling=jnp.asarray(scaling[:, : like.scaling.shape[-1]]),
        rotation=jnp.asarray(rotation),
        opacity=jnp.asarray(props["opacity"][:, None]),
    )
    if "occ" in props:
        out = out._replace(occ=jnp.asarray(props["occ"][:, None]))
    return out


def avatar_to_ply(path: str, params, include_normals: bool = True) -> None:
    """Export surfel params in the reference's attribute order
    (``surfel_base.py:697-746``)."""
    import jax.numpy as jnp

    from ..avatar import state as S

    xyz = np.asarray(params.xyz)
    normals = np.asarray(S.get_normal(params))
    colors = np.asarray(params.colors)  # logits, as the reference stores
    opacity = np.asarray(params.opacity)
    scaling = np.asarray(params.scaling)
    rotation = np.asarray(params.rotation)
    occ = np.asarray(params.occ)

    props = {
        "x": xyz[:, 0],
        "y": xyz[:, 1],
        "z": xyz[:, 2],
        "nx": normals[:, 0],
        "ny": normals[:, 1],
        "nz": normals[:, 2],
    }
    for i in range(colors.shape[1]):
        props[f"f_dc_{i}"] = colors[:, i]
    props["opacity"] = opacity[:, 0]
    for i in range(scaling.shape[1]):
        props[f"scale_{i}"] = scaling[:, i]
    for i in range(rotation.shape[1]):
        props[f"rot_{i}"] = rotation[:, i]
    props["occ"] = occ[:, 0]
    write_ply(path, props)
