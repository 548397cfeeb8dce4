"""Mesh export CLI (``geometry/exporter.py`` ``MeshExporter`` parity):
checkpoint -> density field -> isosurface -> cleaned/decimated OBJ.

    python -m soar_tpu.cli.export_mesh --ckpt outputs/run/stage1 \
        --dataroot ... --smpl-model ... --out mesh.obj
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--dataroot", default=None)
    ap.add_argument("--smpl-model", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out", default="mesh.obj")
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--density-thresh", type=float, default=0.8)
    ap.add_argument("--decimate-target", type=int, default=100000)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..io.meshing import extract_mesh, write_obj

    if args.synthetic:
        from ..data.dataset import make_synthetic_sequence

        _, (params, _) = make_synthetic_sequence(num_frames=2, image_size=(64, 64))
    else:
        from ..avatar import init_avatar
        from ..body.model import load_smplx_npz
        from ..data.dataset import load_sequence
        from ..io.checkpoint import load_avatar

        ds = load_sequence(args.dataroot)
        body = load_smplx_npz(args.smpl_model)
        params, _ = init_avatar(
            body,
            {k: jnp.asarray(v) for k, v in ds.smpl_params.items()},
            distill_steps=0,
        )
        if args.ckpt:
            params, _ = load_avatar(args.ckpt, params)

    verts, faces = extract_mesh(
        params,
        density_thresh=args.density_thresh,
        resolution=args.resolution,
        decimate_target=args.decimate_target,
    )
    write_obj(args.out, verts, faces)
    print(f"wrote {args.out}: {len(verts)} verts, {len(faces)} faces")


if __name__ == "__main__":
    main()
