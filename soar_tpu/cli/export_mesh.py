"""Mesh export CLI (``geometry/exporter.py`` ``MeshExporter`` parity):
checkpoint -> density field -> isosurface -> cleaned/decimated OBJ.

    python -m soar_tpu.cli.export_mesh --ckpt outputs/run/stage1 \
        --dataroot ... --smpl-model ... --out mesh.obj

The avatar rebuild (synthetic fixture or real capture) goes through the
same ``cli.common`` helpers as ``cli.train`` / ``cli.render_rot`` so any
checkpoint either of those produced restores here with matching shapes.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--dataroot", default=None)
    ap.add_argument("--smpl-model", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-subdiv", type=int, default=2,
                    help="must match the value the checkpoint was trained "
                    "with (surfel count is part of the pytree shape)")
    ap.add_argument("--out", default="mesh.obj")
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--density-thresh", type=float, default=0.8)
    ap.add_argument("--decimate-target", type=int, default=100000)
    ap.add_argument(
        "--field-attrs", action="store_true",
        help="build the density from the trained attribute field's "
        "scales/opacities instead of the explicit logits.  The default "
        "matches the reference's extract_fields (get_scaling/get_opacity, "
        "``gaussian_io.py:184-191``) — which for a field-driven SOAR run "
        "reads INIT-time values, since its renderer takes scales from the "
        "field and forces opacity to 1; pass this flag to export what the "
        "trained avatar actually renders",
    )
    args = ap.parse_args(argv)

    from ..io.checkpoint import load_avatar
    from ..io.meshing import extract_mesh, write_obj

    if args.synthetic:
        from .common import synthetic_setup

        _, params, model = synthetic_setup(distill_steps=0)
    else:
        from .common import real_setup

        _, params, model = real_setup(
            args.dataroot, args.smpl_model,
            num_subdiv=args.num_subdiv, distill_steps=0,
        )
    if args.ckpt:
        params, _ = load_avatar(args.ckpt, params)

    scales = opacities = None
    if args.field_attrs:
        from ..avatar.renderer import query_attributes

        attrs = query_attributes(params, model)
        scales = attrs["scales"]
        opacities = attrs["opacities"][:, 0]

    verts, faces = extract_mesh(
        params,
        density_thresh=args.density_thresh,
        resolution=args.resolution,
        decimate_target=args.decimate_target,
        scales=scales,
        opacities=opacities,
    )
    write_obj(args.out, verts, faces)
    print(f"wrote {args.out}: {len(verts)} verts, {len(faces)} faces")


if __name__ == "__main__":
    main()
