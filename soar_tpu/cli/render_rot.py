"""Standalone inference: checkpoint -> 360° turntable renders.

Rebuild of ``test/render_rot.py`` (``:116-197``): load a trained avatar,
compose each of 36 azimuth steps with the first frame's global orientation
(``global_orient_i = R_0 @ Ry(2*pi*i/36)``), render rgb / normal / occ / mask
through the frame-0 camera, write pngs (+ mp4 when a video backend exists).

    python -m soar_tpu.cli.render_rot --dataroot ... --smpl-model ... \
        --ckpt outputs/run/stage1 --out outputs/run/rot

``--synthetic`` renders the procedural fixture without any downloads.
"""

from __future__ import annotations

import argparse
import os


def run_turntable(out_dir, ds, params, model, use_explicit, num_views=36,
                  attrs=None, composite="xla"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..avatar import RenderSettings, render_view
    from ..core.transforms import batch_rodrigues, rotmat_to_rotvec
    from ..render.types import RasterConfig
    from ..train.evaluate import save_png, try_save_mp4
    from ..train.trainer import make_gt_batch

    os.makedirs(out_dir, exist_ok=True)
    settings = RenderSettings(
        use_explicit=use_explicit, raster=RasterConfig(composite=composite)
    )
    H, W = ds.image_size
    cam = make_gt_batch(ds, model, 0)["gt_cam"]

    # First frame's root orientation as a matrix; compose with the turntable
    # azimuth (``render_rot.py:159-164``).
    go0 = jnp.asarray(ds.smpl_params["global_orient"][0]).reshape(1, 3)
    R0 = batch_rodrigues(go0)[0]

    render = jax.jit(
        lambda p, ov: render_view(
            p,
            model,
            cam,
            (H, W),
            jnp.ones(3),
            jnp.asarray(0),
            settings,
            attrs=attrs,
            smpl_override=ov,
        )
    )

    buckets = {"rgb": [], "normal": [], "occ": [], "mask": []}
    for i in range(num_views):
        angle = 2.0 * np.pi * i / num_views
        c, s = np.cos(angle), np.sin(angle)
        Ry = jnp.asarray(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32))
        R = R0 @ Ry
        # Hardened quaternion log map (exact at pi — a camera-facing
        # global_orient is conventionally ~pi about x).
        out = render(params, {"global_orient": rotmat_to_rotvec(R)})
        frame = {
            "rgb": np.asarray(out["render"]),
            "normal": np.asarray(out["normal"]),
            "occ": np.asarray(out["occ"]),
            "mask": np.asarray(out["mask"])[..., None].repeat(3, -1),
        }
        for name, img in frame.items():
            buckets[name].append(img)
            save_png(os.path.join(out_dir, f"{name}_{i:03d}.png"), img)

    for name in ("rgb", "normal", "occ"):
        if not try_save_mp4(os.path.join(out_dir, f"{name}.mp4"), buckets[name]):
            print(f"[warn] no mp4 backend; {name} left as pngs")
    print(f"wrote {num_views} views to {out_dir}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", type=str, default=None)
    ap.add_argument("--smpl-model", type=str, default=None)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--out", type=str, default="outputs/rot")
    ap.add_argument("--num-views", type=int, default=36)
    ap.add_argument("--num-subdiv", type=int, default=2)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--use-explicit", action="store_true")
    ap.add_argument(
        "--composite", type=str, default="xla", choices=["xla", "pallas"],
        help="rasterizer composite implementation (RasterConfig.composite)",
    )
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..data.dataset import make_synthetic_sequence
    from ..io.checkpoint import load_avatar

    if args.synthetic:
        if not args.ckpt:
            # Render the fixture's own params/model (known coloring).
            ds, (gt_params, gt_model) = make_synthetic_sequence(
                num_frames=8, image_size=(128, 128)
            )
            run_turntable(
                args.out, ds, gt_params, gt_model, True, args.num_views
            )
            return
        # The ONE shared synthetic-avatar construction — must match
        # ``cli.train --synthetic`` or checkpoints stop round-tripping.
        from .common import synthetic_setup

        ds, params, model = synthetic_setup(distill_steps=0)
    else:
        from .common import real_setup

        ds, params, model = real_setup(
            args.dataroot, args.smpl_model,
            num_subdiv=args.num_subdiv, distill_steps=0,
        )

    attrs = None
    force_explicit = False
    if args.ckpt:
        if args.ckpt.endswith(".ckpt"):
            from ..io.checkpoint import (
                import_reference_ckpt,
                import_reference_field_from_ckpt,
                load_reference_state_dict,
            )

            ref_sd = load_reference_state_dict(args.ckpt)
            mapped = import_reference_ckpt(
                args.ckpt, like=params, state_dict=ref_sd
            )
            params = params._replace(
                **{k: jnp.asarray(v) for k, v in mapped.items()}
            )
            if not args.use_explicit:
                # Field-driven rendering: the reference queries the field at
                # the canonical points once per render
                # (``test/render_rot.py:129-135``, ``diff_gaussian_
                # rasterizer.py:88-102``); canonical xyz is fixed at
                # inference, so one evaluation serves every view.
                rf = import_reference_field_from_ckpt(
                    args.ckpt, state_dict=ref_sd
                )
                if rf is not None:
                    from ..field.reference_import import reference_field_apply

                    attrs = reference_field_apply(rf, params.xyz)
                    print("imported reference attribute field "
                          f"({'tcnn' if rf.tcnn else 'torch'} layout)")
                else:
                    print("[warn] reference ckpt has no attribute field; "
                          "rendering with explicit params")
                    force_explicit = True
        else:
            params, _ = load_avatar(args.ckpt, params)

    run_turntable(
        args.out,
        ds,
        params,
        model,
        args.use_explicit or force_explicit or args.ckpt is None,
        args.num_views,
        attrs=attrs,
        composite=args.composite,
    )


if __name__ == "__main__":
    main()
