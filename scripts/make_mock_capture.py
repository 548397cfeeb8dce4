"""Generate a synthetic on-disk capture in the production data layout.

Writes ``<out>/images/*.png``, ``masks/``, ``normal_F/``, ``normal_B``
(RGBA, mask in alpha) and ``smplx/params.pth`` — the exact directory
structure ``preproc/preprocess_custom.py`` produces and
``cli.train --dataroot`` consumes (``/root/reference/README.md:131-143``).

Default mode renders the GT SELF-CONSISTENTLY from the procedural test
body itself (the 512px analogue of ``data.dataset.make_synthetic_sequence``):
the avatar is posed per frame, auto-centered in the loader's ACTUAL GT
camera (``load_sequence`` bakes the reference's ``w2c[1:3] *= -1`` flip
— ``uncond_multiview.py:235`` — so the on-disk w2c is OpenCV-convention;
the in-view translation is found by rendering, not assumed), and the
front/back passes provide images, masks and both normal maps.  That makes
every GT loss term live: a training run must descend recon/mask/normal,
which is what a convergence artifact is for.  The earlier blob mode
(``--blob``) painted a mask the posed body cannot reach — GT terms froze
at data constants (mean mask 0.215) while SDS walked the geometry, which
is how the round-4 "evidence" ended up three step-0 lines.

Used with ``--smpl-model test:J,S,R`` to drive the FULL production
command path in this zero-egress environment:

    python scripts/make_mock_capture.py --out /tmp/mockcap \
        --frames 20 --size 512 --joints 10 --segments 7 --ring 28 --subdiv 3
    python -m soar_tpu.cli.train --dataroot /tmp/mockcap \
        --smpl-model test:10,7,28 --num-subdiv 3 --mock-guidance \
        --guidance imagedream --stage both --steps 1000 \
        --out outputs/evidence_r5/baseline
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_params(out, sp_np, K, S):
    import numpy as np
    import torch

    params = {
        "betas": torch.from_numpy(sp_np["betas"]),
        "body_pose": torch.from_numpy(sp_np["body_pose"]),
        "global_orient": torch.from_numpy(sp_np["global_orient"]),
        "transl": torch.from_numpy(sp_np["transl"]),
        "w2c": torch.from_numpy(np.eye(4, dtype=np.float32)),
        "Ks": torch.from_numpy(np.tile(K[None], (len(sp_np["transl"]), 1, 1))),
        "normal_Ks": torch.from_numpy(
            np.tile(K[None], (len(sp_np["transl"]), 1, 1))
        ),
        "img_wh": torch.tensor([S, S]),
    }
    torch.save(params, os.path.join(out, "smplx", "params.pth"))


def write_blob_frames(out, F, S, rng):
    """The legacy painted-blob GT (kept for data-path smoke tests where
    only the LAYOUT matters, not supervision consistency)."""
    import cv2
    import numpy as np

    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    for i in range(F):
        cx = S / 2 + 30 * np.sin(2 * np.pi * i / F)
        cy = S / 2
        r = ((xx - cx) ** 2 / (S * 0.18) ** 2 + (yy - cy) ** 2 / (S * 0.38) ** 2)
        mask = (r < 1.0).astype(np.uint8) * 255
        img = np.stack(
            [
                (0.5 + 0.5 * np.sin(xx / 37 + i)) * 255,
                (0.5 + 0.5 * np.cos(yy / 29)) * 255,
                np.full_like(xx, 140.0),
            ],
            -1,
        ).astype(np.uint8)
        img[mask == 0] = 0
        cv2.imwrite(os.path.join(out, f"images/{i:05d}.png"), img[..., ::-1])
        cv2.imwrite(os.path.join(out, f"masks/{i:05d}.png"), mask)
        nrm = np.stack(
            [
                np.full_like(xx, 127.0),
                np.full_like(xx, 127.0),
                np.full_like(xx, 255.0),
                mask.astype(np.float32),
            ],
            -1,
        ).astype(np.uint8)
        for sub in ("normal_F", "normal_B"):
            cv2.imwrite(
                os.path.join(out, f"{sub}/{i:05d}.png"), nrm[..., [2, 1, 0, 3]]
            )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--joints", type=int, default=10)
    ap.add_argument("--segments", type=int, default=7)
    ap.add_argument("--ring", type=int, default=28)
    ap.add_argument("--subdiv", type=int, default=1,
                    help="GT avatar subdivision.  The GT must render "
                    "TRUNCATION-FREE (--gt-k slots >= every tile's splat "
                    "count, asserted via the overflow counters); past "
                    "subdiv 1 the procedural body's surfels go sub-pixel "
                    "and per-tile counts exceed any affordable K "
                    "(PERFORMANCE.md item 24)")
    ap.add_argument("--gt-scale-mult", type=float, default=1.5,
                    help="scale_modifier for the GT renders (slight "
                    "overlap keeps the silhouette watertight)")
    ap.add_argument("--gt-k", type=int, default=512,
                    help="per-tile capacity for the one-off GT renders — "
                    "sized so NO splat is dropped (asserted): the GT is "
                    "an exact composite, unlike the bounded production K")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--blob", action="store_true",
                    help="legacy painted-blob GT (layout-only smoke data; "
                    "the blob is unreachable by the posed body, so GT "
                    "losses cannot descend)")
    ap.add_argument("--fill", type=float, default=0.75,
                    help="body height as a fraction of frame height")
    args = ap.parse_args(argv)

    import numpy as np

    rng = np.random.RandomState(args.seed)
    F, S = args.frames, args.size
    for sub in ("images", "masks", "normal_F", "normal_B", "smplx"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    from soar_tpu.body import make_test_body

    body = make_test_body(args.joints, args.segments, args.ring)
    v = np.asarray(body.v_template)
    y0, y1 = float(v[:, 1].min()), float(v[:, 1].max())
    height = y1 - y0
    focal = 1.1 * S
    dist = focal * height / (args.fill * S)

    sp = {
        "betas": np.zeros((1, body.num_betas), np.float32),
        "body_pose": (
            rng.randn(F, (body.num_joints - 1) * 3) * 0.05
        ).astype(np.float32),
        "global_orient": np.zeros((F, 3), np.float32),
        # transl z sign is CHOSEN BY RENDERING below (the loader's w2c
        # flip decides which half-space the GT camera sees).
        "transl": np.tile(
            [[0.0, -(y0 + y1) / 2.0, -dist]], (F, 1)
        ).astype(np.float32),
    }
    K = np.array(
        [[focal, 0, S / 2], [0, focal, S / 2], [0, 0, 1]], np.float32
    )
    write_params(args.out, sp, K, S)
    if args.blob:
        write_blob_frames(args.out, F, S, rng)
        print(f"wrote {F} blob frames @ {S}px + smplx/params.pth under "
              f"{args.out}")
        return

    # ---- rendered self-consistent GT ----
    import cv2
    import jax
    import jax.numpy as jnp

    from soar_tpu.avatar import RenderSettings, init_avatar, render_view
    from soar_tpu.data.dataset import load_sequence
    from soar_tpu.train.trainer import make_gt_batch

    # A placeholder frame so load_sequence yields the EXACT training-time
    # camera (w2c flip included) before the real frames exist.
    blank = np.zeros((S, S), np.uint8)
    cv2.imwrite(os.path.join(args.out, "images", "00000.png"),
                np.zeros((S, S, 3), np.uint8))
    cv2.imwrite(os.path.join(args.out, "masks", "00000.png"), blank)

    # Cheap probe avatar (subdiv 0) to pick the in-view transl z sign.
    probe_params, probe_model = init_avatar(
        body,
        {k: jnp.asarray(val) for k, val in sp.items()},
        num_subdiv=0,
        distill_steps=0,
        seed=args.seed,
    )
    settings = RenderSettings(use_explicit=True)
    ds = load_sequence(args.out)
    cam = make_gt_batch(ds, probe_model, 0)["gt_cam"]

    def coverage(tz):
        override = {
            k: jnp.asarray(val[0] if k != "betas" else val)
            for k, val in sp.items()
        }
        override["transl"] = jnp.asarray(
            [0.0, -(y0 + y1) / 2.0, tz], jnp.float32
        )
        out = render_view(
            probe_params, probe_model, cam, (S, S), jnp.zeros(3),
            jnp.asarray(0), settings, smpl_override=override,
        )
        return float((np.asarray(out["mask"]) > 0.5).mean())

    covs = {tz: coverage(tz) for tz in (-dist, dist)}
    tz = max(covs, key=covs.get)
    if covs[tz] < 0.01:
        raise SystemExit(f"GT camera sees no body at either z sign: {covs}")
    print(f"transl z={tz:+.2f} (coverage {covs[tz]:.3f}; "
          f"rejected {-tz:+.2f} at {covs[-tz]:.3f})", file=sys.stderr)
    sp["transl"] = np.tile(
        [[0.0, -(y0 + y1) / 2.0, tz]], (F, 1)
    ).astype(np.float32)
    write_params(args.out, sp, K, S)

    # Full-capacity GT avatar with a position-dependent coloring (the
    # training run starts from a FRESH init and must learn these colors —
    # the recon/PSNR convergence signal).
    params, model = init_avatar(
        body,
        {k: jnp.asarray(val) for k, val in sp.items()},
        num_subdiv=args.subdiv,
        distill_steps=0,
        seed=args.seed,
    )
    gt_colors = (np.tanh(np.asarray(params.xyz) * 3.0) + 1.0) / 2.0
    params = params._replace(
        colors=jnp.asarray(np.log(gt_colors / (1 - gt_colors + 1e-6) + 1e-6))
    )

    import dataclasses

    both = RenderSettings(
        use_explicit=True,
        both_faces=True,
        raster=dataclasses.replace(
            RenderSettings().raster,
            scale_modifier=args.gt_scale_mult,
            # Exact one-off composite: capacity above any per-tile count,
            # single-tier grid wide enough for the fattened footprints.
            max_per_tile=args.gt_k,
            dup_side=3,
            fat_budget=0,
        ),
    )

    @jax.jit
    def render_frame(frame_idx):
        front, back = render_view(
            params, model, cam, (S, S), jnp.zeros(3), frame_idx, both
        )
        return (
            front["render"], front["mask"], front["normal"], back["normal"],
            front["overflow"],
        )

    def to_u8(x):
        return np.clip(np.asarray(x) * 255.0 + 0.5, 0, 255).astype(np.uint8)

    covs_all = []
    for i in range(F):
        rgb, opac, n_f, n_b, overflow = render_frame(jnp.asarray(i))
        dropped, capped = (int(x) for x in np.asarray(overflow))
        if dropped or capped:
            raise SystemExit(
                f"GT frame {i} is NOT an exact composite (dropped="
                f"{dropped}, capped={capped}); raise --gt-k / lower "
                f"--subdiv / lower --gt-scale-mult"
            )
        mask = (np.asarray(opac) > 0.5).astype(np.uint8) * 255
        covs_all.append(float((mask > 0).mean()))
        rgb_u8 = to_u8(np.asarray(rgb) * (mask[..., None] > 0))
        cv2.imwrite(
            os.path.join(args.out, f"images/{i:05d}.png"), rgb_u8[..., ::-1]
        )
        cv2.imwrite(os.path.join(args.out, f"masks/{i:05d}.png"), mask)
        for sub, nrm in (("normal_F", n_f), ("normal_B", n_b)):
            rgba = np.dstack([to_u8(nrm), mask])
            cv2.imwrite(
                os.path.join(args.out, f"{sub}/{i:05d}.png"),
                rgba[..., [2, 1, 0, 3]],
            )
    if min(covs_all) < 0.6 * covs[tz]:
        raise SystemExit(
            f"full-res GT coverage collapsed ({min(covs_all):.4f} vs probe "
            f"{covs[tz]:.4f}) — per-tile K truncation is punching holes; "
            f"lower --subdiv or raise --gt-scale-mult"
        )
    print(
        f"wrote {F} rendered frames @ {S}px (coverage "
        f"{min(covs_all):.3f}-{max(covs_all):.3f}, probe {covs[tz]:.3f}) "
        f"+ smplx/params.pth under {args.out}"
    )


if __name__ == "__main__":
    main()
