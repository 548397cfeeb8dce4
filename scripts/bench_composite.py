"""Composite-implementation microbench: XLA cumprod vs fused blocked Pallas.

Times the production render forward and forward+backward at 512px /
~125k-surfel scale with ``RasterConfig.composite`` set to each
implementation (:mod:`soar_tpu.render.block_composite` docstring has the
design).  Decides whether the Pallas kernel becomes the production default.

    python scripts/bench_composite.py [--size 512] [--iters 5] [--block 4]
    python scripts/bench_composite.py --small   # quick CPU sanity (interpret)
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--block", type=int, default=4)
    ap.add_argument("--small", action="store_true",
                    help="small body for quick CPU checks")
    ap.add_argument("--impls", default="xla,pallas",
                    help="comma list of composite impls to time (running "
                    "one lets a hung compile be retried without re-paying "
                    "the other's)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from soar_tpu.avatar import RenderSettings, render_view
    from soar_tpu.avatar.state import init_avatar
    from soar_tpu.body import make_test_body
    from soar_tpu.core.camera import camera_from_c2w
    from soar_tpu.data.cameras import (
        CameraSampleConfig,
        sample_multiview_cameras,
    )
    from soar_tpu.field.attribute_field import AttributeFieldConfig
    from soar_tpu.field.hashgrid import HashGridConfig
    from soar_tpu.render.types import RasterConfig

    t_setup = time.time()
    if args.small:
        body = make_test_body(num_joints=4, segments_per_bone=3, ring=8)
        fc = AttributeFieldConfig(
            grid=HashGridConfig(num_levels=4, min_res=4, max_res=64,
                                log2_hashmap_size=12),
            hidden_dim=16,
        )
        F = 4
        rng = np.random.RandomState(0)
        sp = {
            "betas": np.zeros((1, body.num_betas), np.float32),
            "body_pose": (
                rng.randn(F, (body.num_joints - 1) * 3) * 0.05
            ).astype(np.float32),
            "global_orient": np.zeros((F, 3), np.float32),
            "transl": np.tile([[0.0, 0.9, -2.8]], (F, 1)).astype(np.float32),
        }
        params, model = init_avatar(
            body, {k: jnp.asarray(v) for k, v in sp.items()},
            num_subdiv=1, field_cfg=fc, distill_steps=0,
        )
        args.size = min(args.size, 128)
    else:
        # The EXACT headline bench scene — and its on-disk cache (the
        # from-scratch init costs minutes over the axon tunnel).
        import bench_trainstep as B

        params, model, _ds, _cfg = B.build_scene()
    print(f"[composite] scene setup: {time.time()-t_setup:.1f}s",
          file=sys.stderr)
    size = (args.size, args.size)
    c2w, fovy = sample_multiview_cameras(
        jax.random.PRNGKey(0), CameraSampleConfig(n_view=1)
    )
    cam = camera_from_c2w(c2w[0], fovy[0], fovy[0], znear=0.1, zfar=100.0)

    def settings_for(impl):
        return RenderSettings(
            use_explicit=False, gen_view=True,
            raster=RasterConfig(max_per_tile=96, dup_side=3, composite=impl),
        )

    def timeit(fn, *a, label=""):
        t0 = time.perf_counter()
        out = fn(*a)  # compile
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        print(f"[composite] {label} compile+1st: "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        best = float("inf")
        for _rep in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"[composite] {label}: {best*1000:.1f} ms", file=sys.stderr)
        return best

    res = {"size": args.size, "n_surfels": int(params.xyz.shape[0])}
    vals = {}
    for impl in args.impls.split(","):
        st = settings_for(impl)

        def fwd(p, st=st):
            out = render_view(p, model, cam, size, jnp.zeros(3),
                              jnp.asarray(0), st)
            return out["render"]

        def loss(p, st=st):
            out = render_view(p, model, cam, size, jnp.zeros(3),
                              jnp.asarray(0), st)
            return (
                jnp.sum(out["render"] ** 2)
                + jnp.sum(out["normal"] * 0.3)
                + jnp.sum(out["occ"] * 0.1)
            )

        fwd_j = jax.jit(fwd)
        grad_j = jax.jit(jax.grad(loss))
        res[f"{impl}_fwd_s"] = round(
            timeit(fwd_j, params, label=f"{impl} fwd"), 4
        )
        res[f"{impl}_fwdbwd_s"] = round(
            timeit(grad_j, params, label=f"{impl} fwd+bwd"), 4
        )
        vals[impl] = (fwd_j(params), grad_j(params))

    # Numerical agreement of the two paths on the production scene.
    if "xla" in vals and "pallas" in vals:
        img_x, g_x = vals["xla"]
        img_p, g_p = vals["pallas"]
        res["img_max_abs_diff"] = float(jnp.max(jnp.abs(img_x - img_p)))
        gxl = jax.tree_util.tree_leaves(g_x)
        gpl = jax.tree_util.tree_leaves(g_p)
        res["grad_max_abs_diff"] = float(
            max(jnp.max(jnp.abs(a - b)) for a, b in zip(gxl, gpl))
        )
        res["pallas_fwd_speedup"] = round(
            res["xla_fwd_s"] / max(res["pallas_fwd_s"], 1e-9), 2
        )
        res["pallas_fwdbwd_speedup"] = round(
            res["xla_fwdbwd_s"] / max(res["pallas_fwdbwd_s"], 1e-9), 2
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
