"""Multi-chip de-risk microbench (VERDICT r1 #9).

The sharded trainer path renders gen views as ``jax.vmap(render_view)`` with
the view axis GSPMD-sharded over the mesh, so each device executes a
BATCH-1 vmapped render — while the single-chip path unrolls views because
batched scatter/gather lowering was measured as a cliff on the TPU backend
(commit 1f9b4e5).  This script measures, on the real chip:

  1. unrolled single render fwd+bwd            (the single-chip formulation)
  2. vmap over a batch-1 camera fwd+bwd        (per-device GSPMD program)
  3. vmap over 4 cameras fwd+bwd               (the unsharded-vmap worst case)

If (2) ~ (1), the sharded path is sound: GSPMD's per-device program is the
batch-1 vmap.  If (2) cliffs, switch ``parallel/views.py`` to ``shard_map``
with the unrolled per-device body.

    python scripts/bench_vmap_render.py [--size 512] [--iters 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--small", action="store_true",
                    help="small body for quick CPU checks")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from soar_tpu.avatar import RenderSettings, render_view
    from soar_tpu.avatar.state import init_avatar
    from soar_tpu.body import make_test_body
    from soar_tpu.core.camera import camera_from_c2w
    from soar_tpu.data.cameras import CameraSampleConfig, sample_multiview_cameras
    from soar_tpu.field.attribute_field import AttributeFieldConfig
    from soar_tpu.field.hashgrid import HashGridConfig
    from soar_tpu.render.types import RasterConfig

    if args.small:
        body = make_test_body(num_joints=4, segments_per_bone=3, ring=8)
        fc = AttributeFieldConfig(
            grid=HashGridConfig(num_levels=4, min_res=4, max_res=64,
                                log2_hashmap_size=12),
            hidden_dim=16,
        )
        subdiv = 1
    else:
        body = make_test_body(num_joints=10, segments_per_bone=7, ring=28)
        fc = AttributeFieldConfig(
            grid=HashGridConfig(num_levels=16, min_res=16, max_res=2048,
                                log2_hashmap_size=18)
        )
        subdiv = 3
    F = 4
    rng = np.random.RandomState(0)
    sp = {
        "betas": np.zeros((1, body.num_betas), np.float32),
        "body_pose": (rng.randn(F, (body.num_joints - 1) * 3) * 0.05).astype(
            np.float32
        ),
        "global_orient": np.zeros((F, 3), np.float32),
        "transl": np.tile([[0.0, 0.9, -2.8]], (F, 1)).astype(np.float32),
    }
    params, model = init_avatar(
        body, {k: jnp.asarray(v) for k, v in sp.items()},
        num_subdiv=subdiv, field_cfg=fc, distill_steps=0,
    )
    size = (args.size, args.size)
    settings = RenderSettings(
        use_explicit=False, gen_view=True,
        raster=RasterConfig(max_per_tile=96, dup_side=3),
    )
    c2w, fovy = sample_multiview_cameras(
        jax.random.PRNGKey(0), CameraSampleConfig(n_view=4)
    )
    cams = jax.vmap(
        lambda c, f: camera_from_c2w(c, f, f, znear=0.1, zfar=100.0)
    )(c2w, fovy)
    cam0 = jax.tree_util.tree_map(lambda x: x[0], cams)
    cams1 = jax.tree_util.tree_map(lambda x: x[:1], cams)

    def render_loss(p, cam):
        out = render_view(p, model, cam, size, jnp.zeros(3), jnp.asarray(0),
                          settings)
        return jnp.sum(out["render"] ** 2)

    grad_single = jax.jit(jax.grad(render_loss))
    grad_vmap1 = jax.jit(
        jax.grad(lambda p, cs: jnp.sum(
            jax.vmap(lambda c: render_loss(p, c))(cs)))
    )
    grad_vmap4 = grad_vmap1  # same function; batch size differs by input

    def timeit(fn, *a):
        g = fn(*a)  # compile
        _ = float(jax.tree_util.tree_leaves(g)[0].ravel()[0])
        best = float("inf")
        for _rep in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                g = fn(*a)
            _ = float(jax.tree_util.tree_leaves(g)[0].ravel()[0])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    res = {
        "unrolled_1view_s": round(timeit(grad_single, params, cam0), 4),
        "vmap_batch1_s": round(timeit(grad_vmap1, params, cams1), 4),
        "vmap_batch4_s": round(timeit(grad_vmap4, params, cams), 4),
        "size": args.size,
        "n_surfels": int(params.xyz.shape[0]),
    }
    res["vmap1_over_unrolled"] = round(
        res["vmap_batch1_s"] / max(res["unrolled_1view_s"], 1e-9), 2
    )
    res["vmap4_over_4x_unrolled"] = round(
        res["vmap_batch4_s"] / max(4 * res["unrolled_1view_s"], 1e-9), 2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
