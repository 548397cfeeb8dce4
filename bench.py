"""Benchmark: full training-step throughput (headline) + render FPS.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline derivation (BASELINE.md): the reference trains 2000 steps
(1000 s0 + 1000 s1; SDS gated off for s0's first 500) in ~40 min on an
RTX A5000 with 14 CUDA rasterizations + LPIPS per step and the ImageDream
VAE+UNet on the 1500 SDS steps (SURVEY §3.2) — i.e. ~0.83 steps/s averaged
over that 500 no-SDS / 1500 SDS mix.  The headline metric is OUR average
over the same mix (``bench_trainstep.run``: each step = 7 renders at 512px
over ~125k surfels, all losses incl. normal-LPIPS; SDS steps add the
320-ch ImageDream UNet + VAE + CLIP image prompt in bf16; fused Adam) vs
0.83 steps/s — the same end-to-end work as the reference.  The raw
SDS-on-step rate, no-SDS rate, and forward-render FPS at 512² (vs the
implied 11.7/s) ride along as secondary keys.  All use best-of-3 batches against
the ~3-7x shared-tenancy variance of the TPU tunnel; rasterizer overflow
counters are asserted 0.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from soar_tpu.avatar import RenderSettings, render_view
    from soar_tpu.avatar import state as S
    from soar_tpu.avatar.state import init_avatar
    from soar_tpu.body import make_test_body
    from soar_tpu.core.camera import camera_from_c2w
    from soar_tpu.field.attribute_field import AttributeFieldConfig
    from soar_tpu.field.hashgrid import HashGridConfig
    from soar_tpu.render.types import RasterConfig

    # ~110k-surfel body (SOAR scale: 2x-subdivided SMPL-X ~= 110k points).
    body = make_test_body(num_joints=10, segments_per_bone=7, ring=28)
    F = 4
    rng = np.random.RandomState(0)
    smpl_params = {
        "betas": np.zeros((1, body.num_betas), np.float32),
        "body_pose": (rng.randn(F, (body.num_joints - 1) * 3) * 0.05).astype(
            np.float32
        ),
        "global_orient": np.zeros((F, 3), np.float32),
        "transl": np.tile([[0.0, 0.9, -2.8]], (F, 1)).astype(np.float32),
    }
    field_cfg = AttributeFieldConfig(
        grid=HashGridConfig(
            num_levels=16, min_res=16, max_res=2048, log2_hashmap_size=18
        )
    )
    params, model = init_avatar(
        body,
        {k: jnp.asarray(v) for k, v in smpl_params.items()},
        num_subdiv=3,
        field_cfg=field_cfg,
        distill_steps=0,
    )
    n_surfels = int(params.xyz.shape[0])

    cam = camera_from_c2w(
        jnp.eye(4), jnp.asarray(0.7), jnp.asarray(0.7), znear=0.1, zfar=100.0
    )
    settings = RenderSettings(
        use_explicit=False,
        raster=RasterConfig(max_per_tile=96, dup_side=5),
    )

    @jax.jit
    def fwd(p, chain):
        # ``chain`` (a scalar fed from the previous iteration's output)
        # serializes iterations so one host pull at the end times the whole
        # batch — block_until_ready is unreliable on the axon transport.
        p2 = p._replace(xyz=p.xyz + chain * 1e-20)
        out = render_view(
            p2, model, cam, (512, 512), jnp.zeros(3), jnp.asarray(0), settings
        )
        return jnp.sum(out["render"]) * 1e-12

    # Warmup / compile (host pull forces completion).
    _ = float(fwd(params, jnp.zeros(())))

    # Best of 3 batches: the shared TPU tenancy shows ~3x run-to-run
    # variance, so a single batch under-reports; best-of is the standard
    # noisy-neighbor protocol.
    iters = 20
    fps = 0.0
    for _rep in range(3):
        t0 = time.perf_counter()
        s = jnp.zeros(())
        for _ in range(iters):
            s = fwd(params, s)
        _ = float(s)
        dt = time.perf_counter() - t0
        fps = max(fps, iters / dt)

    baseline_raster_per_s = 11.7  # see module docstring

    # Headline metric: the FULL training step (7 renders + losses + Adam at
    # production scale) vs the reference's 0.83 steps/s — the end-to-end
    # number a user feels.  Render FPS rides along as a secondary key.
    import bench_trainstep

    result = bench_trainstep.run()
    result[f"fwd_render_fps_512px_{n_surfels}surfels"] = round(fps, 2)
    result["fwd_render_fps_vs_baseline"] = round(
        fps / baseline_raster_per_s, 3
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
