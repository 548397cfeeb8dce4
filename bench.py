"""Benchmark: full training-step throughput (headline) + render FPS.

Streams one COMPLETE JSON line per finished phase (cumulative — the last
line printed is always the best-available result) and runs under a
wall-clock budget (SOAR_BENCH_BUDGET seconds, default 480) with graceful
early exit, so a timeout or mid-phase failure preserves every completed
phase instead of discarding the run.  Exit code is 0 whenever at least
one phase landed.

Phase order (fastest-compiling, headline-critical first):
  1. no-SDS production train step   (7 renders @512px/125k surfels, all
     losses incl. normal-LPIPS, fused Adam)
  2. forward render FPS @512px
  3. SDS-on production train step   (+ full-shape bf16 ImageDream
     UNet/VAE + CLIP image prompt, split no-grad prelude)
  4. 2000-step schedule average     (500 no-SDS + 1500 SDS mix — the
     apples-to-apples headline vs the reference's 0.83 steps/s / ~40 min
     on an RTX A5000, BASELINE.md)
  5. truncation probe               (tiled vs exact-oracle PSNR at 4096
     probe pixels — the per-run image-space bound on the bounded-K
     composite approximation, PERFORMANCE.md items 24-25)

Rasterizer canaries (`raster_capped` must be 0; `raster_dropped` is
bounded by the truncation probe, not assumed benign) are reported
fields.  Roofline fields (hbm_util / mfu) ride with each timed phase.
All timings best-of-3 batches against the ~3-7x shared-tenancy variance
of the TPU tunnel.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _emit(result):
    print(json.dumps(result), flush=True)


def main():
    # 900 s of PHASE time, started AFTER scene setup: under tunnel/tenancy
    # degradation the scene build alone can eat minutes, and with per-phase
    # streaming an outer kill only truncates (the driver keeps the last
    # parsed line) — a longer internal budget buys retry chances, never
    # risks the artifact.
    budget = float(os.environ.get("SOAR_BENCH_BUDGET", "900"))

    import jax
    import jax.numpy as jnp

    import bench_trainstep as B

    result = {"phases_completed": [], "phases_skipped": []}

    t_setup = time.time()
    scene = B.build_scene()
    params, model, ds, cfg = scene
    n = int(params.xyz.shape[0])
    lpips_fn = B._random_lpips_fn()
    deadline = time.time() + budget
    print(f"[bench] scene setup: {time.time()-t_setup:.1f}s", file=sys.stderr)

    # ---- Phase 1: no-SDS production train step (headline fallback) ----
    s_plain = None
    try:
        frag, s_plain = B.phase_no_sds(scene, lpips_fn, deadline)
        result.update(frag)
        result["phases_completed"].append("no_sds_step")
        result.update(
            {
                "metric": f"train_step_no_sds_512px_{n}surfels",
                "value": frag["train_step_no_sds_steps_per_s"],
                "unit": "steps/s",
                "vs_baseline": frag["train_step_no_sds_vs_baseline"],
            }
        )
        _emit(result)
    except Exception as e:  # noqa: BLE001 - a phase failure must not kill the artifact
        result["error_no_sds"] = f"{type(e).__name__}: {e}"[:300]
        _emit(result)

    # ---- Phase 2+3: SDS-on step and the schedule-average headline ----
    # Runs BEFORE render FPS: the SDS steady-state rate is the scarce
    # number (render FPS is cheap and already on record), and shared-
    # tenancy spikes can turn any earlier phase into minutes of wall-clock.
    if s_plain is not None and time.time() < deadline - 60:
        try:

            def _provisional(rate):
                result["train_step_sds_on_steps_per_s_provisional"] = round(
                    rate, 3
                )
                result["sds_provisional_note"] = (
                    "single step timed right after compile; superseded by "
                    "train_step_sds_on_steps_per_s when batches complete"
                )
                _emit(result)

            frag, s_sds = B.phase_sds(
                scene, lpips_fn, deadline, provisional_cb=_provisional
            )
            result.update(frag)
            result.update(B.schedule_average(s_plain, s_sds, n))
            result["phases_completed"].append("sds_step")
            _emit(result)
        except Exception as e:  # noqa: BLE001
            result["error_sds"] = f"{type(e).__name__}: {e}"[:300]
            _emit(result)
    else:
        result["phases_skipped"].append("sds_step")
        _emit(result)

    # ---- Phase 4: forward render FPS at 512px ----
    if time.time() < deadline - 30:
        try:
            fps, roof = _render_fps(params, model, deadline)
            result.update(roof)
            baseline_raster_per_s = 11.7  # implied by 0.83 steps/s x 14 rasters
            result[f"fwd_render_fps_512px_{n}surfels"] = round(fps, 2)
            result["fwd_render_fps_vs_baseline"] = round(
                fps / baseline_raster_per_s, 3
            )
            result["phases_completed"].append("render_fps")
            _emit(result)
        except Exception as e:  # noqa: BLE001
            result["error_render_fps"] = f"{type(e).__name__}: {e}"[:300]
            _emit(result)
    else:
        result["phases_skipped"].append("render_fps")
        _emit(result)

    # ---- Phase 5: truncation canary (tiled vs exact oracle, probe px) ----
    if time.time() < deadline:
        try:
            result.update(B.truncation_probe(params, model))
            result["phases_completed"].append("truncation_probe")
            _emit(result)
        except Exception as e:  # noqa: BLE001
            result["error_truncation_probe"] = f"{type(e).__name__}: {e}"[:300]
            _emit(result)
    else:
        result["phases_skipped"].append("truncation_probe")
        _emit(result)

    sys.exit(0 if result["phases_completed"] else 1)


def _render_fps(params, model, deadline):
    import jax
    import jax.numpy as jnp

    from soar_tpu.avatar import RenderSettings, render_view
    from soar_tpu.core.camera import camera_from_c2w
    from soar_tpu.render.types import RasterConfig

    cam = camera_from_c2w(
        jnp.eye(4), jnp.asarray(0.7), jnp.asarray(0.7), znear=0.1, zfar=100.0
    )
    settings = RenderSettings(
        use_explicit=False,
        raster=RasterConfig(max_per_tile=64, dup_side=5, composite_dtype="bf16"),
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

    t0 = time.time()
    _ = float(fwd(params, jnp.zeros(())))
    print(f"[render] compile+1st: {time.time()-t0:.1f}s", file=sys.stderr)

    iters = 20
    fps = 0.0
    rep_fps = []
    phase_deadline = time.time() + 60.0  # tenancy-spike wall cap
    for _rep in range(3):
        if fps > 0.0 and time.time() > phase_deadline:
            break
        if fps > 0.0 and time.time() + iters / fps > deadline:
            break
        t0 = time.time()
        s = jnp.zeros(())
        for _ in range(iters):
            s = fwd(params, s)
        _ = float(s)
        dt = time.time() - t0
        rep_fps.append(round(iters / dt, 2))
        fps = max(fps, iters / dt)
    import bench_trainstep as B

    roof = B.roofline_fields(
        "render", 1.0 / fps, B.step_cost(fwd, params, jnp.zeros(()))
    )
    # Per-rep rates: a tenancy-stretched render measurement self-identifies
    # (the r1->r4 18.66-vs-19.88 "regression" was invisible in a single
    # best-of number — VERDICT r4 weak #6).
    roof["render_rep_fps"] = rep_fps
    return fps, roof


if __name__ == "__main__":
    main()
