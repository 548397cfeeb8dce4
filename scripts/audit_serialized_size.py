"""Attribute the cold-start transport floor (PERFORMANCE.md item 19 /
VERDICT r4 task 7): which parts of the production no-SDS train step own the
~227 MB of serialized executable that must cross the ~4-8 MB/s axon tunnel
on every process start?

Item 21 already ruled out baked constants (6.7 MB of the 227).  This
script measures the remaining hypothesis space by compiling a FAMILY of
programs at the production shape and reporting each serialized size:

  render_fwd      one forward render pass (render_view)
  render_grad     value_and_grad of a scalar loss of one render pass
                  (fwd + autodiff-bwd code for a single composite)
  step_no_sds     the full production no-SDS step (7 passes + field + Adam)
  step_k64        ditto at K=64             (does code scale with K?)
  step_bf16       ditto with bf16 composite (does code scale with dtype?)

If step_no_sds ~= render_grad x #passes the size is pass-replicated
compiled code — the lever would be program splitting with pass reuse
(at +1 dispatch/pass cost); if it's much larger, the overhead lives in
the optimizer/field/sort fusions instead.

Run ON the TPU (sizes are backend-specific; CPU executables don't proxy):

    python scripts/audit_serialized_size.py [--skip step_bf16 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def serialized_nbytes(compiled):
    """Size of the serialized executable (what the axon tunnel transports).

    Prefers the stable `jax.experimental.serialize_executable.serialize`
    (pickled tuple incl. the runtime executable) but falls back to the
    raw xla executable serialization when available."""
    try:
        exe = compiled.runtime_executable()
        return len(exe.serialize())
    except Exception:
        from jax.experimental import serialize_executable

        blob, _, _ = serialize_executable.serialize(compiled)
        return len(blob)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", action="append", default=[])
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench_trainstep import _random_lpips_fn, build_scene, build_step
    from soar_tpu.avatar import RenderSettings, render_view
    from soar_tpu.core.camera import camera_from_c2w
    from soar_tpu.render.types import RasterConfig
    from soar_tpu.train.config import StageConfig
    from soar_tpu.train.trainer import make_gt_batch

    params, model, ds, cfg = build_scene()
    lpips_pair = _random_lpips_fn()
    result = {"platform": jax.devices()[0].platform}

    cam = camera_from_c2w(
        jnp.eye(4), jnp.asarray(0.7), jnp.asarray(0.7), znear=0.1, zfar=100.0
    )

    def measure(name, make_compiled):
        if name in args.skip:
            return
        t0 = time.time()
        try:
            compiled = make_compiled()
            nb = serialized_nbytes(compiled)
            result[name + "_mb"] = round(nb / 1e6, 1)
            result[name + "_compile_s"] = round(time.time() - t0, 1)
        except Exception as e:  # noqa: BLE001 - report partial families
            result[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
        print(f"[{name}] {json.dumps({k: v for k, v in result.items() if k.startswith(name)})}",
              file=sys.stderr)

    def render_compiled(raster, grad=False):
        settings = RenderSettings(use_explicit=False, raster=raster)

        def fwd(p):
            out = render_view(
                p, model, cam, (512, 512), jnp.zeros(3), jnp.asarray(0),
                settings,
            )
            return jnp.sum(out["render"]) + jnp.sum(out["normal"])

        fn = jax.grad(fwd) if grad else fwd
        return jax.jit(fn).lower(params).compile()

    base = RasterConfig()
    measure("render_fwd", lambda: render_compiled(base))
    measure("render_grad", lambda: render_compiled(base, grad=True))

    def step_compiled(env=None):
        envs = env or {}
        old = {k: os.environ.get(k) for k in envs}
        os.environ.update(envs)
        try:
            state, fn, prelude, g, lvars = build_step(
                params, model, ds, cfg, None,
                StageConfig(training_stage=0), lpips_pair,
            )
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        batch = make_gt_batch(ds, model, 0)
        batch["lpips_params"] = lvars
        key = jax.random.PRNGKey(0)
        # fn is the jitted step (no-SDS => no fused wrapper): AOT-compile
        # with the exact batch signature.
        return fn.lower(state, batch, key).compile()

    measure("step_no_sds", step_compiled)
    measure("step_k64",
            lambda: step_compiled({"SOAR_BENCH_MAX_PER_TILE": "64"}))
    measure("step_bf16",
            lambda: step_compiled({"SOAR_BENCH_COMPOSITE_DTYPE": "bf16"}))

    print(json.dumps(result))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    main()
