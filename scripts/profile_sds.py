"""Bisected breakdown of the production SDS-on train step (VERDICT r3 #2).

The round-3 ledger has one number (SDS-on 0.956 steps/s = ~1.05 s) and no
attribution.  This script times each constituent program of the split-SDS
execution on the real chip and tags it with XLA's own cost analysis
(FLOPs + bytes accessed), yielding a PERFORMANCE.md-ready table:

  - unet        frozen 4-view UNet CFG pass (batch 8, 32x32 latents, bf16)
  - vae         VAE encode of the 4 gen views (256px, bf16)
  - gen_lite    the prelude's 4 forward-only lite gen renders (duplicate
                work vs the train step's own gen renders)
  - prelude     the full fused no-grad program (renders + VAE + UNet)
  - step_sds    the SDS train step (7 renders fwd+bwd, losses, VAE-with-
                grad, Adam) consuming a fixed target
  - step_nosds  the guidance-free build (for the delta)

MFU is vs the v5e bf16 peak (197 TFLOP/s); bandwidth vs ~819 GB/s HBM.
Run on the real chip:  python scripts/profile_sds.py [--iters 5]
"""

import argparse
import os

# These tools decompose/lower the SPLIT two-program structure (prelude +
# grad-half step); force it regardless of the production default.
os.environ["SOAR_BENCH_SDS_MODE"] = "split"
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
V5E_HBM_BPS = 819e9


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0)
        )
    except Exception:
        return 0.0, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench_trainstep as B
    from soar_tpu.guidance.build import build_guidance
    from soar_tpu.train.config import StageConfig
    from soar_tpu.train.trainer import make_gt_batch

    t0 = time.time()
    scene = B.build_scene()
    params, model, ds, cfg = scene
    print(f"[prof] scene: {time.time()-t0:.1f}s", file=sys.stderr)
    lpips_pair = B._random_lpips_fn()

    stage = StageConfig(training_stage=0, sds_start=0)
    guidance_fn = build_guidance(
        "imagedream", stage, key=jax.random.PRNGKey(1), mock=True,
        image_size=256, n_view=4, dtype=jnp.bfloat16,
    )
    state, fn, prelude, g, lvars = B.build_step(
        params, model, ds, cfg, guidance_fn, stage, lpips_pair
    )
    batch = make_gt_batch(ds, model, 0)
    batch["lpips_params"] = lvars
    if getattr(g, "vae_params", None) is not None:
        batch["guidance_vae"] = g.vae_params  # production transport shape
    ref_ip = None
    if g.embed_ref is not None:
        ref_ip = jax.block_until_ready(
            g.embed_ref(jnp.asarray(ds.normal_F[0]))
        )
        g.release_image_encoder()
    key = jax.random.PRNGKey(0)

    rows = []

    def timed(name, call, compiled_for_cost=None):
        try:
            _timed(name, call, compiled_for_cost)
        except Exception as e:  # noqa: BLE001 — a failed phase (OOM next to
            # resident diffusion weights) must not lose the earlier rows
            rows.append(dict(name=name, error=f"{type(e).__name__}: {e}"[:200]))
            print(f"[prof] {name} FAILED: {e}"[:200], file=sys.stderr)

    def _timed(name, call, compiled_for_cost=None):
        t0 = time.time()
        out = call()
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        print(f"[prof] {name} compile+1st: {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            for _ in range(args.iters):
                out = call()
            _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, (time.time() - t0) / args.iters)
        fl, byt = (
            _cost(compiled_for_cost) if compiled_for_cost is not None
            else (0.0, 0.0)
        )
        rows.append(
            dict(
                name=name,
                ms=round(best * 1000, 1),
                gflops=round(fl / 1e9, 1),
                mfu_pct=round(100 * fl / best / V5E_BF16_PEAK, 1),
                gbytes=round(byt / 1e9, 2),
                hbm_pct=round(100 * byt / best / V5E_HBM_BPS, 1),
            )
        )
        print(f"[prof] {name}: {best*1000:.1f} ms", file=sys.stderr)

    # ---- 1. UNet alone (CFG batch 8) ----
    uv = g.arg_params["unet"]
    text = g.arg_params["text"]
    lat = jnp.zeros((8, 32, 32, 4))
    tt = jnp.full((8,), 500, jnp.int32)
    cam16 = jnp.zeros((8, 16))
    ctx77 = jnp.concatenate(
        [jnp.tile(text[0][None], (4, 1, 1)), jnp.tile(text[1][None], (4, 1, 1))]
    )
    ip = jnp.concatenate(
        [jnp.tile(ref_ip[None], (4, 1, 1)), jnp.zeros((4,) + ref_ip.shape)]
    )
    from soar_tpu.guidance.build import NetworkShapes

    shapes = NetworkShapes.full()

    @jax.jit
    def unet_call(uv, lat, tt, ctx77, cam16, ip):
        ctx = {
            "context": ctx77.astype(jnp.bfloat16),
            "camera": cam16.astype(jnp.bfloat16),
            "ip": ip.astype(jnp.bfloat16),
            "num_frames": 4,
        }
        return shapes.unet.apply(uv, lat.astype(jnp.bfloat16), tt, ctx)

    unet_l = unet_call.lower(uv, lat, tt, ctx77, cam16, ip)
    unet_c = unet_l.compile()
    timed("unet_cfg8", lambda: unet_c(uv, lat, tt, ctx77, cam16, ip), unet_c)

    # ---- 2. VAE encode alone ----
    vv = g.arg_params["vae"]
    imgs = jnp.zeros((4, 256, 256, 3))

    @jax.jit
    def vae_call(vv, imgs, k):
        return shapes.vae.apply(vv, imgs.astype(jnp.bfloat16), k)

    vae_c = vae_call.lower(vv, imgs, key).compile()
    timed("vae_enc4", lambda: vae_c(vv, imgs, key), vae_c)

    # ---- 2b. the prelude's lite gen renders alone (avg-pool mock stubs
    # the VAE, no UNet) — the duplicate-render cost fused mode removes ----
    raw = fn.raw_step
    if raw.sds_prelude is not None:
        from soar_tpu.guidance.sds import mock_encoder

        mock_enc = mock_encoder(8)
        lite = jax.jit(
            lambda s, b, k: raw.sds_prelude(
                s, b, k, encode_latents=mock_enc
            )[0]
        )
        timed("gen_lite_renders", lambda: lite(state, batch, key))

    # ---- 3. prelude (fused no-grad half: lite renders + VAE + UNet) ----
    if prelude is not None:
        timed("prelude", lambda: prelude(state, batch, key, ref_ip=ref_ip))

    # ---- 4. SDS train step with fixed target ----
    tgt = jnp.zeros((4, 32, 32, 4))
    b2 = dict(batch)
    b2["sds_target"] = tgt
    step_l = fn.lower(state, b2, key)
    step_c = step_l.compile()

    def run_step():
        _, m = step_c(state, b2, key)
        return m["loss"]

    timed("step_sds_fixed_target", run_step, step_c)

    # ---- 5. full split step (prelude + step, the production sequence) ----
    def full():
        b3 = dict(batch)
        b3["sds_target"] = prelude(state, b3, key, ref_ip=ref_ip)
        _, m = fn(state, b3, key)
        return m["loss"]

    if prelude is not None:
        timed("full_split_step", full)

    # ---- 6. no-SDS build (for the delta).  May OOM next to the resident
    # diffusion weights + both SDS executables; timed() keeps prior rows.
    def no_sds():
        state0, fn0, _, _, _ = B.build_step(
            params, model, ds, cfg, None, StageConfig(training_stage=0),
            lpips_pair,
        )
        b0 = {k: v for k, v in batch.items()
              if k not in ("sds_target", "guidance_vae")}
        nosds_c = fn0.lower(state0, b0, key).compile()

        def run0():
            _, m = nosds_c(state0, b0, key)
            return m["loss"]

        timed("step_no_sds", run0, nosds_c)

    no_sds()

    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
