"""Preprocessing-throughput benchmark (VERDICT r3 missing #3).

Times the three on-chip preprocessing stages at production shapes with
full-shape mock weights (values meaningless, COST exact — the same
on-device mock-init policy as the training bench, PERFORMANCE.md item 16):

  - sam        SAM ViT-H (1024px, encoder+decoder, the per-frame mask
               pass of ``preproc/compute_kp_and_mask.py``; the reference
               runs segment-anything on GPU —
               ``/root/reference/preproc/compute_kp_and_mask.py:52-67``)
  - normal     ECON NormalNet (two GlobalGenerators, 512px, front+back in
               one call; ``/root/reference/preproc/compute_normal.py:74-86``)
  - smplify    the SMPLify LBFGS refiner: one jitted step over ALL frames
               jointly at SMPL-X scale (~10.5k verts, 55 joints, full
               OpenPose-137 vertex landmarks;
               ``/root/reference/preproc/compute_smplx.py`` + utils.py)

Derived summary: an estimated end-to-end wall-clock for the reference's
"~400 frame" sequence (README.md:127 claims ~30 min for 400 frames, ~8 min
for dance_0, single GPU).  The derived number covers the network/optimizer
stages only — ffmpeg extraction and the external OpenPose/SMPLer-X gates
are host tools outside this chip benchmark.

Run on the real chip:   python scripts/bench_preproc.py [--iters N]
Quick CPU smoke:        JAX_PLATFORMS=cpu python scripts/bench_preproc.py --small
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(call, iters, reps, first_label):
    t0 = time.time()
    out = call()
    _ = float(jax_leaf(out))
    compile_s = time.time() - t0
    print(f"[preproc] {first_label} compile+1st: {compile_s:.1f}s",
          file=sys.stderr)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            out = call()
        _ = float(jax_leaf(out))
        best = min(best, (time.time() - t0) / iters)
    print(f"[preproc] {first_label}: {best*1000:.1f} ms", file=sys.stderr)
    return best, compile_s


def jax_leaf(out):
    import jax

    return jax.tree_util.tree_leaves(out)[0].ravel()[0]


def bench_sam(res, iters, reps, small, dtype):
    import jax
    import jax.numpy as jnp

    from soar_tpu.guidance.build import _random_like_on_device
    from soar_tpu.preproc.sam import SAM, SAMConfig

    cfg = SAMConfig() if not small else SAMConfig(
        img_size=128, embed_dim=64, depth=2, num_heads=2,
        global_attn_layers=(1,),
    )
    sam = SAM(cfg)
    S = cfg.img_size
    img = jnp.zeros((1, S, S, 3))
    pts = jnp.zeros((1, 3, 2))
    lbl = jnp.ones((1, 3))
    shapes = jax.eval_shape(sam.init, jax.random.PRNGKey(0), img, pts, lbl)
    variables = _random_like_on_device(jax.random.PRNGKey(1), shapes, dtype)

    @jax.jit
    def run(v, img, pts, lbl):
        return sam.apply(v, img.astype(dtype), pts, lbl)[1]

    best, compile_s = _timeit(
        lambda: run(variables, img, pts, lbl), iters, reps, f"sam_vith_{S}px"
    )
    res["sam_ms_per_frame"] = round(best * 1000, 1)
    res["sam_frames_per_s"] = round(1.0 / best, 2)
    res["sam_compile_s"] = round(compile_s, 1)
    return best


def bench_normal(res, iters, reps, small, dtype):
    import jax
    import jax.numpy as jnp

    from soar_tpu.guidance.build import _random_like_on_device
    from soar_tpu.preproc.normal_net import NormalNet

    S = 512 if not small else 64
    net = NormalNet()
    img = jnp.zeros((1, S, S, 3))
    shapes = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), img, img, img
    )
    variables = _random_like_on_device(jax.random.PRNGKey(1), shapes, dtype)

    @jax.jit
    def run(v, img):
        x = img.astype(dtype)
        return net.apply(v, x, x, x)[0]

    best, compile_s = _timeit(
        lambda: run(variables, img), iters, reps, f"econ_normalnet_{S}px"
    )
    res["normal_ms_per_frame"] = round(best * 1000, 1)
    res["normal_frames_per_s"] = round(1.0 / best, 2)
    res["normal_compile_s"] = round(compile_s, 1)
    return best


def bench_smplify(res, iters, reps, small, n_frames):
    """One jitted LBFGS step over all frames jointly — the exact program
    ``SMPLify._run_stage`` builds (same loss, same optax.lbfgs), at SMPL-X
    production scale: (55*4+1)*48 = 10,608 verts vs SMPL-X's 10,475."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from soar_tpu.body import make_test_body
    from soar_tpu.body.model import smplx_forward_full  # noqa: F401 (traced)
    from soar_tpu.preproc.smplify import (
        SMPLify,
        SMPLifyConfig,
        _to_6d,
    )

    if small:
        body = make_test_body(num_joints=55, segments_per_bone=1, ring=4)
        F = 2
    else:
        body = make_test_body(num_joints=55, segments_per_bone=4, ring=48)
        F = n_frames

    # Fabricated landmark tables (mapping machinery at full cost; the
    # proprietary SMPL-X npz cannot ship — tests/test_smplify.py pattern).
    rng = np.random.RandomState(3)
    V, Fc = body.num_verts, body.faces.shape[0]
    bary = rng.rand(51, 3).astype(np.float32)
    bary /= bary.sum(-1, keepdims=True)
    dyn_bary = rng.rand(79, 17, 3).astype(np.float32)
    dyn_bary /= dyn_bary.sum(-1, keepdims=True)
    body = body._replace(
        extra_joint_idxs=jnp.asarray(rng.randint(0, V, 21), jnp.int32),
        lmk_faces_idx=jnp.asarray(rng.randint(0, Fc, 51), jnp.int32),
        lmk_bary_coords=jnp.asarray(bary),
        dyn_lmk_faces_idx=jnp.asarray(rng.randint(0, Fc, (79, 17)), jnp.int32),
        dyn_lmk_bary_coords=jnp.asarray(dyn_bary),
    )

    fitter = SMPLify(body, cfg=SMPLifyConfig(), openpose137=True)
    params6 = _to_6d(
        {
            "betas": jnp.zeros((F, body.num_betas)),
            "body_pose": jnp.asarray(
                (rng.randn(F, 21 * 3) * 0.05).astype(np.float32)
            ),
            "global_orient": jnp.zeros((F, 3)),
            "transl": jnp.asarray(
                np.tile([[0.0, -7.0, -40.0]], (F, 1)).astype(np.float32)
            ),
        }
    )
    init6 = jax.tree_util.tree_map(jnp.copy, params6)
    W = H = 512
    K = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
    target = rng.rand(F, 137, 3).astype(np.float32)
    target[..., 0] *= W
    target[..., 1] *= H
    aux = (
        jnp.asarray(np.tile(K[None], (F, 1, 1))),
        jnp.asarray(np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)),
        jnp.asarray(target),
        jnp.ones((F,), jnp.float32) * 200.0,
    )

    loss_fn = lambda p: fitter._loss(  # noqa: E731
        p, {}, init6, *aux, ignore_hands=False
    )
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    @jax.jit
    def step(params, state):
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        return params, state, value

    state = opt.init(params6)

    t0 = time.time()
    p, s, v = step(params6, state)
    _ = float(v)
    compile_s = time.time() - t0
    print(f"[preproc] smplify F={F} compile+1st: {compile_s:.1f}s",
          file=sys.stderr)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        pp, ss = p, s
        for _ in range(iters):
            pp, ss, v = step(pp, ss)
        _ = float(v)
        best = min(best, (time.time() - t0) / iters)
    print(f"[preproc] smplify step: {best*1000:.1f} ms", file=sys.stderr)
    res["smplify_frames_joint"] = F
    res["smplify_ms_per_step"] = round(best * 1000, 1)
    res["smplify_steps_per_s"] = round(1.0 / best, 2)
    res["smplify_compile_s"] = round(compile_s, 1)
    # Production schedule: 20 body + 40 hand LBFGS steps over ALL frames.
    res["smplify_total_s_60steps"] = round(60 * best, 1)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for CPU smoke (timings meaningless)")
    ap.add_argument("--frames", type=int, default=400,
                    help="sequence length for the derived wall-clock")
    ap.add_argument("--phases", default="sam,normal,smplify")
    args = ap.parse_args()

    import jax.numpy as jnp

    dtype = jnp.bfloat16
    res = {"mock_weights": True, "dtype": "bfloat16",
           "frames_assumed": args.frames}
    phases = args.phases.split(",")
    t_sam = t_norm = None
    smplify_total = 0.0
    if "sam" in phases:
        t_sam = bench_sam(res, args.iters, args.reps, args.small, dtype)
    if "normal" in phases:
        t_norm = bench_normal(res, args.iters, args.reps, args.small, dtype)
    if "smplify" in phases:
        t_st = bench_smplify(
            res, args.iters, args.reps, args.small,
            min(args.frames, 400),
        )
        smplify_total = 60 * t_st

    if t_sam is not None and t_norm is not None:
        # Per frame: one SAM mask pass + one NormalNet call (front+back).
        per_frame = t_sam + t_norm
        total_s = per_frame * args.frames + smplify_total
        res["derived_per_frame_ms"] = round(per_frame * 1000, 1)
        res["derived_seq_min"] = round(total_s / 60.0, 2)
        # README.md:127: ~30 min for a 400-frame 2K-4K video, ~8 min dance_0.
        res["reference_seq_min"] = 30.0
        res["vs_baseline"] = round(30.0 / max(res["derived_seq_min"], 1e-9), 2)
        res["metric"] = f"preproc_{args.frames}frames_min"
        res["value"] = res["derived_seq_min"]
        res["unit"] = "min"
    print(json.dumps(res))


if __name__ == "__main__":
    main()
