"""Full training step at production scale (the driver's headline metric via
bench.py, which calls the phase functions here; also runnable directly:
    python bench_trainstep.py
First run populates the persistent compile cache; re-run for timings).

Baseline: the reference trains 2000 steps (1000 s0 + 1000 s1, SDS gated
off for s0's first 500) in ~40 min on an RTX A5000 (SURVEY §6) =
0.83 steps/s averaged over that 500 no-SDS / 1500 SDS mix; each SDS step
there does 14 CUDA rasterizations (7 renders), the normal-LPIPS loss
terms, AND the ImageDream VAE+UNet SDS forward (SURVEY §3.2).  Two
configurations are timed and combined into the same schedule average
(the headline vs 0.83); the raw SDS-on-step rate rides along:

- **SDS-on**: 7 renders at 512px over
  ~125k surfels, all losses including normal-LPIPS (random-init VGG16 — the
  computation, not the weights, is what costs), and the full-shape 320-ch
  ImageDream UNet + SD VAE guidance in bf16 (random-init; the reference
  runs half-precision weights) with the GT-crop CLIP/Resampler image prompt.
- **no-SDS**: the same step without the guidance — the schedule's first
  500 steps, and the configuration reference users run when SDS weights
  are absent.

Robustness protocol (round 3): every phase result is emitted as a COMPLETE
JSON line the moment the phase finishes (the driver keeps the last parsed
line, so a timeout mid-bench preserves all completed phases), phases run
under a wall-clock budget with graceful early exit, and the rasterizer
canaries (`raster_capped` must be 0 for hole-free images, `raster_dropped`
is benign) are REPORTED fields, never asserts — a tripped canary flags the
number instead of destroying the artifact.
"""

import json
import sys
import time


def _random_lpips_fn():
    """Random-init LPIPS-VGG16 distance fn — exercises the exact LPIPS
    computation graph for timing (converted weights change values, not
    cost).  Returns ``(fn(a, b, variables), variables)``: the variables
    ride in batch["lpips_params"] as a jit ARGUMENT (closure-captured VGG
    kernels baked ~56 MB of constants into the step executable —
    PERFORMANCE.md item 19)."""
    import jax
    import jax.numpy as jnp

    from soar_tpu.train.lpips import LPIPS

    net = LPIPS(dtype=jnp.bfloat16)  # the production loss-path default
    x = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x, x)

    def fn(a, b, variables):
        return jnp.mean(net.apply(variables, a[None], b[None]))

    return fn, variables


def _flatten_tree(prefix, tree, out):
    """Flatten a nested dict/list/NamedTuple-of-arrays into ``out`` with
    "/"-joined string keys (npz-serializable; list indices become "#NNN"
    segments so :func:`_unflatten_dict` can restore them as lists)."""
    if hasattr(tree, "_fields"):  # NamedTuple
        for f in tree._fields:
            _flatten_tree(f"{prefix}{f}/", getattr(tree, f), out)
    elif isinstance(tree, dict):
        for k in sorted(tree):
            _flatten_tree(f"{prefix}{k}/", tree[k], out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten_tree(f"{prefix}#{i:03d}/", v, out)
    else:
        import numpy as np

        out[prefix.rstrip("/")] = np.asarray(tree)


def _unflatten_dict(flat, prefix):
    """Rebuild the nested dict under ``prefix`` from "/"-joined keys
    ("#NNN" segments come back as list entries, in index order)."""
    tree = {}
    plen = len(prefix)
    for k in flat:
        if not k.startswith(prefix):
            continue
        parts = k[plen:].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[k]

    def fix(node):
        if not isinstance(node, dict):
            return node
        node = {k: fix(v) for k, v in node.items()}
        if node and all(k.startswith("#") for k in node):
            return [node[k] for k in sorted(node)]
        return node

    return fix(tree)


def _scene_cache_file():
    import os

    d = os.environ.get(
        "SOAR_SCENE_CACHE", os.path.expanduser("~/.cache/soar_tpu_scene")
    )
    if d == "0":
        return None
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return None
    # Tag pins every knob that shapes the cached arrays.
    return os.path.join(d, "bench_scene_10j7s28r_sub3_v2.npz")


def build_scene():
    """The production-scale bench scene (125k surfels, 512px, 8 frames,
    full attribute field) — shared with ``scripts/bench_sds_step.py`` so
    A/B knob sweeps measure EXACTLY the headline scene.  Returns
    ``(params, model, ds, cfg)``.

    The avatar-init arrays (subdivided template, 3-NN scales, kNN-IDW
    skinning weights, hash-field init — ~50 MB, dozens of device programs)
    are cached to ``~/.cache/soar_tpu_scene`` after the first build: over
    the axon tunnel the from-scratch init alone cost 217 s of the round-3
    driver window (VERDICT r3 weak #1); a cache hit replaces it with one
    npz read + lazy uploads (override dir with SOAR_SCENE_CACHE, disable
    with SOAR_SCENE_CACHE=0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from soar_tpu.avatar import init_avatar
    from soar_tpu.avatar.state import AvatarModel, AvatarParams
    from soar_tpu.body import make_test_body
    from soar_tpu.body.skinning import SkinningData
    from soar_tpu.data.dataset import AvatarDataset
    from soar_tpu.field.attribute_field import AttributeFieldConfig
    from soar_tpu.field.hashgrid import HashGridConfig
    from soar_tpu.train.config import TrainConfig

    body = make_test_body(num_joints=10, segments_per_bone=7, ring=28)
    F = 8
    rng = np.random.RandomState(0)
    sp = {
        "betas": np.zeros((1, body.num_betas), np.float32),
        "body_pose": (rng.randn(F, (body.num_joints - 1) * 3) * 0.05).astype(
            np.float32
        ),
        "global_orient": np.zeros((F, 3), np.float32),
        "transl": np.tile([[0.0, 0.9, -2.8]], (F, 1)).astype(np.float32),
    }
    fc = AttributeFieldConfig(
        grid=HashGridConfig(
            num_levels=16, min_res=16, max_res=2048, log2_hashmap_size=18
        )
    )
    cache = _scene_cache_file()
    loaded = False
    if cache is not None:
        import os

        if os.path.exists(cache):
            try:
                from functools import partial

                from soar_tpu.field.attribute_field import (
                    init_attribute_field,
                )

                flat = dict(np.load(cache))
                # The attribute field is pure RNG from (key, aabb, cfg):
                # regenerate it ON DEVICE in one compiled program instead of
                # uploading the ~540 MB of f32 hash tables through the
                # tunnel.  Same PRNGKey(seed=0) as init_avatar -> identical
                # values (threefry is platform-deterministic).
                field = jax.jit(partial(init_attribute_field, cfg=fc))(
                    jax.random.PRNGKey(0), jnp.asarray(flat["m/aabb"])
                )
                params = AvatarParams(
                    xyz=jnp.asarray(flat["p/xyz"]),
                    rotation=jnp.asarray(flat["p/rotation"]),
                    scaling=jnp.asarray(flat["p/scaling"]),
                    opacity=jnp.asarray(flat["p/opacity"]),
                    colors=jnp.asarray(flat["p/colors"]),
                    occ=jnp.asarray(flat["p/occ"]),
                    field=field,
                    latent_pose=jnp.asarray(flat["p/latent_pose"]),
                )
                model = AvatarModel(
                    body=body,
                    skin=SkinningData(
                        inv_mats=jnp.asarray(flat["m/skin/inv_mats"]),
                        cano_vertices=jnp.asarray(flat["m/skin/cano_vertices"]),
                        point_weights=jnp.asarray(flat["m/skin/point_weights"]),
                    ),
                    smpl_params={k: jnp.asarray(v) for k, v in sp.items()},
                    aabb=jnp.asarray(flat["m/aabb"]),
                    original_pos=jnp.asarray(flat["m/original_pos"]),
                    num_frames=F,
                    field_cfg=fc,
                )
                loaded = True
            except Exception as e:  # stale/corrupt cache: rebuild
                print(f"[bench] scene cache unreadable ({e!r}); rebuilding",
                      file=sys.stderr)
    if not loaded:
        params, model = init_avatar(
            body,
            {k: jnp.asarray(v) for k, v in sp.items()},
            num_subdiv=3,
            field_cfg=fc,
            distill_steps=0,
        )
        if cache is not None:
            flat = {}
            _flatten_tree("p/", params, flat)
            # Drop the RNG-reproducible field (regenerated on device at
            # load; its hash tables alone are ~540 MB).
            flat = {k: v for k, v in flat.items()
                    if not k.startswith("p/field/")}
            _flatten_tree("m/skin/", model.skin, flat)
            flat["m/aabb"] = np.asarray(model.aabb)
            flat["m/original_pos"] = np.asarray(model.original_pos)
            try:
                # atomic: concurrent readers never see a partial file
                # (suffix kept .npz: np.savez appends it otherwise)
                tmp = cache + f".tmp.{os.getpid()}.npz"
                np.savez(tmp, **flat)
                os.replace(tmp, cache)
                print(f"[bench] scene cache written: {cache}", file=sys.stderr)
            except OSError as e:
                print(f"[bench] scene cache write failed ({e!r})",
                      file=sys.stderr)

    H = W = 512
    K = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
    ds = AvatarDataset(
        images=rng.rand(F, H, W, 3).astype(np.float32),
        masks=(rng.rand(F, H, W) > 0.5).astype(np.float32),
        normal_F=rng.rand(F, 512, 512, 3).astype(np.float32),
        normal_B=rng.rand(F, 512, 512, 3).astype(np.float32),
        normal_mask=(rng.rand(F, 512, 512) > 0.5).astype(np.float32),
        images_crop=rng.rand(F, 512, 512, 3).astype(np.float32),
        masks_crop=(rng.rand(F, 512, 512) > 0.5).astype(np.float32),
        smpl_params=sp,
        w2c=np.eye(4, dtype=np.float32),
        Ks=np.tile(K[None], (F, 1, 1)),
        normal_Ks=np.tile(K[None], (F, 1, 1)),
        train_idx=list(range(F)),
        val_idx=[],
        test_idx=[],
    )
    # head_prob=0: close-up head draws legitimately footprint-cap a ~0.2%
    # tail of surfels (measured; near-zero visible pixels).  Body cameras
    # keep the capped==0 canary meaningful, and head views cost the same to
    # render so the timing is unaffected.
    cfg = TrainConfig(n_views=4, head_prob=0.0)
    return params, model, ds, cfg


# Single-chip v5e peaks for the roofline fields (override for other parts
# with SOAR_PEAK_FLOPS / SOAR_PEAK_HBM_BPS): 197 bf16 TFLOP/s on the MXU,
# 819 GB/s HBM.  The SDS step measures ~88% of HBM peak (PERFORMANCE.md
# item 20) — hbm_util is the meaningful roofline for this workload; mfu is
# reported against the bf16 peak for cross-framework comparison.
def _peaks():
    import os

    return (
        float(os.environ.get("SOAR_PEAK_FLOPS", 1.97e14)),
        float(os.environ.get("SOAR_PEAK_HBM_BPS", 8.19e11)),
    )


def step_cost(jit_fn, *args):
    """XLA-reported per-execution totals for a jitted fn at ``args``:
    ``{"flops": ..., "bytes": ...}`` — or None when the backend doesn't
    expose ``cost_analysis``.  ``lower()`` retraces on the host (seconds);
    ``compile()`` hits the persistent executable cache since the timed
    program was already built with identical shapes."""
    try:
        ca = jit_fn.lower(*args).compile().cost_analysis()
        d = ca[0] if isinstance(ca, (list, tuple)) else ca
        return {
            "flops": float(d.get("flops", 0.0)),
            "bytes": float(d.get("bytes accessed", 0.0)),
        }
    except Exception as e:  # noqa: BLE001 - roofline is best-effort telemetry
        print(f"[bench] cost_analysis unavailable: {e!r}", file=sys.stderr)
        return None


def roofline_fields(label, per_step_s, cost):
    """VERDICT r4 task 5: achieved GB/s + FLOP/s and their utilization vs
    the chip peaks, emitted with every bench run (the numbers every
    bytes-vs-flops optimization decision in PERFORMANCE.md is judged
    against)."""
    if cost is None or per_step_s <= 0:
        return {}
    peak_flops, peak_bps = _peaks()
    gbps = cost["bytes"] / per_step_s / 1e9
    tflops = cost["flops"] / per_step_s / 1e12
    return {
        f"hbm_gbps_{label}": round(gbps, 1),
        f"hbm_util_{label}": round(cost["bytes"] / per_step_s / peak_bps, 3),
        f"tflops_{label}": round(tflops, 2),
        f"mfu_{label}": round(cost["flops"] / per_step_s / peak_flops, 3),
    }


def _rasters():
    """Production raster configs + the SOAR_BENCH_* A/B override knobs
    (FAT_BUDGET/_FAT_GEN/_FAT_GT set the two-tier fat budget — 0 = single-
    tier 5x5 grid for every surfel; COMPOSITE=pallas routes every pass
    through the fused blocked-Pallas composite)."""
    import os

    from soar_tpu.render.types import RasterConfig

    comp = os.environ.get("SOAR_BENCH_COMPOSITE", "xla")
    # Capacity A/B knobs: K (max_per_tile) linearly scales the dominant
    # [NT, pixels, K] composite work of every render; dup_side bounds the
    # sort.  The capped==0 canary stays the acceptance gate for any sweep.
    # COMPOSITE_DTYPE=bf16 rides the [NT, pixels, K] intermediates in bf16
    # with f32 channel accumulation (RasterConfig.composite_dtype).
    mpt = int(os.environ.get("SOAR_BENCH_MAX_PER_TILE", "64"))
    dup = int(os.environ.get("SOAR_BENCH_DUP_SIDE", "5"))
    cdt = os.environ.get("SOAR_BENCH_COMPOSITE_DTYPE", "bf16")

    # Per-pass gen capacity (SOAR_BENCH_GEN_K): gen views render at the
    # guidance resolution and only feed the SDS latents, so their K can
    # ride below the GT K (image-space bound: scripts/bench_truncation.py
    # measures the gen view separately).
    gen_k = os.environ.get("SOAR_BENCH_GEN_K")

    def _raster(env, k=None):
        fb = os.environ.get(env, os.environ.get("SOAR_BENCH_FAT_BUDGET"))
        if fb is None and k is None:
            return None
        return RasterConfig(
            max_per_tile=int(k) if k is not None else mpt,
            dup_side=dup,
            fat_budget=int(fb) if fb is not None else RasterConfig().fat_budget,
            composite=comp, composite_dtype=cdt,
        )

    raster = RasterConfig(
        max_per_tile=mpt, dup_side=dup, composite=comp, composite_dtype=cdt
    )
    return (
        raster,
        _raster("SOAR_BENCH_FAT_GEN", k=gen_k),
        _raster("SOAR_BENCH_FAT_GT"),
    )


def build_step(params, model, ds, cfg, guidance_fn, stage, lpips_pair):
    """Build the EXACT production program pair cli.train runs: stage-0
    steps <= sds_start use a guidance-free build (two-tier raster
    everywhere, un-rematted), and later steps the SDS build (single-tier
    gen renders — the trainer's measured default next to resident diffusion
    weights — two-tier GT, split no-grad prelude)."""
    import jax

    from soar_tpu.train.trainer import init_train_state, make_train_step

    import os

    raster, raster_gen, raster_gt = _rasters()
    # Production execution mode (round-4 A/B, PERFORMANCE.md item 20):
    # the WHOLE SDS traces inside the train step with every weight tree
    # as a jit argument — measured 1.038 steps/s vs ~0.95 for the split
    # prelude at production knobs (the fused program deletes the split
    # mode's duplicate gen renders + VAE + one dispatch).  Override with
    # SOAR_BENCH_SDS_MODE=split for the two-program A/B reference.
    sds_mode = os.environ.get("SOAR_BENCH_SDS_MODE", "fused")
    # Gen-view render resolution (SOAR_BENCH_GEN_RES): the reference
    # renders gen at 512 then downsamples to 256 before the VAE; 256
    # renders AT the guidance resolution — 4x fewer gen-composite bytes.
    gen_res = int(os.environ.get("SOAR_BENCH_GEN_RES", "256"))
    H, W = ds.images.shape[1:3]
    state, opt = init_train_state(params, cfg, stage=stage)
    raw = make_train_step(
        model,
        cfg,
        stage,
        opt,
        gen_size=(gen_res, gen_res),
        gt_size=(H, W),
        normal_size=(512, 512),
        raster=raster,
        raster_gen=raster_gen,
        raster_gt=raster_gt,
        use_explicit=False,
        has_normals=True,
        # Arg-passing LPIPS: variables ride in batch["lpips_params"]
        # (PERFORMANCE.md item 19 — no VGG constants in the executable).
        lpips_fn=lpips_pair[0],
        lpips_via_batch=True,
        guidance_fn=guidance_fn,
        split_sds=guidance_fn is not None and sds_mode == "split",
        sds_via_params=guidance_fn is not None and sds_mode == "fused",
        # With selective remat (only the ~12 MB/view post-sort gathers
        # saved) the full vmap-4 gen batch fits next to the resident
        # diffusion weights and measures ~9% faster than sequential
        # chunks of 2 (0.946 vs 0.869 steps/s).
        gen_chunk=None,
        # GT residuals fit next to the (CLIP-freed) diffusion weights;
        # keeping them saves the GT re-render in the backward (~10%).
        remat_gt=False,
    )
    jit_fn = jax.jit(raw)
    # NOTE: donate_argnums=(0,) would halve state memory, but the
    # axon remote transport host-copies donated buffers and races
    # their deletion ("Array has been deleted"); leave undonated.
    if guidance_fn is not None and sds_mode == "fused":
        gparams = guidance_fn.arg_params

        def fn(state, batch, key):
            # Weights stay jit ARGUMENTS — this wrapper only re-passes the
            # same device buffers each call (pointers, not transfers).
            return jit_fn(state, batch, key, gparams)

        fn.cost_thunk = lambda state, batch, key: step_cost(
            jit_fn, state, batch, key, gparams
        )
        prelude = None
    else:
        fn = jit_fn
        fn.cost_thunk = lambda state, batch, key: step_cost(
            jit_fn, state, batch, key
        )
        # Fused no-grad half (renders + VAE + UNet target, one program,
        # weights as jit args) — 2 dispatches/step, not 3.
        prelude = (
            guidance_fn.make_fused_prelude(raw.sds_prelude)
            if raw.sds_prelude is not None
            else None
        )
    fn.raw_step = raw  # un-jitted step (profilers time sub-programs off it)
    return state, fn, prelude, guidance_fn, lpips_pair[1]


def time_steps(
    ds,
    model,
    state,
    step_fn,
    prelude,
    guidance_fn,
    label,
    iters=10,
    deadline=None,
    phase_budget_s=None,
    provisional_cb=None,
    lpips_vars=None,
    ref_ip=None,
):
    """Time the step.  Returns ``(steps_per_s, canaries_dict)``.

    Best-of-N batches (shared TPU tenancy shows ~3-7x run-to-run variance;
    single batches under-report badly); ``deadline`` (absolute
    ``time.time()`` value) trims batches — at least one always runs so a
    compile-heavy phase still yields a (flagged) number.

    ``phase_budget_s`` caps the WALL time of the timing batches (counted
    from after compile+first-step): a tenancy spike can stretch one batch
    to minutes even when the best batch is seconds, and an unbounded phase
    starves everything after it."""
    import jax
    import jax.numpy as jnp

    from soar_tpu.train.trainer import make_gt_batch

    key = jax.random.PRNGKey(0)
    batch = make_gt_batch(ds, model, 0)
    if lpips_vars is not None:
        batch["lpips_params"] = lpips_vars
    if prelude is not None and getattr(guidance_fn, "vae_params", None) is not None:
        # Split-SDS grad half: VAE variables ride as jit arguments (a
        # closure-captured VAE bakes ~75 MB of constants into the step
        # executable — scripts/audit_executable.py --sds).  Fused mode
        # passes the whole weight pytree via build_step's wrapper instead.
        batch["guidance_vae"] = guidance_fn.vae_params
    if (
        ref_ip is None
        and guidance_fn is not None
        and getattr(guidance_fn, "embed_ref", None) is not None
    ):
        # Per-frame ip tokens are precomputed once in production
        # (cli.train).  NOTE: callers that retry time_steps must embed
        # once THEMSELVES and pass ref_ip in — the CLIP tower is freed
        # after the first embed (phase_sds does this).
        ref_ip = jax.block_until_ready(
            guidance_fn.embed_ref(jnp.asarray(ds.normal_F[0]))
        )
        guidance_fn.release_image_encoder()
    if guidance_fn is not None and prelude is None and ref_ip is not None:
        # Fused mode reads the precomputed ip tokens from the batch.
        batch["ref_ip"] = ref_ip

    def one_step(state, batch, k):
        if prelude is not None:
            batch = dict(batch)
            batch["sds_target"] = prelude(state, batch, k, ref_ip=ref_ip)
        return step_fn(state, batch, k)

    t0 = time.time()
    state, metrics = one_step(state, batch, key)
    l = float(metrics["loss"])
    compile_s = time.time() - t0
    print(f"[{label}] compile+1st: {compile_s:.1f}s loss={l:.4f}",
          file=sys.stderr)
    if provisional_cb is not None:
        # One timed step emitted IMMEDIATELY: under severe shared-tenancy
        # degradation the timing batches below can outlive any budget, and
        # a kill mid-batch must not lose the phase entirely.
        key, k1 = jax.random.split(key)
        t0 = time.time()
        state, metrics = one_step(state, batch, k1)
        _ = float(metrics["loss"])
        provisional_cb(1.0 / max(time.time() - t0, 1e-9))
    # Sample until 3 CLEAN batches (within 2x of the best) or the budget
    # runs out: shared tenancy stretches individual batches to minutes
    # while healthy ones take seconds, so a fixed batch count either
    # under-reports (spiky batch counted) or starves later phases
    # (unbounded retries).  Best-of over clean batches, wall-bounded.
    dt = float("inf")
    batches = good = 0
    batch_dts = []
    phase_deadline = (
        time.time() + phase_budget_s if phase_budget_s is not None else None
    )
    while good < 3 and batches < 8:
        if (
            batches >= 1
            and phase_deadline is not None
            and time.time() > phase_deadline
        ):
            break
        est = dt if dt != float("inf") else None
        if (
            batches >= 1
            and deadline is not None
            and est is not None
            and time.time() + est > deadline
        ):
            break
        t0 = time.time()
        for _ in range(iters):
            key, k1 = jax.random.split(key)
            state, metrics = one_step(state, batch, k1)
        l = float(metrics["loss"])
        bdt = time.time() - t0
        batch_dts.append(round(bdt, 2))
        dt = min(dt, bdt)
        batches += 1
        if bdt <= 2.0 * dt:
            good += 1
    capped = float(metrics["raster_capped"])
    canaries = {
        # capped surfels = visible holes: must be 0 for the number to count
        # as a correct image; REPORTED (not asserted) so a tripped canary
        # flags the artifact instead of destroying it.
        "raster_capped": capped,
        "raster_capped_ok": capped == 0.0,
        "raster_dropped_far_splats": float(metrics["raster_dropped"]),
        "loss_finite": bool(l == l),
        f"compile_first_step_s_{label.replace('-', '_')}": round(compile_s, 1),
        f"timing_batches_{label.replace('-', '_')}": batches,
        # Raw per-batch wall times: a tenancy-stretched measurement
        # self-identifies (huge spread / single slow batch).
        f"batch_dts_{label.replace('-', '_')}": batch_dts,
    }
    cost_thunk = getattr(step_fn, "cost_thunk", None)
    if cost_thunk is not None and dt != float("inf"):
        # Roofline: XLA-reported bytes/FLOPs over the best measured step
        # time.  The fused production default covers the whole step in one
        # program; in split mode the batch here lacks the prelude's
        # sds_target so the retrace fails and step_cost returns None —
        # fields are simply absent for that A/B-only mode.
        canaries.update(
            roofline_fields(
                label.replace("-", "_"), dt / iters,
                cost_thunk(state, batch, key),
            )
        )
    return iters / dt, canaries


def _timed_with_retries(
    time_fn, suspect_below, deadline, sleep_s=45.0, max_attempts=3
):
    """Run ``time_fn() -> (rate, canaries)``; when the measured rate is
    implausibly low (tenancy spike) and budget remains, sleep and re-time —
    the program is already compiled, so a retry costs only waiting.  Best
    attempt wins; the attempt count is recorded."""
    s, canaries = time_fn()
    attempts = 1
    while (
        s < suspect_below
        and attempts < max_attempts
        and (deadline is None or time.time() < deadline - 3 * sleep_s)
    ):
        print(
            f"[bench] rate {s:.3f} steps/s looks tenancy-degraded; "
            f"retrying after {sleep_s:.0f}s",
            file=sys.stderr,
        )
        time.sleep(sleep_s)
        s2, c2 = time_fn()
        if s2 > s:
            s, canaries = s2, c2
        attempts += 1
    canaries["timing_attempts"] = attempts
    return s, canaries


def phase_no_sds(scene, lpips_fn, deadline=None):
    """Phase: guidance-free production step.  Returns a result fragment."""
    from soar_tpu.train.config import StageConfig

    params, model, ds, cfg = scene
    state, fn, prelude, g, lvars = build_step(
        params, model, ds, cfg, None, StageConfig(training_stage=0), lpips_fn
    )
    s, canaries = _timed_with_retries(
        lambda: time_steps(
            ds, model, state, fn, prelude, g, "no-sds", iters=5,
            deadline=deadline, phase_budget_s=120.0, lpips_vars=lvars,
        ),
        # Half the reference baseline: the recorded calm-window rate is
        # 1.59 steps/s, so anything under 0.4 is a tenancy artifact (or a
        # 4x true regression, which a retry also disambiguates).
        suspect_below=0.4,
        deadline=deadline,
    )
    frag = {
        "train_step_no_sds_steps_per_s": round(s, 3),
        "train_step_no_sds_vs_baseline": round(s / 0.83, 3),
        "minutes_per_2000_steps_no_sds": round(2000 / s / 60, 1),
    }
    frag.update(canaries)
    return frag, s


def phase_sds(scene, lpips_fn, deadline=None, provisional_cb=None):
    """Phase: full ImageDream-SDS production step.  Returns a fragment."""
    import jax
    import jax.numpy as jnp

    from soar_tpu.guidance.build import build_guidance
    from soar_tpu.train.config import StageConfig

    params, model, ds, cfg = scene
    stage = StageConfig(training_stage=0, sds_start=0)
    guidance_fn = build_guidance(
        "imagedream",
        stage,
        key=jax.random.PRNGKey(1),
        mock=True,
        image_size=256,
        n_view=4,
        dtype=jnp.bfloat16,
    )
    state, fn, prelude, g, lvars = build_step(
        params, model, ds, cfg, guidance_fn, stage, lpips_fn
    )
    # Embed the ip reference ONCE here (the CLIP tower is freed after),
    # so the tenancy-retry loop can re-run time_steps safely.
    ref_ip = None
    if g.embed_ref is not None:
        import jax as _jax
        import jax.numpy as _jnp

        ref_ip = _jax.block_until_ready(
            g.embed_ref(_jnp.asarray(ds.normal_F[0]))
        )
        g.release_image_encoder()
    s, canaries = _timed_with_retries(
        lambda: time_steps(
            ds, model, state, fn, prelude, g, "sds", iters=5,
            deadline=deadline, phase_budget_s=120.0,
            provisional_cb=provisional_cb, lpips_vars=lvars,
            ref_ip=ref_ip,
        ),
        # Calm-window SDS-on rate is ~0.95 steps/s (ledger item 7).
        suspect_below=0.25,
        deadline=deadline,
    )
    frag = {"train_step_sds_on_steps_per_s": round(s, 3)}
    for k, v in canaries.items():
        if k.startswith(("compile_", "timing_")) or not k.startswith(
            ("raster_", "loss_")
        ):
            frag[k] = v
        else:
            frag[k + "_sds"] = v
    return frag, s


def truncation_probe(params, model, n_pix=4096, image_size=(512, 512)):
    """Per-bench-run truncation canary (VERDICT r4 task 3): PSNR of the
    production tiled render against the EXACT reference-semantics oracle
    (``render/oracle.rasterize_oracle_at``) at ``n_pix`` deterministic
    probe pixels of the bench GT view.  A full-image oracle at 512px x
    125k surfels costs minutes; the probe costs seconds and rides along
    with every artifact.  NOTE the bench scene is FRESH-INIT — the
    worst case for per-tile truncation (PERFORMANCE.md item 24); the
    trained-state bound comes from scripts/bench_truncation.py --ckpt."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from soar_tpu.avatar import RenderSettings
    from soar_tpu.avatar.renderer import posed_gaussians, query_attributes
    from soar_tpu.core.camera import camera_from_c2w
    from soar_tpu.render.oracle import rasterize_oracle_at
    from soar_tpu.render.tiled import rasterize

    raster, _, _ = _rasters()
    settings = RenderSettings(use_explicit=False, raster=raster)
    attrs = query_attributes(params, model)
    g, _ = posed_gaussians(
        params, model, jnp.asarray(0), settings, attrs=attrs
    )
    cam = camera_from_c2w(
        jnp.eye(4), jnp.asarray(0.7), jnp.asarray(0.7), znear=0.1, zfar=100.0
    )
    H, W = image_size
    bg = jnp.zeros(3)
    out = jax.jit(
        lambda g: rasterize(g, cam, image_size, bg, raster)
    )(g)
    rng = np.random.RandomState(0)
    xs = rng.randint(0, W, n_pix)
    ys = rng.randint(0, H, n_pix)
    pix = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))
    o_color, o_normal, _d, o_opac, _t = jax.jit(
        lambda g, p: rasterize_oracle_at(g, cam, image_size, bg, p, raster)
    )(g, pix)
    t_color = np.asarray(out.color)[ys, xs]
    t_normal = np.asarray(out.normal)[ys, xs]
    o_color = np.asarray(o_color)
    o_normal = np.asarray(o_normal)
    m = np.asarray(o_opac) > 1e-3  # inside the oracle silhouette

    def psnr(a, b):
        mse = float(np.mean((a[m] - b[m]) ** 2))
        return float("inf") if mse == 0 else round(
            10.0 * float(np.log10(1.0 / mse)), 2
        )

    ov = np.asarray(out.overflow)
    return {
        "truncation_probe_pixels": int(m.sum()),
        "truncation_color_psnr_fresh_init": psnr(t_color, o_color),
        "truncation_normal_psnr_fresh_init": psnr(
            (t_normal + 1) / 2, (o_normal + 1) / 2
        ),
        "truncation_probe_dropped": int(ov[0]),
        "truncation_probe_capped": int(ov[1]),
    }


def schedule_average(s_plain, s_sds, n_surfels):
    """The reference's 0.83 steps/s is a SCHEDULE AVERAGE: its ~40 min
    covers 1000 s0 + 1000 s1 steps (``..._s0.yaml:137``), with SDS gated
    off for s0's first 500 steps (``gaussian_surfel_mvdream.py:53,441``)
    — i.e. 500 no-SDS + 1500 SDS steps.  The apples-to-apples headline is
    therefore OUR average over the same 500/1500 mix."""
    e2e_min = (500.0 / s_plain + 1500.0 / s_sds) / 60.0
    s_avg = 2000.0 / (e2e_min * 60.0)
    return {
        "metric": f"train_2000step_schedule_avg_512px_{n_surfels}surfels",
        "value": round(s_avg, 3),
        "unit": "steps/s",
        "vs_baseline": round(s_avg / 0.83, 3),
        "end_to_end_2000step_minutes": round(e2e_min, 1),
        "train_step_sds_on_vs_baseline_avg": round(s_sds / 0.83, 3),
    }


def run(include_sds: bool = True, emit=None, budget_s: float = None):
    """Phased runner (kept for direct invocation and older callers).

    ``emit(dict)`` is called with the cumulative result after each phase;
    returns the final dict."""
    deadline = time.time() + budget_s if budget_s else None
    scene = build_scene()
    n = int(scene[0].xyz.shape[0])
    lpips_fn = _random_lpips_fn()

    result = {}
    frag, s_plain = phase_no_sds(scene, lpips_fn, deadline)
    result.update(frag)
    result.update(
        {
            "metric": f"train_step_no_sds_512px_{n}surfels",
            "value": result["train_step_no_sds_steps_per_s"],
            "unit": "steps/s",
            "vs_baseline": result["train_step_no_sds_vs_baseline"],
        }
    )
    if emit:
        emit(result)

    if include_sds and (deadline is None or time.time() < deadline - 30):
        frag, s_sds = phase_sds(scene, lpips_fn, deadline)
        result.update(frag)
        result.update(schedule_average(s_plain, s_sds, n))
        if emit:
            emit(result)
    return result


if __name__ == "__main__":
    print(json.dumps(run(emit=lambda d: None)))
