"""Two-stage training driver.

Replaces ``scripts/run_*.sh`` + threestudio ``launch.py`` + the Lightning
Trainer (SURVEY §3.1) with one CLI:

    python -m soar_tpu.cli.train --dataroot data/custom/dance_0 \
        --smpl-model data/smpl_related/models/smplx/SMPLX_NEUTRAL.npz \
        --out outputs/dance_0 [--stage both] [--steps 1000]

Stage 0 supervises geometry (normals), stage 1 texture (RGB)
(``configs/gaussiansurfel_imagedream_s0.yaml`` / ``_s1.yaml``); the stage-1
run resumes from the stage-0 checkpoint exactly like the reference's
``geometry_convert_from="resume:..."`` hand-off.

``--synthetic`` trains on the procedurally generated fixture (no data or
SMPL-X download needed) — the smoke-test path.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def resolve_stage_cfg(yaml_cfg, st: int, steps_arg):
    """Stage config precedence: an explicitly passed ``--steps`` wins, else
    the YAML's ``trainer.max_steps`` stands (schedules — C() anneals, the
    SDS warm-up — key off max_steps, so silently overriding it would shift
    them), else the 1000-step default."""
    import dataclasses as dc

    from ..train.config import StageConfig, stage1_config

    if yaml_cfg is not None and yaml_cfg["stage"].training_stage == st:
        stage_cfg = yaml_cfg["stage"]
        if steps_arg is not None:
            stage_cfg = dc.replace(stage_cfg, max_steps=steps_arg)
        return stage_cfg
    n = 1000 if steps_arg is None else steps_arg
    return StageConfig(max_steps=n) if st == 0 else stage1_config(n)


def resolve_cli_stage(arg_stage, yaml_cfg) -> str:
    """Resolve the stage(s) to run: an EXPLICIT --stage (including "both")
    always wins; otherwise a --config YAML's single stage; otherwise both.
    (Review finding: "both" doubled as the argparse default, so the YAML
    stage unconditionally replaced it and two-stage --config runs were
    impossible.)"""
    if arg_stage is not None:
        return arg_stage
    if yaml_cfg is not None:
        ys = yaml_cfg["stage"]
        print(f"--config defines stage {ys.training_stage}; running only "
              "that stage (pass --stage 0|1|both to override)")
        return str(ys.training_stage)
    return "both"


def resolve_guidance_kind(kind: str, from_yaml: bool, *, ckpt, embeddings,
                          clip_dir, mock: bool) -> str:
    """Gate guidance on its user-supplied weights.  A YAML-requested
    guidance degrades (loudly) to reconstruction-only when the weights are
    absent; an explicitly passed ``--guidance`` is a hard error instead."""
    if kind == "none":
        return kind
    missing = []
    if not (ckpt or mock):
        missing.append("--guidance-ckpt (or --mock-guidance)")
    if not (embeddings or clip_dir or mock):
        missing.append(
            "--prompt-embeddings / --clip-model-dir (or --mock-guidance)"
        )
    if not missing:
        return kind
    msg = (f"guidance '{kind}' needs user-supplied weights: "
           f"missing {'; '.join(missing)}")
    if from_yaml:
        print(f"warning: {msg} — training WITHOUT SDS guidance (pass the "
              "weights, --mock-guidance, or an explicit --guidance to "
              "silence)")
        return "none"
    raise SystemExit(msg)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config", type=str, default=None,
        help="YAML config (soar_tpu configs/*.yaml or an original reference "
        "threestudio-soar YAML); CLI flags explicitly passed still win",
    )
    ap.add_argument("--dataroot", type=str, default=None)
    ap.add_argument("--smpl-model", type=str, default=None)
    ap.add_argument("--out", type=str, default="outputs/run")
    ap.add_argument(
        "--stage", type=str, default=None, choices=["0", "1", "both"],
        help="default: the --config YAML's stage if given, else both",
    )
    ap.add_argument(
        "--steps", type=int, default=None,
        help="steps per stage (default: the YAML's trainer.max_steps when "
        "--config is given, else 1000)",
    )
    ap.add_argument("--num-subdiv", type=int, default=2)
    ap.add_argument(
        "--n-views", type=int, default=None,
        help="SDS gen views per step (default: the YAML's data.n_view when "
        "--config is given, else 4) — None sentinel so a --config value "
        "is not stomped by an argparse default",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--use-explicit", action="store_true")
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--import-ckpt", type=str, default=None,
                    help="warm-start from a REFERENCE Lightning .ckpt "
                    "before training: explicit surfel params map by name; "
                    "in field-driven (non --use-explicit) runs the "
                    "reference attribute field is distilled into the hash "
                    "field (docs/REAL_WEIGHTS.md §5)")
    ap.add_argument("--eval", action="store_true", help="run test split at end")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--dump-every", type=int, default=250)
    ap.add_argument(
        "--save-every", type=int, default=0,
        help="mid-stage checkpoint every N steps to <out>/stage<K> (0 = "
        "stage-end only). A crashed/killed run then restarts from the "
        "last save via --resume <out>/stage<K> — the stage loop "
        "continues at the saved step. Written for the axon transport's "
        "host-side memory growth (~GB-scale over hundreds of steps), "
        "which can OOM a long run through no fault of the device program",
    )
    ap.add_argument("--val-every", type=int, default=250)
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument(
        "--lpips-weights",
        type=str,
        default=None,
        help="converted LPIPS-VGG16 pickle (see train/lpips.py); enables "
        "the normal-LPIPS terms and the LPIPS eval metric (the vgg RGB "
        "term additionally needs --lambda-vgg > 0)",
    )
    ap.add_argument(
        "--lambda-vgg",
        type=float,
        default=0.0,
        help="weight of the VGG/LPIPS RGB loss (reference _fs configs use "
        "0.1); requires --lpips-weights",
    )
    ap.add_argument("--trace-steps", type=int, default=0,
                    help="capture a jax.profiler trace for the first N steps")
    # ---- SDS diffusion guidance (``gaussiansurfel_imagedream_s0.yaml:87-96``)
    ap.add_argument(
        "--guidance", type=str, default=None,
        choices=["none", "imagedream", "mvdream"],
        help="multi-view SDS guidance; imagedream additionally conditions "
        "on the per-frame GT crop (stage 1) / ECON normal_F (stage 0). "
        "Unset + --config: taken from the YAML; pass an explicit "
        "'none' to train reconstruction-only under a guidance YAML",
    )
    ap.add_argument("--prompt", type=str, default=None,
                    help="text prompt (encoded via --clip-model-dir, or "
                    "supply --prompt-embeddings)")
    ap.add_argument("--prompt-embeddings", type=str, default=None,
                    help=".npz with cond/uncond [77, D] text embeddings")
    ap.add_argument("--clip-model-dir", type=str, default=None,
                    help="local SD2.1 text_encoder+tokenizer directory")
    ap.add_argument("--guidance-ckpt", type=str, default=None,
                    help="torch sd-v2.1-base-4view[-ipmv] checkpoint; "
                    "converted to flax at startup")
    ap.add_argument("--mock-guidance", action="store_true",
                    help="random-init full-shape guidance networks (smoke/"
                    "bench path for this zero-egress environment)")
    ap.add_argument("--guidance-image-size", type=int, default=256)
    ap.add_argument(
        "--gen-res", type=int, default=256,
        help="resolution of the SDS gen-view renders (default 256 — the "
        "promoted production default, PERFORMANCE.md item 25: render AT "
        "the guidance resolution).  The reference renders "
        "gen at 512 and immediately downsamples to 256 before the VAE "
        "(imagedream_guidance.py:91-98); 256 renders the gen views AT the "
        "guidance resolution — ~4x fewer bytes through the composite (the "
        "gen-side nc/curv losses then evaluate at 256)",
    )
    ap.add_argument("--guidance-dtype", type=str, default="bf16",
                    choices=["bf16", "f32"],
                    help="guidance network compute dtype (the reference "
                    "runs half_precision_weights=true)")
    ap.add_argument(
        "--multichip", action="store_true",
        help="shard the step over ALL local devices on a 1-D mesh: gen "
        "views over the view axis, the GT passes row-sharded (GSPMD "
        "partitions the tile composite); surfel state replicates and XLA "
        "all-reduces the gradients over ICI",
    )
    ap.add_argument(
        "--sds-mode", type=str, default="fused", choices=["split", "fused"],
        help="fused (default): the whole SDS traces inside the train step "
        "with every weight tree as a jit argument — measured 22%% faster "
        "than split at identical knobs and 1.038 vs ~0.95 steps/s at "
        "production knobs on v5e (it deletes the split mode's duplicate "
        "gen renders + VAE + one dispatch; PERFORMANCE.md item 20). "
        "split: the frozen-UNet target compiles as its own program "
        "(smaller per-program executables; the round-2 default before "
        "arg-passed weights made the fused graph transport-safe)",
    )
    ap.add_argument(
        "--sds-start", type=int, default=None,
        help="override the stage SDS warm-up length (steps <= sds_start "
        "run a guidance-free program; stage-0 default 500)",
    )
    ap.add_argument(
        "--composite", type=str, default="xla", choices=["xla", "pallas"],
        help="rasterizer composite implementation (RasterConfig.composite): "
        "dense XLA cumprod vs the fused blocked-Pallas kernel",
    )
    ap.add_argument(
        "--max-per-tile", type=int, default=64,
        help="per-tile compositing capacity K (default 64 — promoted, "
        "PERFORMANCE.md item 25; RasterConfig parity default is 96). The step is HBM-bandwidth-bound and the dominant "
        "[tiles, pixels, K] composite bytes scale linearly in K; K=64 "
        "measured ~14%% faster (PERFORMANCE.md item 22) at the cost of "
        "more dropped farthest-in-tile splats (image-space bound: "
        "scripts/bench_truncation.py)",
    )
    ap.add_argument(
        "--composite-dtype", type=str, default="bf16",
        choices=["f32", "bf16"],
        help="dtype of the [tiles, pixels, K] composite intermediates "
        "(default bf16 — promoted, item 25; trained-state PSNR vs the "
        "exact oracle is identical to f32 to 2 decimals). bf16 halves the "
        "bytes of the bandwidth-bound composite; channel contractions "
        "still accumulate in f32 and the splat set is decided in f32",
    )
    ap.add_argument(
        "--gt-cache", type=str, default="auto",
        choices=["auto", "pin", "pin-u8", "lru"],
        help="per-frame GT batch device cache: pin = ALL frames resident "
        "in HBM (one upload, per-step cost = one on-device gather), pin-u8 "
        "= pinned with uint8 image storage (4x smaller; exact for "
        "8-bit-sourced data), lru = 32-frame LRU (re-uploads on miss), "
        "auto = pin if it fits --gt-cache-mb, else pin-u8, else lru",
    )
    ap.add_argument(
        "--gt-cache-mb", type=int, default=4096,
        help="HBM budget for the pinned GT cache in auto mode",
    )
    args = ap.parse_args(argv)

    guidance_from_yaml = False
    yaml_cfg = None
    if args.config:
        from ..train.yaml_config import load_yaml_config

        yaml_cfg = load_yaml_config(args.config)
        # YAML fills in whatever the CLI left at its default.
        if args.dataroot is None and yaml_cfg["dataroot"] not in (None, "???"):
            args.dataroot = str(yaml_cfg["dataroot"])
        if args.prompt is None and yaml_cfg["prompt"] not in (None, "???"):
            args.prompt = str(yaml_cfg["prompt"])
        if args.guidance is None and yaml_cfg["guidance_kind"]:
            args.guidance = yaml_cfg["guidance_kind"]
            guidance_from_yaml = True
        if args.guidance_ckpt is None and yaml_cfg["guidance_ckpt"]:
            args.guidance_ckpt = str(yaml_cfg["guidance_ckpt"])
    args.stage = resolve_cli_stage(args.stage, yaml_cfg)
    if args.guidance is None:
        args.guidance = "none"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..io.checkpoint import load_avatar, save_avatar
    from ..render.types import RasterConfig
    from ..train.config import TrainConfig
    from ..train.evaluate import evaluate
    from ..train.trainer import init_train_state, make_gt_batch, make_train_step

    os.makedirs(args.out, exist_ok=True)

    import dataclasses as dc

    if yaml_cfg is not None:
        cfg = yaml_cfg["train"]
        if args.n_views is not None:
            cfg = dc.replace(cfg, n_views=args.n_views)
    else:
        cfg = TrainConfig(n_views=args.n_views if args.n_views else 4)

    if args.synthetic:
        from .common import synthetic_setup

        ds, params, model = synthetic_setup(distill_steps=100, seed=args.seed)
        gen_size = (128, 128)
        normal_size = (128, 128)
    else:
        if not args.dataroot or not args.smpl_model:
            raise SystemExit("--dataroot and --smpl-model required (or --synthetic)")
        from .common import real_setup

        ds, params, model = real_setup(
            args.dataroot,
            args.smpl_model,
            num_subdiv=args.num_subdiv,
            seed=args.seed,
            distill_steps=1000,
        )
        # Gen renders at the config resolution (reference data.width/height,
        # 512 in every shipped YAML — previously hardcoded, so a --config
        # with a different resolution was silently ignored); the normal
        # supervision pass renders at the stored maps' resolution (the same
        # grid make_gt_batch builds normal_cam for).
        gen_size = (
            (args.gen_res, args.gen_res)
            if args.gen_res
            else (cfg.height, cfg.width)
        )
        nres = (
            ds.normal_F.shape[1]
            if getattr(ds, "normal_F", np.zeros(0)).size
            else cfg.height
        )
        normal_size = (nres, nres)
    if args.import_ckpt:
        # Warm-start from a REFERENCE Lightning checkpoint (the real-weights
        # fine-tune drill, docs/REAL_WEIGHTS.md §5): explicit surfel params
        # map by name; when the checkpoint carries attribute-field weights
        # and the run is field-driven, the reference field's predictions at
        # the canonical points are DISTILLED into our hash field (same
        # reset_field machinery as the smpl: init) so the warm start covers
        # rendered colors/scales/quats too (ADVICE r4 medium).  Unlike
        # --resume this does not restore a step counter.
        from ..io.checkpoint import (
            import_reference_ckpt,
            import_reference_field_from_ckpt,
            load_reference_state_dict,
        )

        ref_sd = load_reference_state_dict(args.import_ckpt)
        mapped = import_reference_ckpt(
            args.import_ckpt, like=params, state_dict=ref_sd
        )
        params = params._replace(
            **{k: jnp.asarray(v) for k, v in mapped.items()}
        )
        rf = import_reference_field_from_ckpt(
            args.import_ckpt, state_dict=ref_sd
        )
        if rf is not None and not args.use_explicit:
            from ..field.attribute_field import reset_field
            from ..field.reference_import import reference_field_apply

            t_f = time.time()
            ref_attrs = reference_field_apply(rf, params.xyz)
            field, _ = reset_field(
                params.field, params.xyz,
                ref_attrs["shs"], ref_attrs["scales"], ref_attrs["quats"],
                cfg=model.field_cfg, steps=1000,
                batch_size=(
                    65536 if int(params.xyz.shape[0]) > 100_000 else None
                ),
            )
            params = params._replace(field=field)
            print(f"distilled reference attribute field into the hash "
                  f"field ({time.time()-t_f:.1f}s)")
        elif rf is not None:
            print("warning: --use-explicit ignores the checkpoint's "
                  "attribute-field weights (colors/scales/quats come from "
                  "the explicit tensors)")
        print(f"imported reference ckpt {args.import_ckpt} "
              f"({sorted(mapped)})")
    resume_step = 0
    if args.resume:
        params, resume_step = load_avatar(args.resume, params)
        print(f"resumed from {args.resume} @ step {resume_step}")

    has_normals = bool(getattr(ds, "normal_F", np.zeros(0)).size)
    # FS sequences ship no back normals (empty normal_B): gate the back
    # pass + loss off like the reference's `"gt_normal_B" in batch` check.
    has_normal_B = bool(getattr(ds, "normal_B", np.zeros(0)).size)
    if args.multichip and args.composite == "pallas" and len(jax.devices()) > 1:
        # The multichip path partitions the composite via GSPMD sharding
        # constraints on the XLA program; an opaque pallas_call cannot be
        # partitioned over the tile axis and would replicate the full
        # composite per device. Force the XLA composite under --multichip.
        print("warning: --multichip forces --composite xla "
              "(pallas composite is opaque to GSPMD)")
        args.composite = "xla"
    raster = RasterConfig(composite=args.composite)
    if args.max_per_tile is not None:
        raster = dc.replace(raster, max_per_tile=args.max_per_tile)
    if args.composite_dtype is not None:
        raster = dc.replace(raster, composite_dtype=args.composite_dtype)

    from ..train.lpips import make_lpips_fn, make_lpips_loss

    # Arg-passing LPIPS: variables ride in batch["lpips_params"] so the
    # VGG16 kernels never bake into the step executable as constants
    # (PERFORMANCE.md item 19).
    lpips_fn, lpips_vars = make_lpips_loss(args.lpips_weights)
    if lpips_vars is not None:
        lpips_vars = jax.device_put(lpips_vars)
    if args.lpips_weights and lpips_fn is None:
        print(f"warning: LPIPS weights not found at {args.lpips_weights}; "
              "LPIPS terms disabled")

    eval_lpips = None
    if lpips_fn is not None:
        # Eval-protocol LPIPS is ALWAYS f32 (reported metrics must be
        # exactly comparable to the reference's eval numbers); only the
        # loss-path lpips_fn above runs the bf16 default.
        _lpips_jit = jax.jit(make_lpips_fn(args.lpips_weights, dtype=jnp.float32))

        def eval_lpips(a01, b01):
            return float(
                _lpips_jit(
                    jnp.asarray(a01) * 2.0 - 1.0, jnp.asarray(b01) * 2.0 - 1.0
                )
            )

    stages = {"0": [0], "1": [1], "both": [0, 1]}[args.stage]

    def _resolve_stage(st):
        stage_cfg = resolve_stage_cfg(yaml_cfg, st, args.steps)
        if not has_normals:
            stage_cfg = dc.replace(
                stage_cfg,
                loss=dc.replace(
                    stage_cfg.loss, normal_F=0.0, normal_B=0.0, normal_mask=0.0
                ),
            )
        if args.lambda_vgg > 0.0:
            stage_cfg = dc.replace(
                stage_cfg, loss=dc.replace(stage_cfg.loss, vgg=args.lambda_vgg)
            )
        if args.sds_start is not None:
            stage_cfg = dc.replace(stage_cfg, sds_start=args.sds_start)
        return stage_cfg

    # Guidance networks load/convert/upload ONCE; per-stage scalars rebind
    # via guidance.for_stage below (a --stage both run must not torch.load
    # and convert the multi-GB checkpoint twice).
    args.guidance = resolve_guidance_kind(
        args.guidance,
        guidance_from_yaml,
        ckpt=args.guidance_ckpt,
        embeddings=args.prompt_embeddings,
        clip_dir=args.clip_model_dir,
        mock=args.mock_guidance,
    )
    base_guidance = None
    if args.guidance != "none":
        from ..guidance.build import build_guidance

        text_emb = None
        if args.prompt_embeddings or args.clip_model_dir:
            from ..guidance.prompt import PromptProcessor

            text_emb = PromptProcessor(
                args.prompt or "",
                embeddings_path=args.prompt_embeddings,
                clip_model_dir=args.clip_model_dir,
            )()
        base_guidance = build_guidance(
            args.guidance,
            _resolve_stage(stages[0]),
            key=jax.random.PRNGKey(args.seed + 100),
            ckpt_path=args.guidance_ckpt,
            text_embeddings=text_emb,
            mock=args.mock_guidance,
            image_size=args.guidance_image_size,
            n_view=cfg.n_views,
            dtype=jnp.bfloat16 if args.guidance_dtype == "bf16"
            else jnp.float32,
        )
        print(f"guidance: {args.guidance} "
              f"({'mock' if args.mock_guidance and not args.guidance_ckpt else args.guidance_ckpt}, "
              f"{args.guidance_dtype})")

    # Precompute the per-frame ImageDream ip tokens (CLIP + Resampler on
    # the GT crop / normal_F): the reference re-encodes every step
    # (``imagedream_guidance.py:195``); here it runs once per frame — for
    # EVERY stage about to run (their refs differ) — and the CLIP tower is
    # then freed from HBM before any training starts.
    ip_tables = {}
    if base_guidance is not None and base_guidance.embed_ref is not None:
        for st in stages:
            refs = (
                ds.images_crop
                if st == 1
                else (ds.normal_F if has_normals else None)
            )
            if refs is not None and len(refs):
                t_ip = time.time()
                ip_tables[st] = np.stack(
                    [
                        np.asarray(
                            base_guidance.embed_ref(jnp.asarray(r[..., :3]))
                        )
                        for r in refs
                    ]
                )
                print(
                    f"precomputed ip tokens for {len(refs)} frames "
                    f"(stage {st}, {time.time()-t_ip:.1f}s)"
                )
        # All frames for all stages embedded: free the 1.3 GB CLIP tower.
        base_guidance.release_image_encoder()

    # Monotonic global step offset for logging across stages (a fixed
    # it + st*n_steps overlapped/gapped when stage lengths differ — wandb
    # drops non-monotonic rows).
    global_step_base = 0
    for st in stages:
        stage_cfg = _resolve_stage(st)
        guidance_fn = (
            base_guidance.for_stage(stage_cfg)
            if base_guidance is not None
            else None
        )
        ip_table = ip_tables.get(st)

        import contextlib

        mesh = None
        shard_views_fn = shard_gt_fn = None
        if args.multichip:
            if len(jax.devices()) < 2:
                print("warning: --multichip with a single device; ignoring")
            else:
                from ..parallel import make_view_mesh, row_sharder, view_sharder

                mesh = make_view_mesh()
                shard_views_fn = view_sharder(mesh)
                shard_gt_fn = row_sharder(mesh)
                print(f"multichip: 1-D mesh over {len(jax.devices())} devices "
                      "(gen views sharded, GT passes row-sharded)")
        mesh_ctx = (
            (jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh)
            if mesh is not None
            else contextlib.nullcontext()
        )

        def _rep(tree):
            if mesh is None:
                return tree
            from ..parallel import replicate

            return replicate(mesh, tree)

        state, opt = init_train_state(
            params, cfg, seed=args.seed, stage=stage_cfg
        )
        split_sds = guidance_fn is not None and args.sds_mode == "split"
        # fused mode routes through apply_with_params: the network weights
        # enter the single train-step program as jit ARGUMENTS, never as
        # closure constants (multi-GB constants bake into the serialized
        # program — the axon-transport failure documented in guidance/build).
        sds_via_params = guidance_fn is not None and args.sds_mode == "fused"
        gparams = guidance_fn.arg_params if sds_via_params else None
        raw_step = make_train_step(
            model,
            cfg,
            stage_cfg,
            opt,
            gen_size=gen_size,
            gt_size=ds.image_size,
            normal_size=normal_size,
            raster=raster,
            use_explicit=args.use_explicit,
            has_normals=has_normals,
            has_normal_B=has_normal_B,
            lpips_fn=lpips_fn,
            lpips_via_batch=lpips_fn is not None,
            guidance_fn=guidance_fn,
            split_sds=split_sds,
            sds_via_params=sds_via_params,
            shard_views=shard_views_fn,
            shard_gt=shard_gt_fn,
            # With selective remat (named rasterizer residuals) the full
            # vmap-4 gen batch fits next to the resident diffusion weights
            # — measured faster than sequential chunks of 2; GT residuals
            # fit once the CLIP tower is released, so GT passes stay saved.
            gen_chunk=None,
            remat_gt=False,
        )
        step_fn = jax.jit(raw_step)
        # Fused no-grad half: lite gen renders + VAE + frozen-UNet target in
        # ONE program (weights as jit args) — 2 dispatches/step, not 3.
        prelude_fn = (
            guidance_fn.make_fused_prelude(raw_step.sds_prelude)
            if split_sds
            else None
        )
        # Stage-0 delays SDS until sds_start (``gaussian_surfel_mvdream.py:53``).
        # The reference still pays the UNet every one of those steps and
        # masks the loss; here the warm-up steps run a separate
        # guidance-free program instead — no prelude dispatch, no UNet/VAE,
        # un-rematted renders, two-tier gen raster (~1.6x the SDS-program
        # step rate).  Loss values are identical: the SDS program's
        # ``sds_on`` gate zeroes the SDS term for step <= sds_start
        # (equivalence pinned in tests/test_sds_train.py).
        warm_step_fn = None
        if guidance_fn is not None and stage_cfg.sds_start > 0:
            warm_step_fn = jax.jit(
                make_train_step(
                    model,
                    cfg,
                    stage_cfg,
                    opt,
                    gen_size=gen_size,
                    gt_size=ds.image_size,
                    normal_size=normal_size,
                    raster=raster,
                    use_explicit=args.use_explicit,
                    has_normals=has_normals,
                    has_normal_B=has_normal_B,
                    lpips_fn=lpips_fn,
                    lpips_via_batch=lpips_fn is not None,
                    guidance_fn=None,
                    # The guidance-free default (no remat) saves every
                    # render's composite intermediates for the backward —
                    # multi-GB at 512px.  Fine standalone, but HERE the
                    # diffusion weights are already resident for the SDS
                    # phase, and the combination OOMs a 16 GB chip
                    # (measured: RESOURCE_EXHAUSTED on warm step 1).  The
                    # warm program therefore remats like the SDS build.
                    remat_gen=True,
                    remat_gt=True,
                    shard_views=shard_views_fn,
                    shard_gt=shard_gt_fn,
                )
            )
        from ..avatar import RenderSettings, render_view
        from ..train.observe import MetricLogger, StepTimer, dump_debug_images, profile_trace

        logger = MetricLogger(args.out, use_wandb=args.wandb)
        timer = StepTimer()
        dump_settings = RenderSettings(
            use_explicit=args.use_explicit, raster=raster
        )

        key = jax.random.PRNGKey(args.seed + st)
        rng = np.random.RandomState(args.seed + st)
        # Per-frame GT batches are immutable after load.  Preferred: pin the
        # WHOLE sequence in HBM as one stacked pytree (the reference samples
        # ~400 frames uniformly; a 32-frame LRU hits ~8% and most steps
        # re-pay host assembly + H2D upload).  Per-step cost becomes one
        # tiny on-device gather.  Falls back to uint8 pinned storage (4x
        # smaller; exact for 8-bit-sourced data) then to the LRU when the
        # stack exceeds --gt-cache-mb.
        from collections import OrderedDict

        from ..train.trainer import gt_stack_nbytes, make_gt_batch_stack

        budget = args.gt_cache_mb * (1 << 20)
        nf = len(ds.train_idx)
        mode = args.gt_cache
        if mode == "auto":
            if gt_stack_nbytes(ds, model, nf, ip_table=ip_table) <= budget:
                mode = "pin"
            elif gt_stack_nbytes(
                ds, model, nf, store_u8=True, ip_table=ip_table
            ) <= budget:
                mode = "pin-u8"
            else:
                mode = "lru"
        gt_stack = gt_select = gt_pos = None
        if mode in ("pin", "pin-u8"):
            gt_stack, gt_select, gt_pos = make_gt_batch_stack(
                ds, model, ds.train_idx,
                store_u8=(mode == "pin-u8"), ip_table=ip_table,
            )
            print(
                f"gt-cache: pinned {nf} frames on device ({mode}, "
                f"{sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(gt_stack)) / 1e6:.0f} MB)"
            )
        batch_cache = OrderedDict()
        BATCH_CACHE_MAX = 32
        t0 = time.time()
        trace_ctx = (
            profile_trace(os.path.join(args.out, "trace"))
            if args.trace_steps > 0 and st == 0
            else None
        )
        if trace_ctx:
            trace_ctx.__enter__()
        n_steps = stage_cfg.max_steps
        # --resume restores the step counter ONLY when resuming the SAME
        # stage the checkpoint came from (path basename "stage<K>"):
        # schedules / SDS warm-up / the loop continue from the saved step
        # instead of replaying.  A checkpoint from a DIFFERENT stage is a
        # hand-off — params only, step 0 — matching the reference's
        # resume: geometry_convert_from semantics.  (Previously the
        # stage-0 step counter leaked into a --stage 1 --resume
        # <out>/stage0 run: min(1000, max_steps) skipped the whole stage
        # and "trained" stage 1 as a no-op copy.)
        same_stage = args.resume is not None and os.path.basename(
            os.path.normpath(args.resume)
        ) == f"stage{st}"
        start_it = min(resume_step, n_steps) if same_stage else 0
        resume_step = 0
        if start_it > 0:
            state = state._replace(step=jnp.asarray(start_it, jnp.int32))
            print(f"stage {st}: continuing from step {start_it}/{n_steps}")
        mesh_ctx.__enter__()
        state = _rep(state)
        gparams = _rep(gparams) if gparams is not None else None
        gt_stack = _rep(gt_stack) if gt_stack is not None else None
        lpips_vars_dev = (
            _rep(lpips_vars) if lpips_vars is not None else None
        )
        for it in range(start_it, n_steps):
            key, k1 = jax.random.split(key)
            frame = ds.train_idx[rng.randint(len(ds.train_idx))]
            with timer.phase("batch"):
                if gt_select is not None:
                    base = gt_select(gt_stack, gt_pos[frame])
                else:
                    base = batch_cache.get(frame)
                    if base is None:
                        base = make_gt_batch(ds, model, frame)
                        if ip_table is not None:
                            base["ref_ip"] = jnp.asarray(ip_table[frame])
                        base = _rep(base)
                        batch_cache[frame] = base
                        if len(batch_cache) > BATCH_CACHE_MAX:
                            batch_cache.popitem(last=False)
                    else:
                        batch_cache.move_to_end(frame)
                # Shallow copy: the loop adds per-step keys (sds_target).
                batch = dict(base)
                if lpips_vars_dev is not None:
                    # Same device arrays every step: a pointer, not a
                    # transfer (lpips_via_batch — see make_lpips_loss).
                    batch["lpips_params"] = lpips_vars_dev
                if prelude_fn is not None and getattr(
                    guidance_fn, "vae_params", None
                ) is not None:
                    # Split-SDS grad half: VAE variables as jit arguments,
                    # not closure constants (~75 MB smaller executable).
                    batch["guidance_vae"] = guidance_fn.vae_params
            with timer.phase("step"):
                warm = warm_step_fn is not None and it <= stage_cfg.sds_start
                if warm_step_fn is not None and it == stage_cfg.sds_start + 1:
                    # Leaving the warm phase: FREE the warm program before
                    # the (much larger) fused-SDS program first runs — on
                    # a 16 GB chip the two executables' workspaces + the
                    # resident diffusion weights do not coexist (measured:
                    # RESOURCE_EXHAUSTED at the phase switch; with the warm
                    # program released the fused path runs).  A later
                    # --resume into the warm window simply re-jits.
                    warm_step_fn.clear_cache()
                    warm_step_fn = None
                if prelude_fn is not None and not warm:
                    # split-SDS: the fused no-grad half (gen renders +
                    # VAE + frozen-UNet x0 target, program 1), then the
                    # train step (program 2) consumes the target — see
                    # make_train_step's docstring.
                    batch["sds_target"] = prelude_fn(
                        state, batch, k1, ref_ip=batch.get("ref_ip")
                    )
                if warm:
                    state, metrics = warm_step_fn(state, batch, k1)
                elif sds_via_params:
                    state, metrics = step_fn(state, batch, k1, gparams)
                else:
                    state, metrics = step_fn(state, batch, k1)
            if trace_ctx and it + 1 == args.trace_steps:
                trace_ctx.__exit__(None, None, None)
                trace_ctx = None
            if it % args.log_every == 0 or it == n_steps - 1:
                m = {k: round(float(v), 5) for k, v in metrics.items()}
                # Stage tag: step numbers alone cannot distinguish a
                # stage boundary from a --resume restart in metrics.jsonl.
                m["stage"] = st
                logger.log(global_step_base + it, m)
                m["sec_per_step"] = round(
                    timer.summary().get("step", 0.0), 3
                )
                print(f"stage {st} it {it} ({time.time()-t0:.1f}s):", json.dumps(m))
            if args.save_every > 0 and it > 0 and it % args.save_every == 0:
                p_host = (
                    jax.tree_util.tree_map(
                        lambda x: jnp.asarray(np.asarray(x)), state.params
                    )
                    if mesh is not None
                    else state.params
                )
                save_avatar(os.path.join(args.out, f"stage{st}"), p_host, step=it)
                print(f"checkpointed stage {st} @ it {it}", flush=True)
            if args.dump_every > 0 and it > 0 and it % args.dump_every == 0:
                out_dbg = render_view(
                    state.params, model, batch["gt_cam"], ds.image_size,
                    jnp.ones(3), batch["frame_idx"], dump_settings,
                )
                dump_debug_images(
                    args.out, it, out_dbg,
                    gt={"rgb": ds.images[frame], "mask": ds.masks[frame]},
                )
            if args.val_every > 0 and it > 0 and it % args.val_every == 0 and (
                ds.val_idx or ds.test_idx
            ):
                vidx = (ds.val_idx or ds.test_idx)[0]
                vb = make_gt_batch(ds, model, vidx)
                vout = render_view(
                    state.params, model, vb["gt_cam"], ds.image_size,
                    jnp.ones(3), vb["frame_idx"], dump_settings,
                )
                dump_debug_images(
                    os.path.join(args.out, "val"), it, vout,
                    gt={"rgb": ds.images[vidx]},
                )
        if trace_ctx:
            trace_ctx.__exit__(None, None, None)
        mesh_ctx.__exit__(None, None, None)
        logger.close()
        # Pull the (possibly mesh-replicated) params back to single-device
        # host arrays for checkpointing / eval.
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), state.params
        ) if mesh is not None else state.params
        ckpt = os.path.join(args.out, f"stage{st}")
        save_avatar(ckpt, params, step=n_steps)
        print(f"saved {ckpt}")
        global_step_base += n_steps

    if args.eval:
        from ..avatar import RenderSettings

        res = evaluate(
            params,
            model,
            ds,
            save_dir=os.path.join(args.out, "test"),
            settings=RenderSettings(use_explicit=args.use_explicit, raster=raster),
            lpips_fn=eval_lpips,
        )
        print("eval:", json.dumps(res))


if __name__ == "__main__":
    main()
