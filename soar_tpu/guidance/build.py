"""Assemble a trainer-ready ``guidance_fn`` (ImageDream / MVDream).

Replaces the reference's ``build_model("sd-v2.1-base-4view-ipmv")`` +
prompt-processor construction (``guidance/imagedream_guidance.py:52-73``,
``system/gaussian_surfel_mvdream.py:47-51``) with one builder returning a
closure that matches the trainer contract
(:func:`soar_tpu.train.trainer.make_train_step`):

    guidance_fn(inp [V,H,W,3], c2w [V,4,4], step, key,
                ref_rgb=None, ref_mask=None, comp_bg=None) -> dict

Three weight sources:

- ``ckpt_path``: a torch LDM checkpoint (``model.diffusion_model.*`` UNet,
  ``first_stage_model.*`` VAE, ``image_proj_model.*`` resampler, CLIP vision
  under ``embedder.model.visual.*``) run through the converters in
  :mod:`soar_tpu.guidance.networks` / :mod:`soar_tpu.guidance.clip_vit`.
- ``mock=True``: random-init FULL-SHAPE networks (320-ch UNet, SD VAE,
  ViT-H CLIP) — exercises the real architectures end-to-end where no
  pretrained weights can be downloaded (zero-egress).
- ``tiny=True``: miniature configs for CI tests.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..train.config import StageConfig
from .clip_vit import (
    CLIPVisionConfig,
    ResamplerConfig,
    convert_clip_vit_torch_params,
    convert_resampler_torch_params,
    make_image_embed_fn,
)
from .networks import (
    MultiViewUNet,
    VAEEncoder,
    convert_unet_torch_params,
    convert_vae_torch_params,
)
from .sds import GuidanceConfig, MultiviewGuidance


@dataclasses.dataclass(frozen=True)
class NetworkShapes:
    """Shared shape bundle for the three guidance networks."""

    unet: MultiViewUNet
    vae: VAEEncoder
    latent_size: int
    clip_cfg: CLIPVisionConfig
    resampler_cfg: ResamplerConfig
    context_dim: int

    @classmethod
    def full(cls) -> "NetworkShapes":
        return cls(
            unet=MultiViewUNet(),
            vae=VAEEncoder(),
            latent_size=32,
            clip_cfg=CLIPVisionConfig(),
            resampler_cfg=ResamplerConfig(),
            context_dim=1024,
        )

    @classmethod
    def tiny(cls, image_size: int = 32) -> "NetworkShapes":
        return cls(
            unet=MultiViewUNet(
                model_channels=16,
                channel_mult=(1, 2),
                num_res_blocks=1,
                attention_levels=(0, 1),
                num_head_channels=8,
                context_dim=16,
            ),
            vae=VAEEncoder(base_channels=16, channel_mult=(1, 2)),
            latent_size=image_size // 2,
            clip_cfg=CLIPVisionConfig.tiny(),
            resampler_cfg=ResamplerConfig.tiny(),
            context_dim=16,
        )


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def _random_like_on_device(key: jax.Array, shape_tree, dtype) -> Dict:
    """Generate a random variable pytree matching ``shape_tree`` (a pytree of
    ``ShapeDtypeStruct``, e.g. from :func:`jax.eval_shape` over a flax
    ``init``) DIRECTLY on the default device, float leaves in ``dtype``.

    One compiled program, no constants: nothing is materialized on the host
    and nothing crosses the host->device link but the PRNG key.  This is the
    transport-safe mock init — host-CPU flax init + upload of the full-shape
    320-ch UNet / ViT-H shipped ~2-3 GB over the remote-device tunnel and
    dominated bench startup (~5 min measured).

    Distributions are a shape heuristic, not flax's per-module initializers
    (``scale``→1, ``bias``→0, kernels ~ N(0, 0.2²/fan_in)): every norm layer
    re-normalizes activations, so mock forward passes stay finite; only the
    architecture's COST is exercised, values are meaningless by design."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(shape_tree)

    def gen(k):
        out = []
        for i, (path, leaf) in enumerate(flat):
            name = ""
            for entry in reversed(path):
                key_attr = getattr(entry, "key", None)
                if isinstance(key_attr, str):
                    name = key_attr
                    break
            if not jnp.issubdtype(leaf.dtype, jnp.floating):
                out.append(jnp.zeros(leaf.shape, leaf.dtype))
            elif name == "scale":
                out.append(jnp.ones(leaf.shape, dtype))
            elif name == "bias":
                out.append(jnp.zeros(leaf.shape, dtype))
            else:
                fan_in = 1
                for d in (leaf.shape[:-1] if len(leaf.shape) > 1 else leaf.shape):
                    fan_in *= int(d)
                std = 0.2 / (max(fan_in, 1) ** 0.5)
                out.append(
                    std
                    * jax.random.normal(
                        jax.random.fold_in(k, i), leaf.shape, dtype
                    )
                )
        return jax.tree_util.tree_unflatten(treedef, out)

    return jax.jit(gen)(key)


def _mock_unet_vae_shapes(shapes: NetworkShapes, n_view: int, with_ip: bool):
    """Abstract (shape-only) flax init of UNet + VAE — no FLOPs, no weights;
    dummies are passed as ``eval_shape`` ARGUMENTS so tracing stays abstract
    while ``num_frames`` (used statically in reshapes) stays a Python int."""
    hw = shapes.latent_size
    dummy_lat = jnp.zeros((2 * n_view, hw, hw, 4))
    dummy_t = jnp.zeros((2 * n_view,), jnp.int32)
    dummy_c77 = jnp.zeros((2 * n_view, 77, shapes.context_dim))
    dummy_cam = jnp.zeros((2 * n_view, 16))
    dummy_ip = (
        jnp.zeros(
            (2 * n_view, shapes.resampler_cfg.num_queries,
             shapes.resampler_cfg.output_dim)
        )
        if with_ip
        else None
    )

    def unet_init(k, lat, t, c77, cam, ip):
        ctx = {"context": c77, "camera": cam, "num_frames": n_view}
        if ip is not None:
            ctx["ip"] = ip
        return shapes.unet.init(k, lat, t, ctx)

    unet_shapes = jax.eval_shape(
        unet_init, jax.random.PRNGKey(0), dummy_lat, dummy_t, dummy_c77,
        dummy_cam, dummy_ip,
    )
    dummy_img = jnp.zeros((n_view, 8 * hw, 8 * hw, 3))
    vae_shapes = jax.eval_shape(
        shapes.vae.init, jax.random.PRNGKey(0), dummy_img
    )
    return unet_shapes, vae_shapes


def init_mock_networks(
    key: jax.Array, shapes: NetworkShapes, n_view: int = 4,
    with_ip: bool = False, on_device_dtype=None,
) -> Dict:
    """Random-init UNet + VAE variables at the given shapes.  ``with_ip``
    initializes the ipmv variant (decoupled to_k_ip/to_v_ip projections on
    every cross-attention) — required for ImageDream.

    ``on_device_dtype=None`` (tests / tiny shapes): flax's real initializers
    on the host CPU backend — initializing the full 320-ch UNet on the TPU
    costs a ~6-minute remote compile of the init program and doubles peak
    HBM.  ``on_device_dtype=<dtype>`` (full-shape bench): shape-only
    ``eval_shape`` + :func:`_random_like_on_device`, so the ~GB of mock
    weights are BORN on the accelerator in the compute dtype instead of
    being uploaded through the remote-device tunnel."""
    import contextlib

    ku, kv = jax.random.split(key)
    if on_device_dtype is not None:
        unet_shapes, vae_shapes = _mock_unet_vae_shapes(shapes, n_view, with_ip)
        return {
            "unet": _random_like_on_device(ku, unet_shapes, on_device_dtype),
            "vae": _random_like_on_device(kv, vae_shapes, on_device_dtype),
        }

    cpu = _cpu_device()
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        hw = shapes.latent_size
        dummy_lat = jnp.zeros((2 * n_view, hw, hw, 4))
        dummy_t = jnp.zeros((2 * n_view,), jnp.int32)
        dummy_ctx = {
            "context": jnp.zeros((2 * n_view, 77, shapes.context_dim)),
            "camera": jnp.zeros((2 * n_view, 16)),
            "num_frames": n_view,
        }
        if with_ip:
            dummy_ctx["ip"] = jnp.zeros(
                (2 * n_view, shapes.resampler_cfg.num_queries,
                 shapes.resampler_cfg.output_dim)
            )
        unet_vars = shapes.unet.init(ku, dummy_lat, dummy_t, dummy_ctx)
        dummy_img = jnp.zeros((n_view, 8 * hw, 8 * hw, 3))
        vae_vars = shapes.vae.init(kv, dummy_img)
        return {"unet": unet_vars, "vae": vae_vars}


def load_guidance_checkpoint(path: str, shapes: NetworkShapes) -> Dict:
    """torch LDM checkpoint -> flax variables for UNet/VAE (+ resampler and
    CLIP vision tower when present).  Key prefixes follow the
    MVDream/ImageDream ``LatentDiffusion`` wrapper."""
    import torch

    # weights_only=False: MVDream/ImageDream checkpoints carry pickled
    # non-tensor objects (configs, Lightning metadata) that torch>=2.6's
    # weights_only default rejects.
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    unet_sd = {
        k[len("model.diffusion_model.") :]: v
        for k, v in sd.items()
        if k.startswith("model.diffusion_model.")
    }
    vae_sd = {
        k[len("first_stage_model.") :]: v
        for k, v in sd.items()
        if k.startswith("first_stage_model.")
    }
    # quant_conv lives next to first_stage_model in LDM checkpoints.
    for k, v in sd.items():
        if k.startswith("quant_conv."):
            vae_sd[k] = v
    out = {
        "unet": convert_unet_torch_params(unet_sd, shapes.unet),
        "vae": convert_vae_torch_params(vae_sd),
    }
    if any(k.startswith("image_proj_model.") for k in sd):
        out["resampler"] = convert_resampler_torch_params(
            sd, shapes.resampler_cfg, prefix="image_proj_model."
        )
    clip_prefix = None
    for cand in ("embedder.model.visual.", "image_embedder.model.visual."):
        if any(k.startswith(cand) for k in sd):
            clip_prefix = cand
            break
    if clip_prefix:
        out["clip"] = convert_clip_vit_torch_params(
            sd, shapes.clip_cfg, prefix=clip_prefix
        )
    return out


def build_guidance(
    kind: str,
    stage: StageConfig,
    *,
    key: Optional[jax.Array] = None,
    ckpt_path: Optional[str] = None,
    text_embeddings: Optional[np.ndarray] = None,  # [2, 77, D]
    mock: bool = False,
    tiny: bool = False,
    image_size: int = 256,
    n_view: int = 4,
    dtype=jnp.float32,
) -> Callable:
    """Build the guidance closure for :func:`make_train_step`.

    ``kind``: "imagedream" (image-prompted, ``sd-v2.1-base-4view-ipmv``) or
    "mvdream" (text-only, ``sd-v2.1-base-4view``).
    """
    if kind not in ("imagedream", "mvdream"):
        raise ValueError(f"unknown guidance kind {kind!r}")
    shapes = NetworkShapes.tiny(image_size) if tiny else NetworkShapes.full()
    key = jax.random.PRNGKey(0) if key is None else key
    k_net, k_clip, k_txt = jax.random.split(key, 3)

    if ckpt_path is not None:
        variables = load_guidance_checkpoint(ckpt_path, shapes)
    elif mock or tiny:
        variables = init_mock_networks(
            k_net, shapes, n_view=n_view, with_ip=(kind == "imagedream"),
            # Full-shape mock weights are BORN on the accelerator in the
            # compute dtype (tiny stays on flax's real CPU initializers).
            on_device_dtype=None if tiny else dtype,
        )
    else:
        raise ValueError(
            "build_guidance needs ckpt_path, mock=True, or tiny=True"
        )
    # pop + cast so the float32 originals are freed immediately (at full
    # shape the f32 UNet alone is 3.4 GB), then commit the cast copies to
    # the default (accelerator) device in one transfer.
    unet_vars = jax.device_put(_cast_tree(variables.pop("unet"), dtype))
    vae_vars = jax.device_put(_cast_tree(variables.pop("vae"), dtype))

    unet, vae = shapes.unet, shapes.vae

    def encode_fn(images01, key):
        z = vae.apply(vae_vars, images01.astype(dtype), key)
        return z.astype(jnp.float32)

    def denoise_fn(latents, t, context):
        ctx = dict(context)
        for k in ("context", "camera", "ip"):
            if k in ctx:
                ctx[k] = ctx[k].astype(dtype)
        eps = unet.apply(unet_vars, latents.astype(dtype), t, ctx)
        return eps.astype(jnp.float32)

    # ONE copy of the image-conditioning weights, cast to the compute dtype
    # (a second f32 CLIP copy OOMed the chip next to the UNet), held in a
    # mutable holder so release_image_encoder can actually free the HBM.
    # ONE wrapper serves both the per-frame precompute (``embed_ref``) and
    # MultiviewGuidance's in-call fallback.
    image_embed_fn = None
    _release = lambda: None  # noqa: E731
    _enc_holder = {"clip": None, "res": None}
    if kind == "imagedream":
        if ckpt_path is not None and "clip" in variables and "resampler" in variables:
            clip_v = variables.pop("clip")
            res_v = variables.pop("resampler")
        elif ckpt_path is not None:
            # A real checkpoint without the image-conditioning towers is the
            # text-only ``sd-v2.1-base-4view`` (MVDream) — random-init CLIP
            # here would silently feed the real UNet garbage ip tokens.
            raise ValueError(
                f"checkpoint {ckpt_path} has no CLIP vision tower / "
                "image_proj_model — it is not the ImageDream "
                "'sd-v2.1-base-4view-ipmv' variant; use kind='mvdream' "
                "with it, or supply the -ipmv checkpoint"
            )
        else:
            clip_v, res_v = _mock_clip_vars(
                k_clip, shapes.clip_cfg, shapes.resampler_cfg,
                on_device_dtype=None if tiny else dtype,
            )
        _enc_holder["clip"] = jax.device_put(_cast_tree(clip_v, dtype))
        _enc_holder["res"] = jax.device_put(_cast_tree(res_v, dtype))
        del clip_v, res_v

        @jax.jit
        def _embed_impl(cv, rv, img):
            fn = make_image_embed_fn(
                cv, rv, shapes.clip_cfg, shapes.resampler_cfg
            )
            return fn(img)

        def image_embed_fn(img):
            if _enc_holder["clip"] is None:
                raise RuntimeError(
                    "image encoder released (release_image_encoder was "
                    "called); rebuild the guidance to embed again"
                )
            return _embed_impl(_enc_holder["clip"], _enc_holder["res"], img)

        def _release():
            """Free the 1.3 GB CLIP tower from HBM once the per-frame ip
            tokens are precomputed — only embed_ref needs it."""
            _enc_holder["clip"] = None
            _enc_holder["res"] = None

    if text_embeddings is None:
        if not (mock or tiny):
            raise ValueError("text_embeddings required unless mock/tiny")
        text_embeddings = jax.random.normal(
            k_txt, (2, 77, shapes.context_dim)
        )
    text_embeddings = jnp.asarray(text_embeddings, jnp.float32)

    # All heavy state (converted + device-committed weights, the CLIP
    # holder, text embeddings) lives ABOVE this line and is built exactly
    # once; ``_assemble`` only binds the cheap per-stage scalars
    # (guidance_scale, timestep window).  ``guidance_fn.for_stage(stage)``
    # therefore rebinds a new stage WITHOUT re-running torch.load / the
    # converters / the device upload — ``--stage both`` reuses everything.
    def _assemble(stage: StageConfig) -> Callable:
        gcfg = GuidanceConfig(
            guidance_scale=stage.guidance_scale,
            min_step_percent=stage.min_step_percent,
            max_step_percent=stage.max_step_percent,
            n_view=n_view,
            image_size=image_size,
        )
        mv = MultiviewGuidance(
            gcfg,
            encode_fn,
            denoise_fn,
            text_embeddings,
            image_embed_fn=image_embed_fn,
        )

        def guidance_fn(inp, c2w, step, key, ref_rgb=None, ref_mask=None,
                        comp_bg=None, ref_ip=None):
            if kind != "imagedream":
                ref_rgb = ref_ip = None
            return mv(
                inp, c2w, key, step,
                ref_rgb=ref_rgb if ref_ip is None else None,
                ref_mask=ref_mask,
                comp_bg=comp_bg,
                ref_ip=ref_ip,
            )

        # Per-frame ip precompute hook: ref images are GT data, so callers
        # embed them ONCE at startup and feed `ref_ip` through the batch —
        # keeping the CLIP tower out of the train-step XLA program and
        # running it 1x/frame instead of 1x/step.
        #
        # CRITICAL for the axon transport: the network weights are passed to
        # the jitted programs as ARGUMENTS (via closure-free impl
        # functions), never as closure captures — closed-over arrays bake
        # into the serialized program as constants, and shipping the 1.7 GB
        # UNet that way broke the remote-compile pipe.  As arguments, the
        # full 320-ch UNet compiles in ~30 s and steps in ~13 ms (measured
        # on the real chip).
        guidance_fn.embed_ref = image_embed_fn
        guidance_fn.release_image_encoder = _release

        # Split-SDS handles (trainer ``split_sds=True``): the grad half
        # (resize+VAE) stays inside the train step; the no-grad half (noise
        # + frozen UNet + CFG + x0 target) compiles as its OWN executable —
        # the functional mirror of the reference's separate SDS backward
        # (``gaussian_surfel_mvdream.py:465-469``).
        guidance_fn.encode_latents = mv.encode_latents

        # Closure-free encoder for the grad half: ``mv.encode_latents``
        # closure-captures the VAE variables, which bake into the TRAIN
        # STEP's serialized executable as ~75 MB of stablehlo constants
        # (measured, scripts/audit_executable.py --sds) — the same
        # transport problem the UNet/LPIPS already solved by arg-passing.
        # The trainer uses this variant whenever the caller rides the VAE
        # weights in ``batch["guidance_vae"]`` (= ``vae_params`` below).
        def encode_latents_p(vv, rgb, key):
            def enc(images01, k):
                z = vae.apply(vv, images01.astype(dtype), k)
                return z.astype(jnp.float32)

            tmp = MultiviewGuidance(gcfg, enc, None, text_embeddings)
            return tmp.encode_latents(rgb, key)

        guidance_fn.encode_latents_p = encode_latents_p
        guidance_fn.vae_params = vae_vars

        @jax.jit
        def _target_impl(uv, text_emb, latents, c2w, key, step, ref_ip):
            def denoise(lat, t, ctx):
                c = dict(ctx)
                for k in ("context", "camera", "ip"):
                    if k in c:
                        c[k] = c[k].astype(dtype)
                return unet.apply(uv, lat.astype(dtype), t, c).astype(
                    jnp.float32
                )

            tmp = MultiviewGuidance(gcfg, None, denoise, text_emb)
            return tmp.compute_target(latents, c2w, key, step, ref_ip=ref_ip)[0]

        guidance_fn.compute_target = (
            lambda latents, c2w, key, step, ref_ip=None: _target_impl(
                unet_vars, text_embeddings, latents, c2w, key, step, ref_ip
            )
        )

        def make_fused_prelude(prelude_fn):
            """ONE program for the whole no-grad SDS half: lite gen renders
            + VAE encode (``prelude_fn``, the trainer's raw ``sds_prelude``)
            + frozen-UNet x0 target — replacing the prelude/target
            two-dispatch sequence.  The diffusion weights still arrive as
            jit ARGUMENTS (axon transport rule above), and XLA can overlap
            the UNet with the tail of the renders.  Returns
            ``fused(state, batch, key, ref_ip) -> sds_target``."""

            @jax.jit
            def _fused(state, batch, key, uv, vv, text_emb, ref_ip):
                # VAE weights as jit args too (not just the UNet): a
                # closure-constant VAE would re-bake 160 MB into this
                # program's serialization.
                def enc(images01, k):
                    z = vae.apply(vv, images01.astype(dtype), k)
                    return z.astype(jnp.float32)

                tmp = MultiviewGuidance(gcfg, enc, None, text_emb)
                latents, c2w, k_sds = prelude_fn(
                    state, batch, key, encode_latents=tmp.encode_latents
                )
                return _target_impl(
                    uv, text_emb, latents, c2w, k_sds, state.step, ref_ip
                )

            def fused(state, batch, key, ref_ip=None):
                return _fused(
                    state, batch, key, unet_vars, vae_vars,
                    text_embeddings, ref_ip,
                )

            return fused

        guidance_fn.make_fused_prelude = make_fused_prelude

        # Fused-args handles (trainer ``sds_via_params=True``): the WHOLE
        # SDS computation traces inside the train step, but the network
        # weights arrive as a jit ARGUMENT pytree (``arg_params``) instead
        # of closure constants — transport-safe, and it removes the split
        # mode's duplicate gen-view forward + two extra program dispatches
        # per step.  Image conditioning must come as precomputed ``ref_ip``
        # tokens (the CLIP tower stays out of the step).
        guidance_fn.arg_params = {
            "unet": unet_vars,
            "vae": vae_vars,
            "text": text_embeddings,
        }

        def apply_with_params(gp, inp, c2w, step, key,
                              ref_mask=None, comp_bg=None, ref_ip=None):
            # No ref_rgb path here by design: the fused mode conditions on
            # PRECOMPUTED ip tokens only (the CLIP tower stays out of the
            # step program).  An imagedream run without them would silently
            # drop image conditioning — fail loudly instead (ADVICE r4).
            if kind == "imagedream" and ref_ip is None:
                raise ValueError(
                    "fused imagedream SDS needs precomputed ip tokens "
                    "(batch['ref_ip']); embed the per-frame references with "
                    "guidance.embed_ref first (cli/train precomputes them), "
                    "or run --sds-mode split / guidance mvdream"
                )

            def enc(images01, k):
                z = vae.apply(gp["vae"], images01.astype(dtype), k)
                return z.astype(jnp.float32)

            def den(lat, t, ctx):
                c = dict(ctx)
                for kk in ("context", "camera", "ip"):
                    if kk in c:
                        c[kk] = c[kk].astype(dtype)
                return unet.apply(gp["unet"], lat.astype(dtype), t, c).astype(
                    jnp.float32
                )

            tmp = MultiviewGuidance(gcfg, enc, den, gp["text"])
            return tmp(
                inp, c2w, key, step,
                ref_mask=ref_mask, comp_bg=comp_bg,
                ref_ip=ref_ip if kind == "imagedream" else None,
            )

        guidance_fn.apply_with_params = apply_with_params
        guidance_fn.for_stage = _assemble
        return guidance_fn

    return _assemble(stage)


def _mock_clip_vars(key, clip_cfg, resampler_cfg, on_device_dtype=None):
    """Random-init CLIP + Resampler variable trees.  ``on_device_dtype``
    picks between flax's real initializers on the CPU backend (tests) and
    shape-only on-device generation (full-shape ViT-H ~1.3 GB — see
    :func:`init_mock_networks`)."""
    import contextlib

    from .clip_vit import CLIPViT, Resampler

    k1, k2 = jax.random.split(key)
    dummy_img = jnp.zeros((1, clip_cfg.image_size, clip_cfg.image_size, 3))
    n_tok = 1 + (clip_cfg.image_size // clip_cfg.patch_size) ** 2
    dummy_tok = jnp.zeros((1, n_tok, clip_cfg.width))
    if on_device_dtype is not None:
        clip_shapes = jax.eval_shape(
            CLIPViT(clip_cfg).init, jax.random.PRNGKey(0), dummy_img
        )
        res_shapes = jax.eval_shape(
            Resampler(resampler_cfg).init, jax.random.PRNGKey(0), dummy_tok
        )
        return (
            _random_like_on_device(k1, clip_shapes, on_device_dtype),
            _random_like_on_device(k2, res_shapes, on_device_dtype),
        )

    cpu = _cpu_device()
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        clip_vars = CLIPViT(clip_cfg).init(k1, dummy_img)
        res_vars = Resampler(resampler_cfg).init(k2, dummy_tok)
        return clip_vars, res_vars
