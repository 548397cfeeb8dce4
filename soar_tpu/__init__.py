"""soar_tpu — a TPU-native (JAX / XLA / Pallas) rebuild of SOAR.

SOAR (Self-Occluded Avatar Recovery from a Single Video In the Wild,
arXiv 2410.23800) optimizes an animatable 2D Gaussian-surfel avatar rigged to
SMPL-X via LBS from a monocular video.  The CUDA/torch reference implements
this as a threestudio plugin with four CUDA extensions; this package is a
ground-up redesign for TPU:

- the tile-based CUDA surfel rasterizer becomes a depth-sorted, tile-binned
  splat renderer built from XLA sort/scan primitives plus a Pallas kernel for
  the hot per-tile alpha-compositing loop (``soar_tpu.render``),
- SMPL-X linear blend skinning runs as one fused jitted function
  (``soar_tpu.body``),
- the tcnn multiresolution hash field becomes a pure-XLA instant-ngp grid
  (``soar_tpu.field``),
- training is a pure-functional jitted step over an explicit state pytree with
  optax, sharded over a ``jax.sharding.Mesh`` by camera view
  (``soar_tpu.train``, ``soar_tpu.parallel``).

Reference mapping (file:line cites point into the reference repo checkout):
see SURVEY.md at the repository root.
"""

__version__ = "0.1.0"


def _set_matmul_precision():
    """Default f32 matmuls to true float32 (override with
    SOAR_TPU_MATMUL_PRECISION, e.g. ``bfloat16`` to restore the JAX
    default).

    On TPU, JAX's default matmul precision rounds f32 contraction operands
    through bf16 on the MXU.  The reference computes every geometry /
    compositing contraction in fp32 CUDA; measured on v5e, the default cost
    the composite's channel reduction 3.4e-3 abs error vs an f64 oracle
    (camera projection and LBS blends round the same way).  The deliberate
    reduced-precision paths (guidance UNet/VAE/CLIP, train-loss LPIPS) cast
    their operands to bf16 explicitly and are unaffected by this default.
    """
    import os

    if (
        "SOAR_TPU_MATMUL_PRECISION" not in os.environ
        and os.environ.get("JAX_DEFAULT_MATMUL_PRECISION")
    ):
        # The user already configured JAX's own knob for this process;
        # don't silently override it (ADVICE r3).
        return
    prec = os.environ.get("SOAR_TPU_MATMUL_PRECISION", "float32")
    if not prec:
        return
    try:
        import jax

        jax.config.update("jax_default_matmul_precision", prec)
    except Exception as e:  # renamed config key, bad value
        import warnings

        warnings.warn(f"soar_tpu: default matmul precision not set ({e!r})")


_set_matmul_precision()


def _respect_platform_env():
    """Make ``JAX_PLATFORMS=cpu python -m soar_tpu...`` reliable: the axon
    TPU plugin ignores the env var in some process states, silently
    grabbing the (shared, tunneled) chip for runs meant to stay on the
    host.  The config flag wins over the plugin, so mirror the env var
    into it (tests/conftest.py and __graft_entry__ already do this
    individually)."""
    import os

    plats = os.environ.get("JAX_PLATFORMS")
    # ONLY the cpu case: that is the documented workaround target, and the
    # deployment environment exports JAX_PLATFORMS=axon globally — blindly
    # mirroring that would override callers (e.g. dryrun_multichip) that
    # already forced the config flag to cpu before importing soar_tpu.
    if plats != "cpu":
        return
    try:
        import jax

        jax.config.update("jax_platforms", plats)
    except Exception:  # pragma: no cover - config key rename
        pass


_respect_platform_env()


def _enable_compilation_cache():
    """Persistent XLA compilation cache (override dir with
    SOAR_TPU_COMPILE_CACHE; disable with SOAR_TPU_COMPILE_CACHE=0).

    The TPU backend compiles the rasterizer's sort-heavy graphs slowly
    (~20 s per sort instance over the remote-compile transport); the cache
    makes every run after the first start instantly.
    """
    import os

    cache = os.environ.get(
        "SOAR_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/soar_tpu_xla"),
    )
    if cache == "0":
        return
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # unwritable dir, renamed config key, ...
        import warnings

        warnings.warn(
            f"soar_tpu: persistent compile cache disabled ({e!r}); "
            "set SOAR_TPU_COMPILE_CACHE to a writable dir or 0 to silence"
        )


_enable_compilation_cache()
