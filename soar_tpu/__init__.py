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
