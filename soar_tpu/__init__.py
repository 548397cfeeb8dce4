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
