"""Neural environment-map background.

Pytree rebuild of ``NeuralEnvironmentMapBackground``
(``background/gaussian_mvdream_background.py:15-73``): spherical-harmonics
direction encoding (degree 3, tcnn convention: applied to dirs remapped to
[0,1]) -> 2-hidden-layer 16-wide MLP -> sigmoid, with the random
solid-background augmentation (prob 0.5, color shared across views, and the
reference's coin flip that zeroes the random color half the time —
``value = random.random() < 0.5`` makes the solid bg black 50% of the time).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _sh_encoding_deg3(d: jnp.ndarray) -> jnp.ndarray:
    """tcnn SphericalHarmonics degree-3: 9 components of the direction that
    tcnn first maps from [0,1] back to [-1,1]."""
    d = d * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            0.28209479177387814 * one,
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * x * y,
            -1.0925484305920792 * y * z,
            0.94617469575755997 * z * z - 0.31539156525251999,
            -1.0925484305920792 * x * z,
            0.54627421529603959 * (x * x - y * y),
        ],
        axis=-1,
    )


def init_background(key: jax.Array, hidden: int = 16) -> Dict:
    """threestudio's VanillaMLP builds every layer bias-FREE
    (``nn.Linear(..., bias=False)``) — matched here: weights only."""
    k1, k2, k3 = jax.random.split(key, 3)
    dims = [(9, hidden), (hidden, hidden), (hidden, 3)]
    params = []
    for k, (a, b) in zip((k1, k2, k3), dims):
        bound = 1.0 / jnp.sqrt(a)
        params.append(
            {"w": jax.random.uniform(k, (a, b), minval=-bound, maxval=bound)}
        )
    return {"layers": params}


def background_color(params: Dict, dirs: jnp.ndarray) -> jnp.ndarray:
    """dirs [..., 3] normalized -> color [..., 3] in (0, 1)."""
    x = _sh_encoding_deg3((dirs + 1.0) / 2.0)
    layers = params["layers"]
    for i, layer in enumerate(layers):
        x = x @ layer["w"]
        if "b" in layer:  # older checkpoints carried (zero) biases
            x = x + layer["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return jax.nn.sigmoid(x)


def apply_random_aug(
    color: jnp.ndarray,  # [V, H, W, 3]
    key: jax.Array,
    aug_prob: float = 0.5,
) -> jnp.ndarray:
    """Random solid-background augmentation shared across views
    (``gaussian_mvdream_background.py:59-72``, share_aug_bg=True).

    Gradient note: the reference writes ``color * 0 + solid`` purely to keep
    the bg MLP attached to the graph for DDP's unused-parameter check — the
    gradient through ``color * 0`` is identically zero, so ``jnp.where``
    (which blocks the color gradient on the aug branch) is exactly
    equivalent; and the bg MLP is never optimized anyway (its optimizer is
    built but dropped, ``gaussian_surfel_mvdream.py:59-66``)."""
    k1, k2, k3 = jax.random.split(key, 3)
    use_aug = jax.random.uniform(k1) < aug_prob
    nonzero = jax.random.uniform(k2) < 0.5
    solid = jax.random.normal(k3, (1, 1, 1, 3)) * nonzero
    solid = jnp.broadcast_to(solid, color.shape)
    return jnp.where(use_aug, solid, color)
