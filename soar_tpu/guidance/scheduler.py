"""DDPM noise schedule (Stable Diffusion's scaled-linear betas).

The diffusion-side math the guidance needs from the LDM wrapper:
``q_sample`` and ``predict_start_from_noise``
(used at ``guidance/imagedream_guidance.py:241, 299-306``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DDPMSchedule(NamedTuple):
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray

    @staticmethod
    def stable_diffusion(num_timesteps: int = 1000) -> "DDPMSchedule":
        """SD's "scaled_linear": betas = linspace(sqrt(8.5e-4), sqrt(1.2e-2))²."""
        betas = (
            np.linspace(0.00085**0.5, 0.012**0.5, num_timesteps) ** 2
        ).astype(np.float32)
        ac = np.cumprod(1.0 - betas)
        return DDPMSchedule(
            betas=jnp.asarray(betas),
            alphas_cumprod=jnp.asarray(ac),
            sqrt_alphas_cumprod=jnp.asarray(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1.0 - ac)),
        )

    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
        """Forward diffusion: x_t = sqrt(ac_t) x0 + sqrt(1-ac_t) eps."""
        a = self.sqrt_alphas_cumprod[t]
        s = self.sqrt_one_minus_alphas_cumprod[t]
        return a * x0 + s * noise

    def predict_start_from_noise(
        self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ):
        """x0 = (x_t - sqrt(1-ac_t) eps) / sqrt(ac_t)."""
        a = self.sqrt_alphas_cumprod[t]
        s = self.sqrt_one_minus_alphas_cumprod[t]
        return (x_t - s * noise) / a
