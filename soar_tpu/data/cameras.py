"""Random training-camera sampling with ``jax.random``.

Reproduces the distributions of the reference dataset's per-step camera draw
(``data/uncond_multiview.py:430-607``): elevation either uniform-in-degrees
or uniform-on-sphere (coin flip), azimuths stratified over the batch, fovy /
distance / zoom uniform with the relative-radius convention, OpenGL look-at
poses with up=+z (the gen-view axis permutation in the renderer maps the
avatar into this frame).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.camera import look_at_c2w


@dataclasses.dataclass(frozen=True)
class CameraSampleConfig:
    n_view: int = 4
    elevation_range: Tuple[float, float] = (-15.0, 30.0)
    azimuth_range: Tuple[float, float] = (-180.0, 180.0)
    fovy_range: Tuple[float, float] = (15.0, 60.0)
    camera_distance_range: Tuple[float, float] = (0.8, 1.0)
    zoom_range: Tuple[float, float] = (1.0, 1.0)
    relative_radius: bool = True


def sample_multiview_cameras(
    key: jax.Array, cfg: CameraSampleConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (c2w [n_view, 4, 4], fovy [n_view] radians)."""
    n = cfg.n_view
    ks = jax.random.split(key, 6)

    u_elev = jax.random.uniform(ks[0])
    elev_uniform = (
        jax.random.uniform(ks[1]) * (cfg.elevation_range[1] - cfg.elevation_range[0])
        + cfg.elevation_range[0]
    )
    p0 = (cfg.elevation_range[0] + 90.0) / 180.0
    p1 = (cfg.elevation_range[1] + 90.0) / 180.0
    elev_sphere = (
        jnp.arcsin(2.0 * (jax.random.uniform(ks[1]) * (p1 - p0) + p0) - 1.0)
        / jnp.pi
        * 180.0
    )
    elevation_deg = jnp.where(u_elev < 0.5, elev_uniform, elev_sphere)
    elevation = jnp.broadcast_to(jnp.deg2rad(elevation_deg), (n,))

    # Stratified azimuths covering the range (``uncond_multiview.py:459-468``).
    azimuth_deg = (
        (jax.random.uniform(ks[2]) + jnp.arange(n)) / n
        * (cfg.azimuth_range[1] - cfg.azimuth_range[0])
        + cfg.azimuth_range[0]
    )
    azimuth = jnp.deg2rad(azimuth_deg)

    fovy_deg = jax.random.uniform(
        ks[3], minval=cfg.fovy_range[0], maxval=cfg.fovy_range[1]
    )
    fovy = jnp.broadcast_to(jnp.deg2rad(fovy_deg), (n,))

    dist = jax.random.uniform(
        ks[4],
        minval=cfg.camera_distance_range[0],
        maxval=cfg.camera_distance_range[1],
    )
    if cfg.relative_radius:
        dist = dist / jnp.tan(0.5 * fovy)
    zoom = jax.random.uniform(
        ks[5], minval=cfg.zoom_range[0], maxval=cfg.zoom_range[1]
    )
    fovy = fovy * zoom

    # Spherical -> cartesian in the sampler frame: x back, y right, z up.
    pos = jnp.stack(
        [
            dist * jnp.cos(elevation) * jnp.cos(azimuth),
            dist * jnp.cos(elevation) * jnp.sin(azimuth),
            dist * jnp.sin(elevation),
        ],
        axis=-1,
    )
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    c2w = jax.vmap(look_at_c2w)(pos, jnp.zeros_like(pos), up)
    return c2w, fovy


def sample_head_cameras(
    key: jax.Array, n_view: int = 4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Close-up "head" camera draw (``renderer/gaussian_batch_renderer.py:
    264-276, 473-595``).  NOTE: latent in the reference — sampled every step
    but never consumed by the surfel system's render path (only the older
    MVDream system feeds them to guidance); provided for parity.

    Faithful quirk: the reference calls ``sample_camera`` with
    ``camera_distance_range=[0.28, 0.28]`` but ``relative_radius=True`` and
    an ORIGIN look-at (``:264-270, 549-551``), so the actual distance is
    0.28 / tan(fovy/2) ~ 0.7-1.0 aimed at the body center — a tighter
    framing than the gen cameras, not a literal head orbit."""
    cfg = CameraSampleConfig(
        n_view=n_view,
        elevation_range=(-10.0, 20.0),
        camera_distance_range=(0.28, 0.28),
        fovy_range=(30.0, 45.0),
    )
    return sample_multiview_cameras(key, cfg)
