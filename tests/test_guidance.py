import jax
import jax.numpy as jnp
import numpy as np

from soar_tpu.guidance import DDPMSchedule, GuidanceConfig, MultiviewGuidance
from soar_tpu.guidance.sds import mock_denoiser, mock_encoder, normalize_camera


def test_schedule_shapes_and_qsample_roundtrip():
    sch = DDPMSchedule.stable_diffusion(1000)
    assert sch.alphas_cumprod.shape == (1000,)
    assert float(sch.alphas_cumprod[0]) > 0.99
    assert float(sch.alphas_cumprod[-1]) < 0.01
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.asarray(500)
    xt = sch.q_sample(x0, t, noise)
    back = sch.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(back, x0, atol=1e-4)


def test_normalize_camera_unit_translation():
    c2w = jnp.tile(jnp.eye(4)[None], (4, 1, 1)).at[:, :3, 3].set(
        jnp.asarray([[0.0, 0.0, 5.0]] * 4)
    )
    flat = normalize_camera(c2w)
    assert flat.shape == (4, 16)
    np.testing.assert_allclose(flat[:, 11], 1.0, atol=1e-6)  # z transl -> 1


def _make_guidance(x0_target=None, **cfg_kw):
    cfg = GuidanceConfig(image_size=32, recon_std_rescale=0.0, **cfg_kw)
    sch = DDPMSchedule.stable_diffusion(cfg.num_train_timesteps)
    text = jnp.zeros((2, 77, 16))
    return MultiviewGuidance(
        cfg,
        encode_fn=mock_encoder(downscale=8),
        denoise_fn=mock_denoiser(sch, x0_target),
        text_embeddings=text,
    )


def test_sds_zero_when_denoiser_agrees():
    """If the denoiser's implied x0 equals the current latents, the recon
    target equals the latents -> zero loss and zero gradient."""
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
    c2w = jnp.tile(jnp.eye(4)[None], (4, 1, 1))
    # implied x0 = current latents
    enc = mock_encoder(8)
    latents = enc(rgb, None)
    g = _make_guidance(x0_target=latents, guidance_scale=1.0)
    out = g(rgb, c2w, jax.random.PRNGKey(1), jnp.asarray(0))
    assert float(out["loss_sds"]) < 1e-6


def test_sds_pulls_latents_toward_target():
    """Gradient of the SDS loss w.r.t. rgb points from current latents
    toward the denoiser's preferred x0."""
    rgb = jnp.full((4, 32, 32, 3), 0.2)
    c2w = jnp.tile(jnp.eye(4)[None], (4, 1, 1))
    target_latents = jnp.full((4, 4, 4, 4), 1.0)
    g = _make_guidance(x0_target=target_latents, guidance_scale=1.0)

    def loss(r):
        return g(r, c2w, jax.random.PRNGKey(1), jnp.asarray(0))["loss_sds"]

    grads = jax.grad(loss)(rgb)
    # Moving rgb UP moves latents toward the (larger) target -> negative grad.
    assert float(jnp.mean(grads)) < 0
    assert np.isfinite(np.asarray(grads)).all()


def test_timestep_window_annealing():
    cfg = GuidanceConfig(
        image_size=32, max_step_percent=(0, 0.75, 0.25, 100), min_step_percent=0.02
    )
    sch = DDPMSchedule.stable_diffusion(1000)
    g = MultiviewGuidance(
        cfg,
        encode_fn=mock_encoder(8),
        denoise_fn=mock_denoiser(sch),
        text_embeddings=jnp.zeros((2, 77, 8)),
    )
    rgb = jnp.full((4, 32, 32, 3), 0.5)
    c2w = jnp.tile(jnp.eye(4)[None], (4, 1, 1))
    ts_early = [
        int(g(rgb, c2w, jax.random.PRNGKey(s), jnp.asarray(0))["t"])
        for s in range(20)
    ]
    ts_late = [
        int(g(rgb, c2w, jax.random.PRNGKey(s), jnp.asarray(1000))["t"])
        for s in range(20)
    ]
    assert max(ts_early) > 400  # window up to 750 at step 0
    assert max(ts_late) <= 250  # annealed to 250 by step >= 100
