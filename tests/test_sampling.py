"""Sampler tests: with an oracle eps model over a known Gaussian data
distribution, sampled statistics must match analytic values."""

import jax
import jax.numpy as jnp
import numpy as np

from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.diffusion.sampling import denoise_from_t, sample_ddim, sample_ddim_cfg, sample_ddpm
from siss_tpu.evaluate import Evaluator
import pytest


def _gaussian_oracle_eps(mu, std):
    """For x0 ~ N(mu, std²), the posterior-optimal eps at (x_t, t) is
    ε*(x_t,t) = (x_t − γ_t·μ)·σ_t / (γ_t²std² + σ_t²)  … derived from the
    score of the marginal N(γμ, γ²std² + σ²)."""

    def make(schedule):
        def eps_fn(x, t, cond):
            g = schedule.gamma[t].reshape(-1, 1, 1, 1)
            s = schedule.sigma[t].reshape(-1, 1, 1, 1)
            var = g**2 * std**2 + s**2
            return (x - g * mu) * s / var

        return eps_fn

    return make


def test_ddpm_sampler_matches_gaussian_target():
    mu, std = 0.3, 0.2
    sched = NoiseSchedule.create(1000, "linear", clip_sample=False)
    eps_fn = _gaussian_oracle_eps(mu, std)(sched)
    out = sample_ddpm(eps_fn, sched, jax.random.PRNGKey(0), (64, 8, 8, 1), num_inference_steps=50)
    samples = np.asarray(out)
    assert abs(samples.mean() - mu) < 0.05
    assert abs(samples.std() - std) < 0.06


def test_ddim_sampler_matches_gaussian_target():
    mu, std = -0.2, 0.3
    sched = NoiseSchedule.create(1000, "linear", clip_sample=False)
    eps_fn = _gaussian_oracle_eps(mu, std)(sched)
    out = sample_ddim(eps_fn, sched, jax.random.PRNGKey(1), (64, 8, 8, 1), num_inference_steps=50)
    samples = np.asarray(out)
    assert abs(samples.mean() - mu) < 0.05
    assert abs(samples.std() - std) < 0.08


@pytest.mark.slow
def test_denoise_from_t_recovers_mean():
    mu, std = 0.5, 0.05
    sched = NoiseSchedule.create(1000, "linear", clip_sample=False)
    eps_fn = _gaussian_oracle_eps(mu, std)(sched)
    key = jax.random.PRNGKey(2)
    x_t = jax.random.normal(key, (8, 8, 8, 1)) * sched.sigma[250] + sched.gamma[250] * mu
    out = denoise_from_t(eps_fn, sched, key, x_t, t_start=250)
    assert abs(np.asarray(out).mean() - mu) < 0.1


def test_cfg_noise_norm_tracking():
    sched = NoiseSchedule.create(1000, "linear", clip_sample=False)

    def eps_fn(x, t, cond):
        # 'conditioning' shifts the prediction; uncond embeds are zeros
        return 0.1 * x + cond.mean(axis=(1, 2))[:, None, None, None]

    B = 4
    cond = jnp.ones((B, 7, 16))
    uncond = jnp.zeros((B, 7, 16))
    out, norms = sample_ddim_cfg(
        eps_fn, sched, jax.random.PRNGKey(0), (B, 8, 8, 1), cond, uncond,
        guidance_scale=3.0, num_inference_steps=10, track_noise_norm=True,
    )
    assert out.shape == (B, 8, 8, 1)
    assert norms["uncond_norm"].shape == (10, B)
    assert norms["text_norm"].shape == (10, B)
    # delta = eps_text - eps_uncond = 1.0 per pixel → norm = sqrt(64)
    np.testing.assert_allclose(np.asarray(norms["text_norm"]), 8.0, rtol=1e-4)


@pytest.mark.slow
def test_evaluator_surface():
    sched = NoiseSchedule.create(1000, "linear")
    mu, std = 0.0, 0.1
    oracle = _gaussian_oracle_eps(mu, std)(sched)

    def eps_apply(params, x, t, cond):
        return oracle(x, t, cond)

    ev = Evaluator(eps_apply, sched, (8, 8, 1), num_inference_steps=20, random_seed=7)
    imgs = ev.sample_images({}, num_samples=4, set_generator=True)
    assert imgs.shape == (4, 8, 8, 1)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # deterministic with set_generator
    imgs2 = ev.sample_images({}, num_samples=4, set_generator=True)
    np.testing.assert_array_equal(imgs, imgs2)

    noisy = np.random.default_rng(0).normal(size=(2, 8, 8, 1)).astype(np.float32)
    den = ev.denoise_images({}, noisy, timestep=100)
    assert den.shape == (2, 8, 8, 1)

    grid = Evaluator.make_grid_from_images(imgs)
    assert grid.ndim == 3 and grid.shape[-1] == 1


def test_evaluator_dpm_injection_routing():
    """solver="dpm" routes ``denoise_images`` through the DPM-Solver++(2M)
    reverse ODE (``injection_steps`` model calls) — the task-level
    counterpart of bench.py's fast-eval path. Must match the direct
    ``denoise_from_t_dpm`` call exactly (same grid, deterministic)."""
    from siss_tpu.diffusion.sampling import denoise_from_t_dpm

    sched = NoiseSchedule.create(1000, "linear")
    oracle = _gaussian_oracle_eps(0.0, 0.1)(sched)

    def eps_apply(params, x, t, cond):
        return oracle(x, t, cond)

    ev = Evaluator(eps_apply, sched, (8, 8, 1), solver="dpm", injection_steps=6)
    noisy = np.random.default_rng(1).normal(size=(2, 8, 8, 1)).astype(np.float32)
    den = ev.denoise_images({}, noisy, timestep=250)
    direct = denoise_from_t_dpm(lambda x, t, c: oracle(x, t, c), sched,
                                jnp.asarray(noisy), 250, num_inference_steps=6)
    direct = np.clip((np.asarray(direct) + 1.0) / 2.0, 0.0, 1.0)
    np.testing.assert_allclose(den, direct, atol=1e-6)
