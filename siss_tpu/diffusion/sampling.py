"""Fused sampling loops: DDPM ancestral, DDIM, CFG, denoising injections.

TPU-native replacement for the reference's sampling stacks — the diffusers
``DDPMPipeline`` ancestral loop driven by ``Evaluator.sample_images``
(``evaluate.py:37-50``), the manual ``denoise_images`` reverse loop
(``evaluate.py:64-79``), and the CFG DDIM loop with per-step noise-norm
tracking in ``LocalStableDiffusionPipeline.__call__``
(``data/src/local_sd_pipeline.py:142-196,225-235``). Each 50-step loop is a
single ``lax.scan`` body under ``jit``: one XLA program, no host round-trips
between steps.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from siss_tpu.diffusion.schedule import NoiseSchedule, ddim_step, ddpm_step, spaced_timesteps

EpsFn = Callable[[jax.Array, jax.Array, Any], jax.Array]
# (x_t, timesteps[B], conditioning) -> eps prediction


def _timestep_grid(schedule: NoiseSchedule, num_inference_steps: int):
    ts = spaced_timesteps(schedule.num_train_timesteps, num_inference_steps)
    prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
    return jnp.asarray(ts), jnp.asarray(prev)


def sample_ddpm(
    eps_fn: EpsFn,
    schedule: NoiseSchedule,
    key: jax.Array,
    shape: Tuple[int, ...],
    num_inference_steps: int = 50,
    conditioning: Any = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Ancestral DDPM sampling from pure noise; returns images in [-1, 1]
    value range (clipping per schedule.clip_sample)."""
    ts, prev = _timestep_grid(schedule, num_inference_steps)
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, dtype=dtype)

    def body(carry, step_ts):
        x, k = carry
        t, p = step_ts
        k, sub = jax.random.split(k)
        eps = eps_fn(x, jnp.broadcast_to(t, (shape[0],)), conditioning)
        x = ddpm_step(schedule, x, eps, t, p, sub)
        return (x, k), None

    (x, _), _ = jax.lax.scan(body, (x, key), (ts, prev))
    return x


def sample_ddim(
    eps_fn: EpsFn,
    schedule: NoiseSchedule,
    key: jax.Array,
    shape: Tuple[int, ...],
    num_inference_steps: int = 50,
    conditioning: Any = None,
    eta: float = 0.0,
    init_latents: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jax.Array:
    ts, prev = _timestep_grid(schedule, num_inference_steps)
    key, init_key = jax.random.split(key)
    x = init_latents if init_latents is not None else jax.random.normal(init_key, shape, dtype=dtype)

    def body(carry, step_ts):
        x, k = carry
        t, p = step_ts
        k, sub = jax.random.split(k)
        eps = eps_fn(x, jnp.broadcast_to(t, (shape[0],)), conditioning)
        x = ddim_step(schedule, x, eps, t, p, eta=eta, key=sub)
        return (x, k), None

    (x, _), _ = jax.lax.scan(body, (x, key), (ts, prev))
    return x


def denoise_from_t(
    eps_fn: EpsFn,
    schedule: NoiseSchedule,
    key: jax.Array,
    x_t: jax.Array,
    t_start: int,
    conditioning: Any = None,
) -> jax.Array:
    """Full-resolution reverse loop from a given timestep down to 0 —
    the reference's ``Evaluator.denoise_images`` used for "denoising
    injection" metrics (``evaluate.py:64-79``, ``delete_celeb.py:404-436``).
    ``t_start`` is static."""
    ts = jnp.arange(t_start, -1, -1)
    prev = ts - 1

    def body(carry, step_ts):
        x, k = carry
        t, p = step_ts
        k, sub = jax.random.split(k)
        eps = eps_fn(x, jnp.broadcast_to(t, (x_t.shape[0],)), conditioning)
        x = ddpm_step(schedule, x, eps, t, p, sub)
        return (x, k), None

    (x, _), _ = jax.lax.scan(body, (x_t, key), (ts, prev))
    return x


def sample_dpm_solver_2m(
    eps_fn: EpsFn,
    schedule: NoiseSchedule,
    key: jax.Array,
    shape: Tuple[int, ...],
    num_inference_steps: int = 15,
    conditioning: Any = None,
    dtype=jnp.float32,
) -> jax.Array:
    """DPM-Solver++(2M): second-order multistep ODE solver in the
    data-prediction parameterisation (Lu et al. 2022). Matches 50-step
    DDIM quality in ~10-20 model calls — a TPU-native speedup for the
    reference's 50-step eval loops (sampling every grad step,
    ``config/delete_celeb.yaml:97,140-141``), not a parity port.
    """
    ts, _ = _timestep_grid(schedule, num_inference_steps)
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, dtype=dtype)
    return _dpm_solver_2m_core(eps_fn, schedule, x, ts, conditioning)


def denoise_from_t_dpm(
    eps_fn: EpsFn,
    schedule: NoiseSchedule,
    x_t: jax.Array,
    t_start: int,
    num_inference_steps: int = 10,
    conditioning: Any = None,
) -> jax.Array:
    """DPM-Solver++(2M) denoising injection: reverse-ODE a latent noised to
    ``t_start`` back to 0 in ~``num_inference_steps`` model calls, the fast
    counterpart of :func:`denoise_from_t`'s ``t_start+1``-call ancestral loop
    (the reference's ``Evaluator.denoise_images``, ``evaluate.py:64-79``).
    Deterministic (ODE path, no noise injection). ``t_start`` is static."""
    n = max(2, min(int(num_inference_steps), int(t_start) + 1))
    ts = jnp.asarray(np.unique(np.linspace(t_start, 0, n).round())[::-1].astype(np.int32).copy())
    return _dpm_solver_2m_core(eps_fn, schedule, x_t, ts, conditioning)


def _dpm_solver_2m_core(
    eps_fn: EpsFn,
    schedule: NoiseSchedule,
    x: jax.Array,
    ts: jax.Array,
    conditioning: Any = None,
) -> jax.Array:
    shape = x.shape
    # λ(t) = log(γ/σ) grid, incl. the final clean point (γ=1, σ→0 clamped)
    gamma_all = jnp.concatenate([schedule.gamma[ts], jnp.ones((1,))])
    sigma_all = jnp.clip(jnp.concatenate([schedule.sigma[ts], jnp.zeros((1,))]), 1e-4)
    lam = jnp.log(gamma_all / sigma_all)

    def x0_of(x, t):
        eps = eps_fn(x, jnp.broadcast_to(t, (shape[0],)), conditioning)
        g = schedule.gamma[t]
        s = schedule.sigma[t]
        x0 = (x - s * eps) / g
        if schedule.clip_sample:
            x0 = jnp.clip(x0, -schedule.clip_sample_range, schedule.clip_sample_range)
        return x0

    def body(carry, idx):
        x, x0_prev = carry
        t = ts[idx]
        x0 = x0_of(x, t)
        lam_t, lam_next = lam[idx], lam[idx + 1]
        h = lam_next - lam_t
        g_next = gamma_all[idx + 1]
        s_next = sigma_all[idx + 1]
        # 2M update: D = (1 + 1/(2r)) x0 − (1/(2r)) x0_prev with r = h_prev/h
        lam_prev = lam[jnp.maximum(idx - 1, 0)]
        r = (lam_t - lam_prev) / h
        # lower_order_final: the last step's h (to the clean point) is huge;
        # second-order extrapolation there is unstable — drop to 1st order.
        use_second = (idx > 0) & (idx < len(ts) - 1) & jnp.isfinite(r) & (jnp.abs(r) > 1e-6)
        d = jnp.where(use_second, (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev, x0)
        x_next = (s_next / sigma_all[idx]) * x - g_next * jnp.expm1(-h) * d
        return (x_next, x0), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), jnp.arange(len(ts)))
    return x


def sample_ddim_cfg(
    eps_fn: EpsFn,
    schedule: NoiseSchedule,
    key: jax.Array,
    shape: Tuple[int, ...],
    cond_embeds: jax.Array,
    uncond_embeds: jax.Array,
    guidance_scale: float = 7.5,
    num_inference_steps: int = 50,
    track_noise_norm: bool = False,
    eta: float = 0.0,
    dtype=jnp.float32,
):
    """Classifier-free-guidance DDIM sampling with optional per-step noise
    norm tracking (the reference's memorization diagnostic: per-image
    ‖ε_uncond‖ and ‖ε_text − ε_uncond‖ curves,
    ``local_sd_pipeline.py:142-196``).

    The cond/uncond branches are batched into ONE model call (batch axis
    doubling — same trick diffusers uses, but fused under jit).

    Returns ``(samples, norms)`` where norms is None or a dict of
    ``uncond_norm``/``text_norm`` arrays shaped [steps, B].
    """
    ts, prev = _timestep_grid(schedule, num_inference_steps)
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, dtype=dtype)
    B = shape[0]
    both_embeds = jnp.concatenate([uncond_embeds, cond_embeds], axis=0)

    def body(carry, step_ts):
        x, k = carry
        t, p = step_ts
        k, sub = jax.random.split(k)
        x2 = jnp.concatenate([x, x], axis=0)
        eps_both = eps_fn(x2, jnp.broadcast_to(t, (2 * B,)), both_embeds)
        eps_uncond, eps_text = eps_both[:B], eps_both[B:]
        delta = eps_text - eps_uncond
        eps = eps_uncond + guidance_scale * delta
        if track_noise_norm:
            axes = tuple(range(1, x.ndim))
            norms = (
                jnp.sqrt(jnp.sum(eps_uncond.astype(jnp.float32) ** 2, axis=axes)),
                jnp.sqrt(jnp.sum(delta.astype(jnp.float32) ** 2, axis=axes)),
            )
        else:
            # no scan outputs at all — the norm reductions never enter the
            # program when untracked (they'd be materialized [steps, B] work)
            norms = None
        x = ddim_step(schedule, x, eps, t, p, eta=eta, key=sub)
        return (x, k), norms

    (x, _), norms_out = jax.lax.scan(body, (x, key), (ts, prev))
    if track_noise_norm:
        uncond_norms, text_norms = norms_out
        return x, {"uncond_norm": uncond_norms, "text_norm": text_norms}
    return x, None
