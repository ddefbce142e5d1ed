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
        axes = tuple(range(1, x.ndim))
        norms = (
            jnp.sqrt(jnp.sum(eps_uncond.astype(jnp.float32) ** 2, axis=axes)),
            jnp.sqrt(jnp.sum(delta.astype(jnp.float32) ** 2, axis=axes)),
        )
        x = ddim_step(schedule, x, eps, t, p, eta=eta, key=sub)
        return (x, k), norms

    (x, _), (uncond_norms, text_norms) = jax.lax.scan(body, (x, key), (ts, prev))
    if track_noise_norm:
        return x, {"uncond_norm": uncond_norms, "text_norm": text_norms}
    return x, None
