"""Discrete-time diffusion noise schedules and reverse-process steps.

TPU-native re-design of the scheduler subset the reference uses from HF
diffusers (``DDPMScheduler``/``DDIMScheduler``: ``add_noise``, ``step``,
``set_timesteps``; see reference usage at ``delete_celeb.py:602-603`` and
``evaluate.py:64-79``). Everything here is a pure function over a
``NoiseSchedule`` pytree so it can live inside ``jit``/``lax.scan`` bodies
with zero host synchronisation; sampling loops are built in
``siss_tpu.diffusion.sampling`` as ``lax.scan`` over these step functions.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    name: str,
    num_train_timesteps: int,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> np.ndarray:
    """Build a beta schedule (host-side, float64 for accuracy, cast to f32).

    Mirrors the three schedules the reference configs can request
    (``config/train_tshirt_mnist.yaml:43-50`` uses ``linear``;
    ``scaled_linear`` is the SD-1.x schedule; ``squaredcos_cap_v2`` for
    completeness with the diffusers surface).
    """
    if name == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif name == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif name == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(num_train_timesteps, dtype=np.float64)
        betas = np.minimum(1.0 - alpha_bar((ts + 1) / num_train_timesteps) / alpha_bar(ts / num_train_timesteps), 0.999)
    else:
        raise ValueError(f"Unknown beta schedule: {name!r}")
    return betas.astype(np.float32)


def spaced_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Descending inference timestep grid.

    Matches diffusers' ``DDPMScheduler.set_timesteps`` spacing (leading,
    stride = ``T // n``): for T=1000, n=50 this is [980, 960, ..., 0].
    """
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
    return ts.astype(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Immutable table pytree for a discrete DDPM forward process.

    ``gamma``/``sigma`` are the √ᾱ_t and √(1-ᾱ_t) tables the reference
    builds from ``scheduler.alphas_cumprod`` (``delete_celeb.py:367-371``)
    and feeds to ``DDPMDeletionLoss``.
    """

    betas: jax.Array                 # [T]
    alphas_cumprod: jax.Array        # [T]
    gamma: jax.Array                 # [T] = sqrt(alphas_cumprod)
    sigma: jax.Array                 # [T] = sqrt(1 - alphas_cumprod)
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(default="epsilon", metadata=dict(static=True))
    clip_sample: bool = dataclasses.field(default=True, metadata=dict(static=True))
    clip_sample_range: float = dataclasses.field(default=1.0, metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_schedule: str = "linear",
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        prediction_type: str = "epsilon",
        clip_sample: bool = True,
        clip_sample_range: float = 1.0,
    ) -> "NoiseSchedule":
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end)
        alphas_cumprod = np.cumprod(1.0 - betas.astype(np.float64)).astype(np.float32)
        return cls(
            betas=jnp.asarray(betas),
            alphas_cumprod=jnp.asarray(alphas_cumprod),
            gamma=jnp.asarray(np.sqrt(alphas_cumprod)),
            sigma=jnp.asarray(np.sqrt(1.0 - alphas_cumprod)),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
            clip_sample=clip_sample,
            clip_sample_range=clip_sample_range,
        )


def _bcast(coef: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast a per-batch coefficient [B] against [B, ...spatial...]."""
    return coef.reshape(coef.shape + (1,) * (like.ndim - coef.ndim))


def q_sample(schedule: NoiseSchedule, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
    """Forward noising q(x_t | x_0) = γ_t·x0 + σ_t·ε.

    Equivalent of diffusers ``scheduler.add_noise`` as used at
    ``delete_celeb.py:602-603``. ``t`` is int32 [B].
    """
    gamma = _bcast(schedule.gamma[t], x0)
    sigma = _bcast(schedule.sigma[t], x0)
    return gamma * x0 + sigma * noise


def pred_x0_from_eps(schedule: NoiseSchedule, x_t: jax.Array, eps: jax.Array, t: jax.Array) -> jax.Array:
    gamma = _bcast(schedule.gamma[t], x_t)
    sigma = _bcast(schedule.sigma[t], x_t)
    return (x_t - sigma * eps) / gamma


def _model_pred_to_x0(schedule: NoiseSchedule, x_t, model_out, t):
    if schedule.prediction_type == "epsilon":
        x0 = pred_x0_from_eps(schedule, x_t, model_out, t)
    elif schedule.prediction_type == "sample":
        x0 = model_out
    elif schedule.prediction_type == "v_prediction":
        gamma = _bcast(schedule.gamma[t], x_t)
        sigma = _bcast(schedule.sigma[t], x_t)
        x0 = gamma * x_t - sigma * model_out
    else:
        raise ValueError(f"Unknown prediction_type {schedule.prediction_type!r}")
    if schedule.clip_sample:
        x0 = jnp.clip(x0, -schedule.clip_sample_range, schedule.clip_sample_range)
    return x0


def ddpm_step(
    schedule: NoiseSchedule,
    x_t: jax.Array,
    model_out: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    key: jax.Array,
) -> jax.Array:
    """One ancestral DDPM reverse step x_t → x_{prev_t}.

    Matches diffusers ``DDPMScheduler.step`` with ``variance_type=
    "fixed_small"`` (the default the reference's pipelines run with), for an
    arbitrary inference timestep spacing (``prev_t`` may be t-1 or t-stride).
    ``t``/``prev_t`` are scalar int32; ``prev_t < 0`` means "final step".
    """
    alpha_prod_t = schedule.alphas_cumprod[t]
    alpha_prod_prev = jnp.where(prev_t >= 0, schedule.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_prev = 1.0 - alpha_prod_prev
    current_alpha = alpha_prod_t / alpha_prod_prev
    current_beta = 1.0 - current_alpha

    x0 = _model_pred_to_x0(schedule, x_t, model_out, t[None] if t.ndim == 0 else t)

    # Posterior mean coefficients (Ho et al. eq. 7).
    coef_x0 = (jnp.sqrt(alpha_prod_prev) * current_beta) / beta_prod_t
    coef_xt = (jnp.sqrt(current_alpha) * beta_prod_prev) / beta_prod_t
    mean = coef_x0 * x0 + coef_xt * x_t

    # fixed_small variance, clamped like diffusers for numerical stability.
    variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta, min=1e-20)
    noise = jax.random.normal(key, x_t.shape, dtype=x_t.dtype)
    add_noise = (prev_t >= 0).astype(x_t.dtype)
    return mean + add_noise * jnp.sqrt(variance) * noise


def ddim_step(
    schedule: NoiseSchedule,
    x_t: jax.Array,
    model_out: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    eta: float = 0.0,
    key: jax.Array | None = None,
) -> jax.Array:
    """One DDIM reverse step (Song et al.), diffusers-``DDIMScheduler``
    semantics with ``eta`` noise mixing (``eta=0`` → deterministic, the mode
    the reference's SD validation sampler runs in, ``delete_sd.py:236-248``).
    """
    alpha_prod_t = schedule.alphas_cumprod[t]
    alpha_prod_prev = jnp.where(prev_t >= 0, schedule.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
    beta_prod_t = 1.0 - alpha_prod_t

    x0 = _model_pred_to_x0(schedule, x_t, model_out, t[None] if t.ndim == 0 else t)
    # Re-derive the epsilon that is consistent with the (possibly clipped) x0.
    eps = (x_t - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(beta_prod_t)

    variance = (1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t) * (1.0 - alpha_prod_t / alpha_prod_prev)
    std = eta * jnp.sqrt(jnp.clip(variance, min=0.0))

    dir_xt = jnp.sqrt(jnp.clip(1.0 - alpha_prod_prev - std**2, min=0.0)) * eps
    prev = jnp.sqrt(alpha_prod_prev) * x0 + dir_xt
    if eta > 0.0:
        if key is None:
            raise ValueError("eta > 0 requires a PRNG key")
        prev = prev + std * jax.random.normal(key, x_t.shape, dtype=x_t.dtype)
    return prev


def snr_weights(schedule: NoiseSchedule, t: jax.Array, like: jax.Array) -> jax.Array:
    """SNR = ᾱ/(1-ᾱ) weighting used by the reference's "sample" prediction
    pretraining branch (``train_unconditional.py:392-403``)."""
    a = schedule.alphas_cumprod[t]
    return _bcast(a / (1.0 - a), like)
