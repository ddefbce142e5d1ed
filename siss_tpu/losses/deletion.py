"""Data-unlearning loss family (the scientific core).

Pure-JAX re-implementation of the six objectives in the reference's
``losses/ddpm_deletion_loss.py`` (SISS importance-sampled defensive mixture,
SISS-no-IS double forward, EraseDiff, NegGrad, naive deletion, and the
reviewer-proposed subscore-Bernoulli). Every method returns the same 7-field
``DeletionLossOutputs``; ``loss is None`` signals the two-gradient
surgery path exactly as in the reference (``ddpm_deletion_loss.py:56``).

Differences from the reference, by design (TPU-first):

* Randomness is explicit: every stochastic method takes a PRNG ``key``
  instead of relying on torch's global generator.
* ``subscore_bernoulli`` uses where-masking instead of boolean fancy
  indexing (dynamic shapes don't exist under XLA); the gradient and the
  ``sum()/batch_size`` normalisation are identical because masked-out
  entries contribute exact zeros, and the reference's empty-mask guard
  (``ddpm_deletion_loss.py:113-121``) becomes a natural no-op.
* Importance weights are computed in float32 via a log-sum-exp-stable
  rearrangement that is algebraically identical to
  ``ddpm_deletion_loss.py:41-45`` but cannot overflow.

The model enters through ``eps_fn(noisy_latents, timesteps, cond) -> eps``,
keeping the losses model-agnostic like the reference's ``unet(...)`` calls.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

EpsFn = Callable[[jax.Array, jax.Array, Any], jax.Array]


class DeletionLossOutputs(NamedTuple):
    """Mirror of the reference's 7-tuple return (``ddpm_deletion_loss.py:56``)."""

    loss: Optional[jax.Array]              # scalar-path per-pixel loss, or None
    loss_x: Optional[jax.Array]            # keep-term per-pixel loss
    loss_a: Optional[jax.Array]            # forget-term per-pixel loss
    importance_weight_x: Optional[jax.Array]   # [B]
    importance_weight_a: Optional[jax.Array]   # [B]
    weighted_loss_x: Optional[jax.Array]   # per-pixel, feeds gradient surgery
    weighted_loss_a: Optional[jax.Array]   # per-pixel, feeds gradient surgery


def _bcast(coef: jax.Array, like: jax.Array) -> jax.Array:
    return coef.reshape(coef.shape + (1,) * (like.ndim - coef.ndim))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeletionLoss:
    """Holds the γ=√ᾱ and σ=√(1-ᾱ) tables (reference ctor,
    ``ddpm_deletion_loss.py:4-7``, built at ``delete_celeb.py:367-371``)."""

    gamma: jax.Array  # [T]
    sigma: jax.Array  # [T]

    # ----------------------------------------------------------------- SISS
    def importance_sampling_with_mixture(
        self,
        eps_fn: EpsFn,
        key: jax.Array,
        timesteps: jax.Array,
        noise: jax.Array,
        conditioning: Any,
        all_samples: Dict[str, jax.Array],
        deletion_samples: Dict[str, jax.Array],
        *,
        lambd: float,
    ) -> DeletionLossOutputs:
        """SISS: one forward on a Bernoulli(λ) defensive mixture of keep and
        forget noisy latents, importance-weighted keep/forget MSE terms
        (``ddpm_deletion_loss.py:11-56``)."""
        gamma = self.gamma[timesteps]
        sigma = self.sigma[timesteps]
        batch = all_samples["noisy_latents"]

        # all_mask with prob (1-λ), deletion with prob λ (reference :18-19).
        all_mask = jax.random.uniform(key, (batch.shape[0],)) > lambd
        mix = jnp.where(_bcast(all_mask, batch), batch, deletion_samples["noisy_latents"])

        preds = eps_fn(mix, timesteps, conditioning)

        g = _bcast(gamma, mix)
        s = _bcast(sigma, mix)
        resid_x = mix - g * all_samples["og_latents"]
        resid_a = mix - g * deletion_samples["og_latents"]
        epsilon_x = resid_x / s
        epsilon_a = resid_a / s

        loss_x = (preds - epsilon_x) ** 2
        loss_a = (preds - epsilon_a) ** 2

        # Squared distances in float32: exp() of their difference must not
        # round; sums are over all non-batch dims (reference :32-39).
        axes = tuple(range(1, mix.ndim))
        f32 = jnp.float32
        dist_x = jnp.sum(resid_x.astype(f32) ** 2, axis=axes) / (2.0 * sigma.astype(f32) ** 2)
        dist_a = jnp.sum(resid_a.astype(f32) ** 2, axis=axes) / (2.0 * sigma.astype(f32) ** 2)

        # iw_x = 1/((1-λ) + λ e^{dx-da}); iw_a = 1/((1-λ) e^{da-dx} + λ)
        # (reference :41-45) — evaluated as exp(-logsumexp(...)), which is
        # the same function without intermediate overflow.
        d = dist_x - dist_a
        log_l = jnp.log(jnp.asarray(lambd, f32))
        log_1ml = jnp.log1p(-jnp.asarray(lambd, f32))
        iw_x = jnp.exp(-jnp.logaddexp(log_1ml, log_l + d))
        iw_a = jnp.exp(-jnp.logaddexp(log_1ml - d, log_l))

        weighted_loss_x = _bcast(iw_x, loss_x).astype(loss_x.dtype) * loss_x
        weighted_loss_a = _bcast(iw_a, loss_a).astype(loss_a.dtype) * loss_a
        return DeletionLossOutputs(None, loss_x, loss_a, iw_x, iw_a, weighted_loss_x, weighted_loss_a)

    # ---------------------------------------------------------- SISS no-IS
    def double_forward_with_neg_del(
        self, eps_fn, key, timesteps, noise, conditioning, all_samples, deletion_samples
    ) -> DeletionLossOutputs:
        """Two forwards, plain MSE vs the shared noise (``:60-67``)."""
        preds_x = eps_fn(all_samples["noisy_latents"], timesteps, conditioning)
        loss_x = (preds_x - noise) ** 2
        preds_a = eps_fn(deletion_samples["noisy_latents"], timesteps, conditioning)
        loss_a = (preds_a - noise) ** 2
        return DeletionLossOutputs(None, loss_x, loss_a, None, None, loss_x, loss_a)

    # ------------------------------------------------------------ EraseDiff
    def erasediff(
        self, eps_fn, key, timesteps, noise, conditioning, all_samples, deletion_samples
    ) -> DeletionLossOutputs:
        """Keep-term MSE vs ε; forget-term MSE vs *uniform* noise (``:70-78``)."""
        preds_x = eps_fn(all_samples["noisy_latents"], timesteps, conditioning)
        loss_x = (preds_x - noise) ** 2
        preds_a = eps_fn(deletion_samples["noisy_latents"], timesteps, conditioning)
        uniform = jax.random.uniform(key, preds_a.shape, dtype=preds_a.dtype)
        loss_a = (preds_a - uniform) ** 2
        return DeletionLossOutputs(None, loss_x, loss_a, None, None, loss_x, loss_a)

    # -------------------------------------------------------------- NegGrad
    def simple_neg_del(
        self, eps_fn, key, timesteps, noise, conditioning, all_samples, deletion_samples,
        *, superfactor: float,
    ) -> DeletionLossOutputs:
        """Scalar path: loss = −superfactor·MSE on the forget batch (``:82-88``)."""
        preds_a = eps_fn(deletion_samples["noisy_latents"], timesteps, conditioning)
        loss_a = (preds_a - noise) ** 2
        loss = -superfactor * loss_a
        return DeletionLossOutputs(loss, None, loss_a, None, None, None, None)

    # ---------------------------------------------------------------- naive
    def naive_del(
        self, eps_fn, key, timesteps, noise, conditioning, all_samples, deletion_samples
    ) -> DeletionLossOutputs:
        """Scalar path: plain fine-tuning on the keep set (``:91-96``)."""
        preds_x = eps_fn(all_samples["noisy_latents"], timesteps, conditioning)
        loss_x = (preds_x - noise) ** 2
        return DeletionLossOutputs(loss_x, loss_x, None, None, None, None, None)

    # -------------------------------------------------- subscore (reviewer)
    def subscore_bernoulli(
        self, eps_fn, key, timesteps, noise, conditioning, all_samples, deletion_samples,
        *, lambd: float,
    ) -> DeletionLossOutputs:
        """Bernoulli mixture without IS weights (``:99-122``). The keep term
        is scaled by 1/(1-λ); masked-out samples contribute exact zeros
        (static-shape equivalent of the reference's boolean indexing)."""
        batch = all_samples["noisy_latents"]
        all_mask = jax.random.uniform(key, (batch.shape[0],)) > lambd
        mix = jnp.where(_bcast(all_mask, batch), batch, deletion_samples["noisy_latents"])
        preds = eps_fn(mix, timesteps, conditioning)
        loss = (preds - noise) ** 2
        mask_x = _bcast(all_mask, loss).astype(loss.dtype)
        loss_x = (1.0 / (1.0 - lambd)) * loss * mask_x
        loss_a = loss * (1.0 - mask_x)
        return DeletionLossOutputs(None, loss_x, loss_a, None, None, loss_x, loss_a)


#: loss_fn name → uses one shared forward for both terms (needs a single
#: vjp with two pulls — the reference's ``retain_graph`` condition,
#: ``delete_celeb.py:690``).
SHARED_FORWARD_LOSSES = frozenset({"importance_sampling_with_mixture", "subscore_bernoulli"})

#: loss_fn name → scalar path (single backward, no surgery).
SCALAR_PATH_LOSSES = frozenset({"simple_neg_del", "naive_del"})

LOSS_FUNCTIONS = (
    "importance_sampling_with_mixture",
    "double_forward_with_neg_del",
    "erasediff",
    "simple_neg_del",
    "naive_del",
    "subscore_bernoulli",
)
