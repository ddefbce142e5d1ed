"""Continuous-time SDEs for the probability-flow-ODE likelihood path.

Re-design of the subset of Song et al.'s ``sde_lib`` the reference vendors
(``metrics/song_likelihood/sde_lib.py``): VP-SDE (used by the NLL metric),
sub-VP and VE for surface completeness. Pure-function style: each SDE is a
frozen dataclass whose methods are jit/vmap/jvp-safe, so the reverse
probability-flow ODE can be integrated fully on-device (the reference
round-trips host↔device through scipy on every RHS evaluation,
``song_likelihood/likelihood.py:91-99``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VPSDE:
    """Variance-preserving SDE; continuous limit of DDPM.

    dx = -½β(t)x dt + √β(t) dW,  β(t) = β₀ + t(β₁-β₀).
    Defaults mirror ``sde_lib.py:112-164`` (β 0.1→20, N=1000).
    """

    beta_0: float = dataclasses.field(default=0.1, metadata=dict(static=True))
    beta_1: float = dataclasses.field(default=20.0, metadata=dict(static=True))
    N: int = dataclasses.field(default=1000, metadata=dict(static=True))

    @property
    def T(self) -> float:
        return 1.0

    def _beta(self, t):
        return self.beta_0 + t * (self.beta_1 - self.beta_0)

    def sde(self, x, t):
        beta_t = self._beta(t)
        drift = -0.5 * beta_t * x
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def marginal_prob(self, x, t):
        log_mean_coeff = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        mean = jnp.exp(log_mean_coeff) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        return mean, std

    def marginal_std(self, t):
        log_mean_coeff = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        return jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))

    def prior_logp(self, z):
        """log N(z; 0, I), summed over non-batch dims."""
        shape = z.shape
        n = np.prod(shape[1:])
        return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(z.reshape(shape[0], -1) ** 2, axis=-1) / 2.0

    def probability_flow_drift(self, x, t, score):
        """Reverse probability-flow ODE drift: f(x,t) − ½ g(t)² ∇log p_t(x).

        Equivalent of ``sde_lib.py:84-109`` with ``probability_flow=True``.
        """
        drift, diffusion = self.sde(x, t)
        return drift - 0.5 * diffusion**2 * score


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SubVPSDE:
    """Sub-VP SDE (``sde_lib.py:167-204``)."""

    beta_0: float = dataclasses.field(default=0.1, metadata=dict(static=True))
    beta_1: float = dataclasses.field(default=20.0, metadata=dict(static=True))
    N: int = dataclasses.field(default=1000, metadata=dict(static=True))

    @property
    def T(self) -> float:
        return 1.0

    def sde(self, x, t):
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = -0.5 * beta_t * x
        discount = 1.0 - jnp.exp(-2.0 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t**2)
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def marginal_prob(self, x, t):
        log_mean_coeff = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        mean = jnp.exp(log_mean_coeff) * x
        std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
        return mean, std

    def marginal_std(self, t):
        log_mean_coeff = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        return 1.0 - jnp.exp(2.0 * log_mean_coeff)

    def prior_logp(self, z):
        shape = z.shape
        n = np.prod(shape[1:])
        return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(z.reshape(shape[0], -1) ** 2, axis=-1) / 2.0

    def probability_flow_drift(self, x, t, score):
        drift, diffusion = self.sde(x, t)
        return drift - 0.5 * diffusion**2 * score


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VESDE:
    """Variance-exploding SDE (``sde_lib.py:207-254``)."""

    sigma_min: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    sigma_max: float = dataclasses.field(default=50.0, metadata=dict(static=True))
    N: int = dataclasses.field(default=1000, metadata=dict(static=True))

    @property
    def T(self) -> float:
        return 1.0

    def sde(self, x, t):
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        drift = jnp.zeros_like(x)
        diffusion = sigma * jnp.sqrt(2.0 * (jnp.log(self.sigma_max) - jnp.log(self.sigma_min)))
        return drift, diffusion

    def marginal_prob(self, x, t):
        std = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        return x, std

    def marginal_std(self, t):
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    def prior_logp(self, z):
        shape = z.shape
        n = np.prod(shape[1:])
        return (
            -n / 2.0 * jnp.log(2 * jnp.pi * self.sigma_max**2)
            - jnp.sum(z.reshape(shape[0], -1) ** 2, axis=-1) / (2 * self.sigma_max**2)
        )

    def probability_flow_drift(self, x, t, score):
        drift, diffusion = self.sde(x, t)
        return drift - 0.5 * diffusion**2 * score
