"""Exponential moving average of parameters.

Reproduces the decay schedule of diffusers' ``EMAModel`` the reference trains
with (``train_unconditional.py:184-194,420-421``; config knobs
``config/train_tshirt_mnist.yaml:93-97``):

    decay(step) = min(max_decay, (1 + step/inv_gamma) ** -power → 1 - that)

i.e. ``decay = 1 - (1 + step/inv_gamma)^(-power)``, clamped to
``[min_decay, max_decay]``. Pure pytree update, runs inside the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EMAState:
    params: Any
    step: jax.Array  # int32 scalar

    @classmethod
    def create(cls, params) -> "EMAState":
        return cls(params=jax.tree.map(jnp.asarray, params), step=jnp.zeros((), jnp.int32))


def ema_decay(step: jax.Array, inv_gamma: float = 1.0, power: float = 0.75,
              min_decay: float = 0.0, max_decay: float = 0.9999) -> jax.Array:
    value = 1.0 - (1.0 + step.astype(jnp.float32) / inv_gamma) ** (-power)
    return jnp.clip(value, min_decay, max_decay)


def ema_update(state: EMAState, new_params, inv_gamma: float = 1.0, power: float = 0.75,
               min_decay: float = 0.0, max_decay: float = 0.9999) -> EMAState:
    step = state.step + 1
    decay = ema_decay(step, inv_gamma, power, min_decay, max_decay)
    one_minus = 1.0 - decay
    ema_params = jax.tree.map(
        lambda e, p: e - one_minus * (e - p.astype(e.dtype)), state.params, new_params
    )
    return EMAState(params=ema_params, step=step)
