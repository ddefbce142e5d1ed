"""Training state pytree."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from siss_tpu.train.ema import EMAState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    """Everything the jitted step mutates, as one pytree.

    The optimizer transform itself is static (closed over by the step);
    only its state lives here.
    """

    params: Any
    opt_state: Any
    step: jax.Array                      # int32 scalar
    ema: Optional[EMAState] = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, use_ema: bool = False) -> "TrainState":
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            ema=EMAState.create(params) if use_ema else None,
        )
