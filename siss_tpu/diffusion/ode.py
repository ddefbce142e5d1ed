"""On-device adaptive ODE integration (Dormand–Prince RK45).

Replaces the reference's scipy ``solve_ivp`` loop
(``metrics/song_likelihood/likelihood.py:91-99``), which crosses the
host↔device boundary on *every* RHS evaluation — the single worst
ping-pong in the reference (SURVEY.md §3.4). Here the entire adaptive
integration runs inside one ``lax.while_loop``: same Dormand–Prince 4(5)
tableau and PI-free step controller family as scipy's RK45, pytree state,
bounded step count for static compilation.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

# Dormand–Prince 4(5) Butcher tableau (same as scipy RK45).
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = jnp.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40])


def _tree_axpy(a, x, y):
    return jax.tree.map(lambda xi, yi: a * xi + yi, x, y)


def _tree_scale(a, x):
    return jax.tree.map(lambda xi: a * xi, x)


def _tree_add(x, y):
    return jax.tree.map(lambda a, b: a + b, x, y)


def _error_norm(err, y0, y1, rtol, atol):
    """RMS norm of err / (atol + rtol·max(|y0|,|y1|)), scipy-style."""
    total = jnp.zeros(())
    n = 0
    for e, a, b in zip(jax.tree_util.tree_leaves(err),
                       jax.tree_util.tree_leaves(y0),
                       jax.tree_util.tree_leaves(y1)):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        total = total + jnp.sum((e / scale) ** 2)
        n += e.size
    return jnp.sqrt(total / n)


def odeint_rk45(
    f: Callable[[Any, jax.Array], Any],
    y0: Any,
    t0: float,
    t1: float,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 1000,
    first_step: float = 1e-3,
) -> Tuple[Any, jax.Array]:
    """Integrate dy/dt = f(y, t) from t0 to t1 (t1 > t0).

    Returns (y(t1), nfe). All state is a pytree; runs fully on-device.
    """
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)

    def rk_step(y, t, h):
        ks = []
        for i in range(7):
            yi = y
            for j, aij in enumerate(_A[i]):
                yi = _tree_axpy(h * aij, ks[j], yi)
            ks.append(f(yi, t + h * _C[i]))
        y5 = y
        y4 = y
        for i in range(7):
            y5 = _tree_axpy(h * _B5[i], ks[i], y5)
            y4 = _tree_axpy(h * _B4[i], ks[i], y4)
        err = jax.tree.map(lambda a, b: a - b, y5, y4)
        return y5, err

    def cond(state):
        t, y, h, nfe, steps = state
        return (t < t1) & (steps < max_steps)

    def body(state):
        t, y, h, nfe, steps = state
        h = jnp.minimum(h, t1 - t)
        y_new, err = rk_step(y, t, h)
        enorm = _error_norm(err, y, y_new, rtol, atol)
        accept = enorm <= 1.0
        # standard step-size controller, order 5
        factor = jnp.clip(0.9 * (enorm + 1e-10) ** (-0.2), 0.2, 10.0)
        h_next = jnp.clip(h * factor, 1e-6, t1 - t0)
        t = jnp.where(accept, t + h, t)
        y = jax.tree.map(lambda a, b: jnp.where(accept, b, a), y, y_new)
        return (t, y, h_next, nfe + 6, steps + 1)

    state = (t0, y0, jnp.asarray(first_step, jnp.float32), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    t, y, h, nfe, steps = jax.lax.while_loop(cond, body, state)
    return y, nfe


def odeint_rk4(f: Callable, y0: Any, t0: float, t1: float, num_steps: int = 200) -> Any:
    """Fixed-grid classic RK4 via lax.scan — cheap deterministic-cost
    alternative for TPU when adaptivity isn't needed."""
    h = (t1 - t0) / num_steps
    ts = t0 + h * jnp.arange(num_steps)

    def body(y, t):
        k1 = f(y, t)
        k2 = f(_tree_axpy(h / 2, k1, y), t + h / 2)
        k3 = f(_tree_axpy(h / 2, k2, y), t + h / 2)
        k4 = f(_tree_axpy(h, k3, y), t + h)
        incr = jax.tree.map(lambda a, b, c, d: (a + 2 * b + 2 * c + d) / 6, k1, k2, k3, k4)
        return _tree_axpy(h, incr, y), None

    y, _ = jax.lax.scan(body, y0, ts)
    return y
