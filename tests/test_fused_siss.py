"""Fused-Pallas SISS step must match the reference jnp step bit-for-bit in
semantics (same RNG stream, same stats keys, near-identical numerics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step


def linear_apply(params, x, t, cond):
    return params["w"] * x + params["b"]


def test_fused_matches_unfused():
    sched = NoiseSchedule.create(100, "linear")
    params = {"w": jnp.asarray(0.5), "b": jnp.asarray(0.1)}
    tx = optax.sgd(1.0)
    rng = np.random.default_rng(3)
    batch = {
        "all": jnp.asarray(rng.normal(size=(2, 4, 8, 8, 1)), jnp.float32),
        "deletion": jnp.asarray(rng.normal(size=(2, 4, 8, 8, 1)), jnp.float32),
    }
    base = dict(loss_fn="importance_sampling_with_mixture", loss_params=(("lambd", 0.5),),
                scaling_norm=5.0, grad_accum_steps=2, t_min=0, t_max=100)
    outs = {}
    for fused in (True, False):
        cfg = DeletionStepConfig(**base, fused_siss=fused)
        step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
        state = TrainState.create(params, tx)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0), {})
        outs[fused] = (new_state, metrics)

    m_f, m_u = outs[True][1], outs[False][1]
    assert set(m_f) == set(m_u)
    for k in m_u:
        np.testing.assert_allclose(float(m_f[k]), float(m_u[k]), rtol=2e-3, atol=1e-6,
                                   err_msg=k)
    np.testing.assert_allclose(float(outs[True][0].params["w"]),
                               float(outs[False][0].params["w"]), rtol=1e-4)
    np.testing.assert_allclose(float(outs[True][0].params["b"]),
                               float(outs[False][0].params["b"]), rtol=1e-4)
