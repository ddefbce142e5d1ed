"""NLL via probability-flow ODE: validated on an analytic Gaussian model
where the exact log-likelihood is known in closed form."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siss_tpu.diffusion import NoiseSchedule, VPSDE
from siss_tpu.diffusion.ode import odeint_rk4, odeint_rk45
from siss_tpu.metrics.likelihood import LikelihoodEvaluator


def test_rk45_exponential_decay():
    f = lambda y, t: jax.tree.map(lambda x: -x, y)
    y0 = (jnp.ones((4,)), jnp.full((2,), 2.0))
    (ya, yb), nfe = odeint_rk45(f, y0, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(ya), np.exp(-1.0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(yb), 2 * np.exp(-1.0), rtol=1e-4)
    assert int(nfe) > 0


def test_rk4_matches_rk45():
    f = lambda y, t: jax.tree.map(lambda x: jnp.sin(t) * x, y)
    y0 = (jnp.ones((3,)),)
    y45, _ = odeint_rk45(f, y0, 0.0, 1.0)
    y4 = odeint_rk4(f, y0, 0.0, 1.0, num_steps=100)
    np.testing.assert_allclose(np.asarray(y45[0]), np.asarray(y4[0]), rtol=1e-4)


@pytest.mark.parametrize("method", ["rk45", "rk4"])
def test_gaussian_nll_matches_closed_form(method):
    """With the oracle eps for x0 ~ N(0, std²), the PF-ODE NLL must match
    the analytic value bpd = [-log N(x; 0, std²)]/(ln2·D) + 7 up to the
    reference's intrinsic discrete-score-table staircase bias (~4%: the
    score conversion uses σ[⌊t·999⌋] tables exactly as
    ``song_likelihood/utils.py:150-156`` — a deliberate parity choice)."""
    std = 0.5
    sde = VPSDE()
    sched = NoiseSchedule.create(1000, "linear", 0.1 / 1000, 20.0 / 1000)

    def eps_apply(params, x, t, cond):
        g = sched.gamma[t].reshape(-1, 1, 1, 1)
        s = sched.sigma[t].reshape(-1, 1, 1, 1)
        var = g**2 * std**2 + s**2
        return x * s / var  # oracle for mu=0

    ev = LikelihoodEvaluator(eps_apply, sde, schedule=sched, method=method,
                             hutchinson_type="Gaussian", rk4_steps=200)
    B, H, W, C = 2, 4, 4, 1
    data = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C)) * std
    bpd, z, nfe = ev.evaluate_likelihood({}, data, key=jax.random.PRNGKey(1))

    d = np.asarray(data).reshape(B, -1)
    D = d.shape[1]
    logp = -0.5 * (D * np.log(2 * np.pi * std**2) + (d**2).sum(-1) / std**2)
    expected_bpd = -logp / np.log(2) / D + 7.0
    np.testing.assert_allclose(np.asarray(bpd), expected_bpd, rtol=0.05)


@pytest.mark.slow
def test_rk45_and_rk4_integrators_agree_on_nll():
    """Same RHS, two integrators → bpd must agree tightly (isolates
    integrator correctness from score-discretization semantics)."""
    std = 0.5
    sde = VPSDE()
    sched = NoiseSchedule.create(1000, "linear", 0.1 / 1000, 20.0 / 1000)

    def eps_apply(params, x, t, cond):
        g = sched.gamma[t].reshape(-1, 1, 1, 1)
        s = sched.sigma[t].reshape(-1, 1, 1, 1)
        return x * s / (g**2 * std**2 + s**2)

    data = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1)) * std
    out = {}
    for method in ["rk45", "rk4"]:
        ev = LikelihoodEvaluator(eps_apply, sde, schedule=sched, method=method,
                                 hutchinson_type="Gaussian", rk4_steps=300)
        bpd, _, _ = ev.evaluate_likelihood({}, data, key=jax.random.PRNGKey(1))
        out[method] = np.asarray(bpd)
    np.testing.assert_allclose(out["rk45"], out["rk4"], rtol=2e-3)


def test_hutchinson_types_agree_in_expectation():
    std = 0.7
    sde = VPSDE()
    sched = NoiseSchedule.create(1000, "linear", 0.1 / 1000, 20.0 / 1000)

    def eps_apply(params, x, t, cond):
        g = sched.gamma[t].reshape(-1, 1, 1, 1)
        s = sched.sigma[t].reshape(-1, 1, 1, 1)
        return x * s / (g**2 * std**2 + s**2)

    data = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1)) * std
    vals = {}
    for ht in ["Rademacher", "Gaussian"]:
        ev = LikelihoodEvaluator(eps_apply, sde, schedule=sched, method="rk4",
                                 hutchinson_type=ht, rk4_steps=120)
        bpds = [float(ev.evaluate_likelihood({}, data, key=jax.random.PRNGKey(i))[0][0])
                for i in range(4)]
        vals[ht] = np.mean(bpds)
    # linear-in-x drift ⇒ both estimators are exact; tight agreement
    np.testing.assert_allclose(vals["Rademacher"], vals["Gaussian"], rtol=5e-3)
