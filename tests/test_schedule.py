import jax
import jax.numpy as jnp
import numpy as np

from siss_tpu.diffusion import NoiseSchedule, VPSDE, make_beta_schedule, spaced_timesteps
from siss_tpu.diffusion import schedule as S


def test_linear_betas_match_formula():
    betas = make_beta_schedule("linear", 1000, 1e-4, 0.02)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-6)
    # strictly increasing
    assert np.all(np.diff(betas) > 0)


def test_alphas_cumprod_tables():
    sched = NoiseSchedule.create(1000, "linear")
    ac = np.asarray(sched.alphas_cumprod)
    manual = np.cumprod(1.0 - np.asarray(sched.betas, np.float64))
    np.testing.assert_allclose(ac, manual, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.gamma) ** 2 + np.asarray(sched.sigma) ** 2, 1.0, atol=1e-6)


def test_q_sample_formula():
    sched = NoiseSchedule.create(1000, "linear")
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 10, 500, 999])
    xt = S.q_sample(sched, x0, noise, t)
    expected = np.asarray(sched.gamma)[np.asarray(t)][:, None, None, None] * np.asarray(x0) + \
        np.asarray(sched.sigma)[np.asarray(t)][:, None, None, None] * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(xt), expected, rtol=1e-5, atol=1e-6)


def test_pred_x0_roundtrip():
    sched = NoiseSchedule.create(1000, "linear")
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([100, 700])
    xt = S.q_sample(sched, x0, noise, t)
    rec = S.pred_x0_from_eps(sched, xt, noise, t)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_spaced_timesteps_matches_diffusers_spacing():
    ts = spaced_timesteps(1000, 50)
    assert ts.shape == (50,)
    assert ts[0] == 980 and ts[-1] == 0
    assert np.all(np.diff(ts) == -20)


def test_ddpm_step_perfect_model_reduces_noise():
    """With the true epsilon, iterated ddpm_step from moderate t recovers x0."""
    sched = NoiseSchedule.create(1000, "linear", clip_sample=False)
    x0 = 0.5 * jnp.ones((1, 4, 4, 1))
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, x0.shape)
    t0 = 200
    xt = S.q_sample(sched, x0, noise, jnp.array([t0]))

    def body(carry, t):
        x, k = carry
        k, sub = jax.random.split(k)
        eps = (x - sched.gamma[t] * x0) / sched.sigma[t]  # oracle epsilon
        x = S.ddpm_step(sched, x, eps, t, t - 1, sub)
        return (x, k), None

    ts = jnp.arange(t0, -1, -1)
    (xfinal, _), _ = jax.lax.scan(body, (xt, key), ts)
    assert np.abs(np.asarray(xfinal) - 0.5).mean() < 0.15


def test_ddim_step_deterministic_inversion():
    """DDIM with oracle eps and eta=0 recovers x0 exactly along the grid."""
    sched = NoiseSchedule.create(1000, "linear", clip_sample=False)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 1))
    noise = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    ts = spaced_timesteps(1000, 50)
    x = S.q_sample(sched, x0, noise, jnp.full((2,), int(ts[0])))
    for i, t in enumerate(ts):
        prev_t = ts[i + 1] if i + 1 < len(ts) else -1
        eps = (x - sched.gamma[t] * x0) / sched.sigma[t]
        x = S.ddim_step(sched, x, eps, jnp.asarray(t), jnp.asarray(prev_t))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_vpsde_matches_discrete_ddpm():
    """VPSDE(0.1, 20) marginal std at t=(k+1)/N ≈ discrete DDPM sigma table."""
    sched = NoiseSchedule.create(1000, "linear", 0.0001, 0.02)
    sde = VPSDE()
    ks = np.array([99, 499, 999])
    t_cont = (ks + 1) / 1000.0
    std = np.asarray(sde.marginal_std(jnp.asarray(t_cont)))
    np.testing.assert_allclose(std, np.asarray(sched.sigma)[ks], rtol=2e-2)


def test_vpsde_prior_logp():
    sde = VPSDE()
    z = jnp.zeros((2, 4, 4, 1))
    lp = np.asarray(sde.prior_logp(z))
    expected = -16 / 2 * np.log(2 * np.pi)
    np.testing.assert_allclose(lp, expected, rtol=1e-4)
