"""Golden tests for the deletion loss family.

Expected values are computed with straight numpy from the published SISS
formulas (reference ``losses/ddpm_deletion_loss.py``), using a linear
"unet" so everything is analytic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.losses import DeletionLoss, LOSS_FUNCTIONS


B, H, W, C = 4, 6, 6, 1


@pytest.fixture
def setup():
    sched = NoiseSchedule.create(1000, "linear")
    loss = DeletionLoss(gamma=sched.gamma, sigma=sched.sigma)
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=()), jnp.float32)

    def eps_fn(x, t, cond):
        return 0.3 * x + 0.1  # linear toy model

    all_s = {
        "og_latents": jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32),
        "noisy_latents": jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32),
    }
    del_s = {
        "og_latents": jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32),
        "noisy_latents": jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32),
    }
    noise = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    t = jnp.asarray([10, 250, 700, 999], jnp.int32)
    return sched, loss, eps_fn, all_s, del_s, noise, t


def _np_siss_golden(sched, all_s, del_s, t, mask, lambd, eps_fn):
    gamma = np.asarray(sched.gamma)[np.asarray(t)][:, None, None, None]
    sigma = np.asarray(sched.sigma)[np.asarray(t)][:, None, None, None]
    mix = np.where(mask[:, None, None, None], np.asarray(all_s["noisy_latents"]), np.asarray(del_s["noisy_latents"]))
    preds = 0.3 * mix + 0.1
    eps_x = (mix - gamma * np.asarray(all_s["og_latents"])) / sigma
    eps_a = (mix - gamma * np.asarray(del_s["og_latents"])) / sigma
    loss_x = (preds - eps_x) ** 2
    loss_a = (preds - eps_a) ** 2
    dist_x = ((mix - gamma * np.asarray(all_s["og_latents"])) ** 2).sum(axis=(1, 2, 3)) / (2 * sigma[:, 0, 0, 0] ** 2)
    dist_a = ((mix - gamma * np.asarray(del_s["og_latents"])) ** 2).sum(axis=(1, 2, 3)) / (2 * sigma[:, 0, 0, 0] ** 2)
    # direct (reference) formulas, float64; exp may overflow to inf which
    # correctly drives the weight to 0
    with np.errstate(over="ignore"):
        iw_x = 1.0 / ((1 - lambd) + lambd * np.exp(np.float64(dist_x - dist_a)))
        iw_a = 1.0 / ((1 - lambd) * np.exp(np.float64(dist_a - dist_x)) + lambd)
    return loss_x, loss_a, iw_x, iw_a


def test_siss_matches_reference_formulas(setup):
    sched, loss, eps_fn, all_s, del_s, noise, t = setup
    key = jax.random.PRNGKey(0)
    out = loss.importance_sampling_with_mixture(
        eps_fn, key, t, noise, None, all_s, del_s, lambd=0.5
    )
    assert out.loss is None
    # Recover the mask the jax impl drew, then check everything analytically.
    mask = np.asarray(jax.random.uniform(key, (B,)) > 0.5)
    loss_x, loss_a, iw_x, iw_a = _np_siss_golden(sched, all_s, del_s, t, mask, 0.5, eps_fn)
    np.testing.assert_allclose(np.asarray(out.loss_x), loss_x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.loss_a), loss_a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.importance_weight_x), iw_x, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.importance_weight_a), iw_a, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.weighted_loss_x), iw_x[:, None, None, None] * loss_x, rtol=1e-3, atol=1e-5
    )


def test_siss_iw_stable_at_extreme_distances(setup):
    """The stable rearrangement must not produce nan/inf where the naive
    float32 formula overflows (dist differences of ±1e6)."""
    sched, loss, eps_fn, all_s, del_s, noise, t = setup
    big = {k: v * 100.0 for k, v in del_s.items()}
    out = loss.importance_sampling_with_mixture(
        eps_fn, jax.random.PRNGKey(1), t, noise, None, all_s, big, lambd=0.5
    )
    assert np.all(np.isfinite(np.asarray(out.importance_weight_x)))
    assert np.all(np.isfinite(np.asarray(out.importance_weight_a)))
    # weights live in [0, 1/min(λ,1-λ)]
    assert np.all(np.asarray(out.importance_weight_x) >= 0)
    assert np.all(np.asarray(out.importance_weight_x) <= 2.0 + 1e-5)


def test_iw_identity_when_sets_equal(setup):
    """If keep and forget sets coincide, dist_x == dist_a so both IS weights
    are exactly 1 for any λ."""
    sched, loss, eps_fn, all_s, del_s, noise, t = setup
    out = loss.importance_sampling_with_mixture(
        eps_fn, jax.random.PRNGKey(2), t, noise, None, all_s, all_s, lambd=0.3
    )
    np.testing.assert_allclose(np.asarray(out.importance_weight_x), 1.0, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(out.importance_weight_a), 1.0, rtol=5e-4)


def test_double_forward(setup):
    sched, loss, eps_fn, all_s, del_s, noise, t = setup
    out = loss.double_forward_with_neg_del(eps_fn, jax.random.PRNGKey(0), t, noise, None, all_s, del_s)
    expected_x = (0.3 * np.asarray(all_s["noisy_latents"]) + 0.1 - np.asarray(noise)) ** 2
    expected_a = (0.3 * np.asarray(del_s["noisy_latents"]) + 0.1 - np.asarray(noise)) ** 2
    np.testing.assert_allclose(np.asarray(out.loss_x), expected_x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.loss_a), expected_a, rtol=1e-5, atol=1e-6)
    assert out.loss is None and out.importance_weight_x is None


def test_erasediff_uniform_forget_target(setup):
    sched, loss, eps_fn, all_s, del_s, noise, t = setup
    key = jax.random.PRNGKey(5)
    out = loss.erasediff(eps_fn, key, t, noise, None, all_s, del_s)
    preds_a = 0.3 * np.asarray(del_s["noisy_latents"]) + 0.1
    uniform = np.asarray(jax.random.uniform(key, preds_a.shape))
    np.testing.assert_allclose(np.asarray(out.loss_a), (preds_a - uniform) ** 2, rtol=1e-5, atol=1e-6)


def test_neg_grad_scalar_path(setup):
    sched, loss, eps_fn, all_s, del_s, noise, t = setup
    out = loss.simple_neg_del(eps_fn, jax.random.PRNGKey(0), t, noise, None, all_s, del_s, superfactor=2.5)
    expected_a = (0.3 * np.asarray(del_s["noisy_latents"]) + 0.1 - np.asarray(noise)) ** 2
    np.testing.assert_allclose(np.asarray(out.loss), -2.5 * expected_a, rtol=1e-5, atol=1e-6)
    assert out.weighted_loss_x is None


def test_naive_del(setup):
    sched, loss, eps_fn, all_s, del_s, noise, t = setup
    out = loss.naive_del(eps_fn, jax.random.PRNGKey(0), t, noise, None, all_s, del_s)
    expected = (0.3 * np.asarray(all_s["noisy_latents"]) + 0.1 - np.asarray(noise)) ** 2
    np.testing.assert_allclose(np.asarray(out.loss), expected, rtol=1e-5, atol=1e-6)


def test_subscore_bernoulli_masking(setup):
    sched, loss, eps_fn, all_s, del_s, noise, t = setup
    key = jax.random.PRNGKey(9)
    out = loss.subscore_bernoulli(eps_fn, key, t, noise, None, all_s, del_s, lambd=0.5)
    mask = np.asarray(jax.random.uniform(key, (B,)) > 0.5)
    mix = np.where(mask[:, None, None, None], np.asarray(all_s["noisy_latents"]), np.asarray(del_s["noisy_latents"]))
    base = (0.3 * mix + 0.1 - np.asarray(noise)) ** 2
    np.testing.assert_allclose(np.asarray(out.loss_x), 2.0 * base * mask[:, None, None, None], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.loss_a), base * ~mask[:, None, None, None], rtol=1e-5, atol=1e-6)
    # keep and forget masks are exact complements: sum of unscaled terms == base
    np.testing.assert_allclose(
        np.asarray(out.loss_x) / 2.0 + np.asarray(out.loss_a), base, rtol=1e-5, atol=1e-6
    )


def test_all_loss_fns_jit_compile(setup):
    sched, loss, eps_fn, all_s, del_s, noise, t = setup
    params = {"importance_sampling_with_mixture": dict(lambd=0.5),
              "subscore_bernoulli": dict(lambd=0.5),
              "simple_neg_del": dict(superfactor=1.0)}
    for name in LOSS_FUNCTIONS:
        fn = getattr(loss, name)
        kw = params.get(name, {})
        jitted = jax.jit(lambda k: fn(eps_fn, k, t, noise, None, all_s, del_s, **kw))
        out = jitted(jax.random.PRNGKey(0))
        for field in out:
            if field is not None:
                assert np.all(np.isfinite(np.asarray(field))), name
