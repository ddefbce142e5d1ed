"""Pallas SISS-epilogue kernel parity tests (interpret mode on CPU;
compiled path exercised on real TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siss_tpu.ops import siss_weighted_sums, siss_weighted_sums_reference


@pytest.fixture
def inputs():
    rng = np.random.default_rng(0)
    B, H, W, C = 4, 10, 10, 3
    tensors = [jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32) for _ in range(4)]
    gamma = jnp.asarray(rng.uniform(0.1, 0.9, B), jnp.float32)
    sigma = jnp.sqrt(1 - gamma**2)
    return tensors, gamma, sigma


def test_forward_parity(inputs):
    tensors, gamma, sigma = inputs
    wlx_p, wla_p, aux_p = siss_weighted_sums(*tensors, gamma, sigma, 0.5)
    wlx_r, wla_r, aux_r = siss_weighted_sums_reference(*tensors, gamma, sigma, 0.5)
    np.testing.assert_allclose(float(wlx_p), float(wlx_r), rtol=1e-5)
    np.testing.assert_allclose(float(wla_p), float(wla_r), rtol=1e-5)
    # iw involve exp() of large distance sums → reduction-order sensitive
    np.testing.assert_allclose(np.asarray(aux_p["iw_x"]), np.asarray(aux_r["iw_x"]), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(aux_p["lx_mean"]), np.asarray(aux_r["lx_mean"]), rtol=1e-4)


def test_gradient_parity_both_cotangents(inputs):
    """The custom VJP must match autodiff through the reference impl for
    both pullback directions (the two 'retain_graph' backwards)."""
    tensors, gamma, sigma = inputs
    preds, rest = tensors[0], tensors[1:]
    for which in (0, 1):
        gp = jax.grad(lambda p: siss_weighted_sums(p, *rest, gamma, sigma, 0.5)[which])(preds)
        gr = jax.grad(lambda p: siss_weighted_sums_reference(p, *rest, gamma, sigma, 0.5)[which])(preds)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=1e-3, atol=1e-6)


def test_non_tile_aligned_shapes(inputs):
    """Padding path: MNIST-sized 28×28×1 (784 px ≪ tile)."""
    rng = np.random.default_rng(1)
    B = 3
    tensors = [jnp.asarray(rng.normal(size=(B, 28, 28, 1)), jnp.float32) for _ in range(4)]
    gamma = jnp.asarray(rng.uniform(0.3, 0.7, B), jnp.float32)
    sigma = jnp.sqrt(1 - gamma**2)
    wlx_p, wla_p, aux_p = siss_weighted_sums(*tensors, gamma, sigma, 0.5)
    wlx_r, wla_r, aux_r = siss_weighted_sums_reference(*tensors, gamma, sigma, 0.5)
    np.testing.assert_allclose(float(wlx_p), float(wlx_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_p["iw_a"]), np.asarray(aux_r["iw_a"]), rtol=1e-3)


def test_bf16_inputs(inputs):
    tensors, gamma, sigma = inputs
    bf = [t.astype(jnp.bfloat16) for t in tensors]
    wlx_p, _, _ = siss_weighted_sums(*bf, gamma, sigma, 0.5)
    wlx_r, _, _ = siss_weighted_sums_reference(*bf, gamma, sigma, 0.5)
    np.testing.assert_allclose(float(wlx_p), float(wlx_r), rtol=1e-2)
