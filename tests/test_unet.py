import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siss_tpu.models.unet2d import UNet2D, UNet2DConfig


def _param_count(params):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))


@pytest.mark.slow
def test_mnist_unet_shapes():
    cfg = UNet2DConfig.mnist_tshirt()
    model = UNet2D(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 28, 28, 1))
    t = jnp.array([0, 999])
    out = model.apply({"params": params}, x, t)
    assert out.shape == (2, 28, 28, 1)
    assert out.dtype == jnp.float32


def test_mnist_unet_jit_and_determinism():
    cfg = UNet2DConfig.mnist_tshirt()
    model = UNet2D(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    f = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 1))
    t = jnp.array([10, 20])
    o1, o2 = f(params, x, t), f(params, x, t)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert np.abs(np.asarray(o1)).mean() > 0  # non-degenerate


def test_timestep_sensitivity():
    cfg = UNet2DConfig.mnist_tshirt()
    model = UNet2D(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 28, 28, 1))
    o0 = model.apply({"params": params}, x, jnp.array([0]))
    o999 = model.apply({"params": params}, x, jnp.array([999]))
    assert np.abs(np.asarray(o0) - np.asarray(o999)).max() > 1e-4


@pytest.mark.slow
def test_celeb_unet_param_count():
    """google/ddpm-celebahq-256 has 113.67M params; architecture parity check
    on a spatially-shrunk clone (param count is resolution-independent)."""
    cfg = UNet2DConfig.celebahq_256()
    cfg = UNet2DConfig(**{**cfg.__dict__, "sample_size": 32})
    model = UNet2D(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    n = _param_count(params)
    assert abs(n - 113_673_219) < 200_000, f"got {n:,}"


@pytest.mark.slow
def test_bf16_activation_dtype():
    cfg = UNet2DConfig.mnist_tshirt()
    model = UNet2D(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 28, 28, 1), jnp.bfloat16)
    out = model.apply({"params": params}, x, jnp.array([5]))
    assert out.shape == (1, 28, 28, 1)
    assert out.dtype == jnp.float32  # output is upcast for the loss
