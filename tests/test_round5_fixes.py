"""Round-5 regression tests (VERDICT r4 / ADVICE r4 items)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_adafactor_weight_decay_is_lr_scaled():
    """ADVICE r4 (medium): optax.adafactor applies `weight_decay_rate`
    AFTER lr scaling as an absolute per-step fraction — at the reference's
    lr=1e-5 / wd=1e-2 that decays params 1%/step, ~1e5x the AdamW decay the
    target substitutes for. The builder must compose AdamW (lr-scaled)
    semantics: update = -lr * (direction + wd * param)."""
    from siss_tpu.config import Config
    from siss_tpu.train.optim import build_optimizer

    lr, wd = 1e-5, 1e-2
    tx = build_optimizer(Config({"_target_": "adafactor", "lr": lr,
                                 "weight_decay": wd}))
    p = {"w": jnp.full((256, 256), 2.0, jnp.float32)}
    g = {"w": jnp.ones((256, 256), jnp.float32)}
    state = tx.init(p)
    up, state = tx.update(g, state, p)
    # factored RMS of an all-ones gradient is 1 → unit direction (inside the
    # clip threshold), so the update is exactly -lr*(1 + wd*2.0)
    got = float(np.asarray(up["w"])[0, 0])
    expected = -lr * (1.0 + wd * 2.0)
    assert abs(got - expected) < 1e-9, (got, expected)
    # the old (absolute) semantics would have produced ~ -lr - wd*2.0 ≈ -0.02:
    assert abs(got) < 1e-3


def test_adafactor_zero_decay_matches_optax_reference():
    """With weight_decay=0 the hand-composed chain must reproduce stock
    optax.adafactor (momentum off, no param scale) exactly."""
    import optax

    from siss_tpu.config import Config
    from siss_tpu.train.optim import build_optimizer

    lr = 3e-4
    ours = build_optimizer(Config({"_target_": "adafactor", "lr": lr}))
    ref = optax.adafactor(lr, multiply_by_parameter_scale=False)
    key = jax.random.PRNGKey(0)
    p = {"w": jax.random.normal(key, (64, 48)),
         "b": jax.random.normal(jax.random.PRNGKey(1), (48,))}
    g = jax.tree.map(lambda x: x * 0.37 + 0.01, p)
    s_ours, s_ref = ours.init(p), ref.init(p)
    for _ in range(3):
        u_ours, s_ours = ours.update(g, s_ours, p)
        u_ref, s_ref = ref.update(g, s_ref, p)
        for a, b in zip(jax.tree.leaves(u_ours), jax.tree.leaves(u_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8)


def test_attention_impl_typo_raises():
    """A typo'd attention impl must fail at trace time instead of silently
    falling through to the plain-einsum branch (round-5 review)."""
    import pytest

    from siss_tpu.models.unet2d_cond import CrossAttention

    m = CrossAttention(64, 2, 32, impl="einsum_rematt")
    x = jnp.zeros((1, 16, 64))
    with pytest.raises(ValueError, match="attention impl"):
        m.init(jax.random.PRNGKey(0), x)
