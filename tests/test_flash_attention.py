"""Flash-attention path: wiring rules everywhere, numerics on real TPU.

The Pallas flash kernel only exists for TPU, so the value/grad parity test
self-skips off-TPU (tests force the CPU platform); the TPU campaign runs
it for real (BASELINE.md records the measured throughput effect). The
wiring rules — which sites may use flash — are platform-independent and
always tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siss_tpu.models.unet2d_cond import CrossAttention


def test_flash_wiring_rules():
    """flash only on self-attention with 128-divisible seq and head_dim
    ≤ 128; cross-attention and ragged shapes always einsum."""
    att = CrossAttention(320, 8, 40, impl="flash")
    assert att._use_flash(is_self=True, n_q=4096)
    assert att._use_flash(is_self=True, n_q=128)
    assert not att._use_flash(is_self=False, n_q=4096)   # cross-attn
    assert not att._use_flash(is_self=True, n_q=77)      # ragged seq
    assert not CrossAttention(2048, 8, 160, impl="flash")._use_flash(True, 4096)
    assert not CrossAttention(320, 8, 40, impl="einsum")._use_flash(True, 4096)
    # auto: needs TPU backend + long seq + a head_dim that fills the
    # 128-lane tile (measured: 40/80 head_dims pad the kernel's matmuls
    # and run slower than einsum — BASELINE.md round-4 SD table)
    on_tpu = jax.default_backend() == "tpu"
    assert not CrossAttention(320, 8, 40, impl="auto")._use_flash(True, 4096)
    assert not CrossAttention(640, 8, 80, impl="auto")._use_flash(True, 4096)
    auto128 = CrossAttention(1024, 8, 128, impl="auto")
    assert auto128._use_flash(True, 4096) == on_tpu
    assert not auto128._use_flash(True, 128)  # below the pay-off threshold
    # explicit "flash" still honors the small head_dims
    assert CrossAttention(320, 8, 40, impl="flash")._use_flash(True, 4096)


def test_einsum_remat_matches_einsum_exactly():
    """einsum_remat is the SAME math as einsum — jax.checkpoint only changes
    what is saved for backward (bf16 q/k/v instead of the fp32 softmax
    residuals), so value and gradients must match bit-for-bit, at a
    remat-triggering self-attention length (N ≥ 1024)."""
    heads, d, N = 2, 8, 1024
    q_dim = heads * d
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, N, q_dim)), jnp.bfloat16)
    outs = {}
    for impl in ("einsum", "einsum_remat"):
        m = CrossAttention(q_dim, heads, d, dtype=jnp.bfloat16, impl=impl)
        params = m.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return (m.apply(p, x).astype(jnp.float32) ** 2).sum()

        val, grad = jax.jit(jax.value_and_grad(loss))(params)
        outs[impl] = (val, grad)
    assert outs["einsum"][0] == outs["einsum_remat"][0]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        outs["einsum"][1], outs["einsum_remat"][1])
    # wiring: einsum_remat must never route to the flash kernel
    assert not CrossAttention(320, 8, 40, impl="einsum_remat")._use_flash(True, 4096)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas flash-attention kernel is TPU-only")
@pytest.mark.parametrize("N,d,heads", [(4096, 40, 8), (1024, 80, 8)])
def test_flash_matches_einsum_on_tpu(N, d, heads):
    q_dim = d * heads
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, N, q_dim)), jnp.bfloat16)
    outs = {}
    for impl in ("einsum", "flash"):
        m = CrossAttention(q_dim, heads, d, dtype=jnp.bfloat16, impl=impl)
        params = m.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return (m.apply(p, x).astype(jnp.float32) ** 2).sum()

        val, grad = jax.jit(jax.value_and_grad(loss))(params)
        gn = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                          for g in jax.tree_util.tree_leaves(grad)))
        outs[impl] = (float(val), float(gn))
    ev, eg = outs["einsum"]
    fv, fg = outs["flash"]
    assert abs(ev - fv) / abs(ev) < 2e-2
    assert abs(eg - fg) / abs(eg) < 2e-2


def test_ff_remat_matches_saved_exactly():
    """ff_impl=remat is the SAME math as saved — nn.remat only changes
    what is kept for backward (the FF's LayerNorm'd input instead of the
    [B, N, 8·dim] GEGLU projection temps), so block value and gradients
    must match bit-for-bit, and the param tree must be name-identical
    (checkpoint-compatible both ways)."""
    from siss_tpu.models.unet2d_cond import BasicTransformerBlock

    heads, d, N = 2, 8, 64
    dim = heads * d
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, N, dim)), jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24)), jnp.bfloat16)
    outs = {}
    for impl in ("saved", "remat"):
        m = BasicTransformerBlock(dim, heads, d, context_dim=24,
                                  dtype=jnp.bfloat16, ff_impl=impl)
        params = m.init(jax.random.PRNGKey(0), x, ctx)

        def loss(p):
            return (m.apply(p, x, ctx).astype(jnp.float32) ** 2).sum()

        val, grad = jax.jit(jax.value_and_grad(loss))(params)
        outs[impl] = (val, grad, params)
    assert outs["saved"][0] == outs["remat"][0]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        outs["saved"][1], outs["remat"][1])
    assert (jax.tree_util.tree_structure(outs["saved"][2])
            == jax.tree_util.tree_structure(outs["remat"][2]))
    with pytest.raises(ValueError, match="Unknown ff impl"):
        BasicTransformerBlock(dim, heads, d, context_dim=24,
                              ff_impl="typo").init(jax.random.PRNGKey(0), x, ctx)


def test_surgical_remats_compose_bitexact_on_full_unet():
    """attention_impl=einsum_remat + ff_impl=remat together on the full
    (tiny) conditional UNet: same params, same output, same grads as the
    all-saved defaults — the two surgical remat knobs must compose without
    changing any math."""
    from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig

    base = UNet2DConditionConfig.tiny().__dict__
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.array([3, 500], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 32)), jnp.float32)
    outs = {}
    for tag, kw in (("saved", {}),
                    ("remat", {"attention_impl": "einsum_remat", "ff_impl": "remat"})):
        m = UNet2DCondition(UNet2DConditionConfig(**{**base, **kw}), dtype=jnp.bfloat16)
        params = m.init_params(jax.random.PRNGKey(1), batch_size=2, context_len=7)

        def loss(p):
            return (m.apply({"params": p}, x, t, ctx) ** 2).sum()

        val, grad = jax.jit(jax.value_and_grad(loss))(params)
        outs[tag] = (val, grad)
    assert outs["saved"][0] == outs["remat"][0]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        outs["saved"][1], outs["remat"][1])
