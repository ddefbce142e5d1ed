"""Gradient-surgery train step tests.

Golden semantics checked against the reference's update rule
(``delete_celeb.py:682-767``): g = clip₁(g_x − (scaling_norm/‖g_a‖)·g_a),
with per-microbatch losses normalised ``sum()/batch_size`` and gradients
averaged over accumulation steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.diffusion.schedule import q_sample
from siss_tpu.train import (
    DeletionStepConfig,
    TrainState,
    build_deletion_train_step,
    build_pretrain_step,
    clip_by_global_norm,
    global_norm,
)

MB, H, W, C = 4, 8, 8, 1


def linear_apply(params, x, t, cond):
    """Tiny linear 'unet': eps = w * x + b, so gradients are analytic."""
    return params["w"] * x + params["b"]


@pytest.fixture
def setup():
    sched = NoiseSchedule.create(100, "linear")
    params = {"w": jnp.asarray(0.5), "b": jnp.asarray(0.1)}
    tx = optax.sgd(1.0)
    rng = np.random.default_rng(3)
    batch = {
        "all": jnp.asarray(rng.normal(size=(2, MB, H, W, C)), jnp.float32),
        "deletion": jnp.asarray(rng.normal(size=(2, MB, H, W, C)), jnp.float32),
    }
    return sched, params, tx, batch


def test_global_norm_and_clip():
    tree = {"a": jnp.asarray([3.0, 0.0]), "b": jnp.asarray([[4.0]])}
    np.testing.assert_allclose(float(global_norm(tree)), 5.0, rtol=1e-6)
    clipped, norm = clip_by_global_norm(tree, 1.0)
    np.testing.assert_allclose(float(global_norm(clipped)), 1.0, rtol=1e-4)
    # below-threshold trees are untouched
    small = {"a": jnp.asarray([0.3])}
    clipped, _ = clip_by_global_norm(small, 1.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), [0.3], rtol=1e-5)


@pytest.mark.parametrize("loss_fn", [
    "importance_sampling_with_mixture",
    "double_forward_with_neg_del",
    "erasediff",
    "subscore_bernoulli",
])
def test_surgery_losses_run_and_update(setup, loss_fn):
    sched, params, tx, batch = setup
    lp = (("lambd", 0.5),) if loss_fn in ("importance_sampling_with_mixture", "subscore_bernoulli") else ()
    cfg = DeletionStepConfig(loss_fn=loss_fn, loss_params=lp, scaling_norm=5.0,
                             grad_accum_steps=2, t_min=0, t_max=100)
    step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
    state = TrainState.create(params, tx)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0), {})
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["gradient/norm_loss_a"]))
    assert np.isfinite(float(metrics["gradient/scaling_factor"]))
    # params actually moved
    assert float(jnp.abs(new_state.params["w"] - params["w"])) > 0


def test_scalar_path_naive_del_matches_manual_grad(setup):
    """naive_del: the step's gradient must equal the analytic gradient of
    mean-over-microbatches of sum((w x_t + b - ε)²)/MB, clipped to 1."""
    sched, params, tx, batch = setup
    cfg = DeletionStepConfig(loss_fn="naive_del", loss_params=(), grad_accum_steps=2,
                             t_min=0, t_max=100, max_grad_norm=1e9)
    step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
    state = TrainState.create(params, tx)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(7), {})

    # Recompute manually with the same keys the step derives.
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    grads = []
    for a in range(2):
        k_noise, k_t, k_loss, k_p = jax.random.split(keys[a], 4)
        keep = batch["all"][a]
        noise = jax.random.normal(k_noise, keep.shape, dtype=keep.dtype)
        t = jax.random.randint(k_t, (MB,), 0, 100)
        noisy = q_sample(sched, keep, noise, t)

        def L(p):
            return ((p["w"] * noisy + p["b"] - noise) ** 2).sum() / MB

        grads.append(jax.grad(L)(params))
    g = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    # sgd(1.0): new = old - g
    np.testing.assert_allclose(float(new_state.params["w"]), float(params["w"] - g["w"]), rtol=1e-4)
    np.testing.assert_allclose(float(new_state.params["b"]), float(params["b"] - g["b"]), rtol=1e-4)


def test_surgery_direction_matches_formula(setup):
    """double_forward: final grad must equal g_x − (scaling_norm/‖g_a‖)·g_a."""
    sched, params, tx, batch = setup
    cfg = DeletionStepConfig(loss_fn="double_forward_with_neg_del", loss_params=(),
                             grad_accum_steps=2, t_min=0, t_max=100,
                             scaling_norm=3.0, max_grad_norm=1e9)
    step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
    state = TrainState.create(params, tx)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(11), {})

    keys = jax.random.split(jax.random.PRNGKey(11), 2)
    gx_list, ga_list = [], []
    for a in range(2):
        k_noise, k_t, k_loss, k_p = jax.random.split(keys[a], 4)
        keep, forget = batch["all"][a], batch["deletion"][a]
        noise = jax.random.normal(k_noise, keep.shape, dtype=keep.dtype)
        t = jax.random.randint(k_t, (MB,), 0, 100)
        noisy_x = q_sample(sched, keep, noise, t)
        noisy_a = q_sample(sched, forget, noise, t)
        gx_list.append(jax.grad(lambda p: ((p["w"] * noisy_x + p["b"] - noise) ** 2).sum() / MB)(params))
        ga_list.append(jax.grad(lambda p: ((p["w"] * noisy_a + p["b"] - noise) ** 2).sum() / MB)(params))
    g_x = jax.tree.map(lambda a, b: (a + b) / 2, *gx_list)
    g_a = jax.tree.map(lambda a, b: (a + b) / 2, *ga_list)
    norm_a = float(global_norm(g_a))
    s = 3.0 / norm_a
    expected = jax.tree.map(lambda x, a: x - s * a, g_x, g_a)

    np.testing.assert_allclose(float(metrics["gradient/norm_loss_a"]), norm_a, rtol=1e-4)
    np.testing.assert_allclose(float(metrics["gradient/scaling_factor"]), s, rtol=1e-4)
    np.testing.assert_allclose(float(new_state.params["w"]), float(params["w"] - expected["w"]), rtol=1e-4)


def test_erasediff_projection_sign(setup):
    """EraseDiff scaling: −max(eta − ⟨g_x,g_a⟩/‖g_a‖², 0) ⇒ always ≤ 0."""
    sched, params, tx, batch = setup
    cfg = DeletionStepConfig(loss_fn="erasediff", loss_params=(), eta=1e-3,
                             grad_accum_steps=2, t_min=0, t_max=100)
    step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
    state = TrainState.create(params, tx)
    _, metrics = step(state, batch, jax.random.PRNGKey(0), {})
    assert float(metrics["gradient/scaling_factor"]) <= 0.0


def test_dynamic_superfactor(setup):
    """simple_neg_del takes superfactor at runtime (decay knob,
    ``delete_celeb.py:658-662``); doubling it must double the gradient."""
    sched, params, tx, batch = setup
    cfg = DeletionStepConfig(loss_fn="simple_neg_del", loss_params=(("superfactor", 1.0),),
                             grad_accum_steps=2, t_min=0, t_max=100, max_grad_norm=1e9)
    step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
    state = TrainState.create(params, tx)
    s1, _ = step(state, batch, jax.random.PRNGKey(0), {"superfactor": jnp.asarray(1.0)})
    s2, _ = step(state, batch, jax.random.PRNGKey(0), {"superfactor": jnp.asarray(2.0)})
    d1 = float(params["w"] - s1.params["w"])
    d2 = float(params["w"] - s2.params["w"])
    np.testing.assert_allclose(d2, 2 * d1, rtol=1e-4)


def test_ema_updates(setup):
    sched, params, tx, batch = setup
    cfg = DeletionStepConfig(loss_fn="naive_del", loss_params=(), grad_accum_steps=1,
                             t_min=0, t_max=100, use_ema=True)
    step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
    state = TrainState.create(params, tx, use_ema=True)
    b1 = {k: v[:1] for k, v in batch.items()}
    new_state, _ = step(state, b1, jax.random.PRNGKey(0), {})
    assert new_state.ema is not None
    assert int(new_state.ema.step) == 1
    # EMA moved toward the new params but is not equal to them
    assert float(new_state.ema.params["w"]) != float(new_state.params["w"])


def test_pretrain_step_decreases_loss():
    sched = NoiseSchedule.create(100, "linear")
    params = {"w": jnp.asarray(2.0), "b": jnp.asarray(0.5)}
    tx = optax.adam(1e-1)
    step = jax.jit(build_pretrain_step(linear_apply, sched, tx))
    state = TrainState.create(params, tx, use_ema=True)
    batch = jax.random.normal(jax.random.PRNGKey(0), (16, H, W, C))
    losses = []
    for i in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("loss_fn", ["importance_sampling_with_mixture",
                                     "double_forward_with_neg_del", "erasediff"])
def test_fused_surgery_equivalence(setup, loss_fn):
    """The single-pass surgery epilogue (closed-form post-combine clip norm,
    no materialized combined tree before its norm) must reproduce the
    literal sweep-by-sweep ordering to fp32 tolerance for every
    surgery-path loss family."""
    sched, params, tx, batch = setup
    lp = (("lambd", 0.5),) if loss_fn == "importance_sampling_with_mixture" else ()
    outs = {}
    for fused in (True, False):
        cfg = DeletionStepConfig(loss_fn=loss_fn, loss_params=lp, scaling_norm=5.0,
                                 grad_accum_steps=2, fused_surgery=fused)
        step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
        state = TrainState.create(params, tx)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(7), {})
        outs[fused] = (new_state, metrics)
    sf, mf = outs[True]
    ss, ms = outs[False]
    for k in ("gradient/norm_loss_x", "gradient/norm_loss_a",
              "gradient/scaling_factor", "gradient/pre_clip_norm"):
        np.testing.assert_allclose(float(mf[k]), float(ms[k]), rtol=1e-5, atol=1e-7), k
    for a, b in zip(jax.tree_util.tree_leaves(sf.params),
                    jax.tree_util.tree_leaves(ss.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_bf16_accumulator_tolerance(setup):
    """Lever study (BASELINE.md): bf16 surgery accumulators vs fp32 at
    accum 4. The surgery scalars (norms, scaling factor) must stay within
    bf16's ~0.4% relative error and the parameter update direction must
    agree to first order — quantifies the 'grad_accum_dtype: bfloat16'
    memory/bandwidth lever's accuracy cost."""
    sched, params, tx, _ = setup
    rng = np.random.default_rng(5)
    batch = {
        "all": jnp.asarray(rng.normal(size=(4, MB, H, W, C)), jnp.float32),
        "deletion": jnp.asarray(rng.normal(size=(4, MB, H, W, C)), jnp.float32),
    }
    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = DeletionStepConfig(loss_fn="importance_sampling_with_mixture",
                                 loss_params=(("lambd", 0.5),), scaling_norm=5.0,
                                 grad_accum_steps=4, grad_accum_dtype=dt)
        step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
        state = TrainState.create(params, tx)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(11), {})
        outs[dt] = (new_state, metrics)
    (s32, m32), (s16, m16) = outs["float32"], outs["bfloat16"]
    for k in ("gradient/norm_loss_x", "gradient/norm_loss_a", "gradient/scaling_factor"):
        rel = abs(float(m16[k]) - float(m32[k])) / (abs(float(m32[k])) + 1e-12)
        assert rel < 1e-2, (k, rel)
    for a, b, p in zip(jax.tree_util.tree_leaves(s16.params),
                       jax.tree_util.tree_leaves(s32.params),
                       jax.tree_util.tree_leaves(params)):
        # compare the UPDATE (param delta), not the params, so the check
        # is meaningful even for small steps
        da, db = np.asarray(a - p), np.asarray(b - p)
        denom = np.abs(db).max() + 1e-12
        assert np.abs(da - db).max() / denom < 5e-2


def test_param_cast_once_equivalence(setup):
    """``param_cast_dtype`` moves the fp32→bf16 parameter cast from
    inside the microbatch scan (flax cast-at-use) to once per step.
    Dataflow is value-identical: every op sees the same bf16 inputs and
    the cast's VJP is itself a cast, so grads/metrics/updates must match
    the cast-at-use step exactly."""
    sched, params, tx, batch = setup

    def bf16_apply(p, x, t, cond):
        # mimic flax dtype=bfloat16 modules: params cast at use
        pw = jax.tree.map(lambda v: v.astype(jnp.bfloat16), p)
        return (pw["w"] * x.astype(jnp.bfloat16) + pw["b"]).astype(jnp.float32)

    outs = {}
    for cast in (None, "bfloat16"):
        cfg = DeletionStepConfig(loss_fn="importance_sampling_with_mixture",
                                 loss_params=(("lambd", 0.5),), scaling_norm=5.0,
                                 grad_accum_steps=2, param_cast_dtype=cast)
        step = jax.jit(build_deletion_train_step(bf16_apply, sched, tx, cfg))
        state = TrainState.create(params, tx)
        outs[cast] = step(state, batch, jax.random.PRNGKey(7), {})
    (s0, m0), (s1, m1) = outs[None], outs["bfloat16"]
    for k in ("gradient/norm_loss_x", "gradient/norm_loss_a",
              "gradient/scaling_factor", "loss_x/mean"):
        np.testing.assert_allclose(float(m0[k]), float(m1[k]), rtol=1e-6), k
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
