"""Round-2 additions: per-microbatch dyn scalars (superfactor decay inside
the accumulation loop, reference ``delete_celeb.py:658-662``), tracker
line-series panels, and the delete_sd ``validation_steps`` knob.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step
from siss_tpu.utils.tracker import Tracker

MB, H, W, C = 4, 8, 8, 1


def linear_apply(params, x, t, cond):
    return params["w"] * x + params["b"]


def _batch(rng, accum):
    return {
        "all": jnp.asarray(rng.normal(size=(accum, MB, H, W, C)), jnp.float32),
        "deletion": jnp.asarray(rng.normal(size=(accum, MB, H, W, C)), jnp.float32),
    }


def test_per_microbatch_superfactor_scans():
    """A [A]-shaped dyn scalar must apply per microbatch. simple_neg_del's
    gradient is linear in superfactor, so (a) scaling the whole array
    scales the update, and (b) a non-uniform array must differ from a
    uniform array with the same mean — proving per-microbatch application
    rather than a broadcast."""
    sched = NoiseSchedule.create(100, "linear")
    params = {"w": jnp.asarray(0.5), "b": jnp.asarray(0.1)}
    # plain SGD lr=1: param delta == -grad, so deltas compare gradients
    tx = optax.sgd(1.0)
    cfg = DeletionStepConfig(loss_fn="simple_neg_del", loss_params=(),
                             grad_accum_steps=2, t_min=0, t_max=100,
                             max_grad_norm=1e9)
    step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))

    rng = np.random.default_rng(0)
    batch = _batch(rng, 2)
    key = jax.random.PRNGKey(7)
    s0, s1 = 3.0, 1.5

    state = TrainState.create(params, tx)
    new_state, _ = step(state, batch, key,
                        {"superfactor": jnp.asarray([s0, s1], jnp.float32)})
    delta = jax.tree.map(lambda a, b: b - a, state.params, new_state.params)

    # Linearity check: doubling the whole superfactor array doubles the
    # (unclipped) gradient — simple_neg_del's grad is linear in superfactor.
    new2, _ = step(state, batch, key,
                   {"superfactor": jnp.asarray([2 * s0, 2 * s1], jnp.float32)})
    delta2 = jax.tree.map(lambda a, b: b - a, state.params, new2.params)
    np.testing.assert_allclose(np.asarray(delta2["w"]), 2 * np.asarray(delta["w"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(delta2["b"]), 2 * np.asarray(delta["b"]), rtol=1e-5)

    # and a NON-uniform array differs from the uniform mean-scalar one
    # (proves per-microbatch application, not a broadcast of the mean)
    uni, _ = step(state, batch, key,
                  {"superfactor": jnp.asarray([(s0 + s1) / 2] * 2, jnp.float32)})
    du = jax.tree.map(lambda a, b: b - a, state.params, uni.params)
    assert not np.allclose(np.asarray(du["w"]), np.asarray(delta["w"]), rtol=1e-6)


def test_scalar_dyn_still_broadcasts():
    sched = NoiseSchedule.create(100, "linear")
    params = {"w": jnp.asarray(0.5), "b": jnp.asarray(0.1)}
    tx = optax.sgd(1.0)
    cfg = DeletionStepConfig(loss_fn="simple_neg_del", loss_params=(),
                             grad_accum_steps=2, t_min=0, t_max=100)
    step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
    rng = np.random.default_rng(1)
    batch = _batch(rng, 2)
    state = TrainState.create(params, tx)
    key = jax.random.PRNGKey(3)
    a, _ = step(state, batch, key, {"superfactor": jnp.asarray(2.0)})
    b, _ = step(state, batch, key, {"superfactor": jnp.asarray([2.0, 2.0], jnp.float32)})
    np.testing.assert_allclose(np.asarray(a.params["w"]), np.asarray(b.params["w"]), rtol=1e-6)


def test_tracker_line_series(tmp_path):
    tr = Tracker("proj", str(tmp_path))
    tr.log_line_series("noise_norms/noise_norms_0",
                       xs=[0, 20, 40],
                       ys=[[1.0, 2.0, 3.0], [0.5, 1.5, 2.5]],
                       keys=[0, 1], title="t", xname="Timestep", step=16)
    tr.finish()
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    rec = [l for l in lines if l.get("_panel") == "line_series"][0]
    assert rec["_name"] == "noise_norms/noise_norms_0"
    assert rec["xs"] == [0, 20, 40]
    assert rec["ys"][1] == [0.5, 1.5, 2.5]
    assert rec["keys"] == [0, 1]
    assert rec["_step"] == 16


def test_batched_dual_backward_equivalence():
    """vmapped dual pullback == sequential two pulls (same math; tiny
    float32 reduction-order differences allowed)."""
    from siss_tpu.diffusion import NoiseSchedule

    sched = NoiseSchedule.create(100, "linear")
    params = {"w": jnp.asarray(0.5), "b": jnp.asarray(0.1)}
    tx = optax.sgd(1.0)
    rng = np.random.default_rng(5)
    batch = _batch(rng, 2)
    key = jax.random.PRNGKey(11)
    outs = []
    for dual in (False, True):
        cfg = DeletionStepConfig(
            loss_fn="importance_sampling_with_mixture", loss_params=(("lambd", 0.5),),
            scaling_norm=5.0, grad_accum_steps=2, t_min=0, t_max=100,
            fused_siss=False, batched_dual_backward=dual)
        step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
        state = TrainState.create(params, tx)
        new_state, metrics = step(state, batch, key, {})
        outs.append((new_state, metrics))
    (s0, m0), (s1, m1) = outs
    np.testing.assert_allclose(np.asarray(s0.params["w"]), np.asarray(s1.params["w"]), rtol=1e-5)
    np.testing.assert_allclose(float(m0["gradient/norm_loss_a"]),
                               float(m1["gradient/norm_loss_a"]), rtol=1e-5)


def test_grad_accum_dtype_bf16_close_to_fp32():
    """bfloat16 accumulators track the fp32 reference update closely on a
    well-conditioned tiny problem (the memory-efficient SD mode)."""
    from siss_tpu.diffusion import NoiseSchedule

    sched = NoiseSchedule.create(100, "linear")
    params = {"w": jnp.asarray(0.5), "b": jnp.asarray(0.1)}
    tx = optax.sgd(1.0)
    rng = np.random.default_rng(9)
    batch = _batch(rng, 4)
    key = jax.random.PRNGKey(2)
    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = DeletionStepConfig(loss_fn="importance_sampling_with_mixture",
                                 loss_params=(("lambd", 0.5),), scaling_norm=5.0,
                                 grad_accum_steps=4, t_min=0, t_max=100,
                                 fused_siss=False, grad_accum_dtype=dt)
        step = jax.jit(build_deletion_train_step(linear_apply, sched, tx, cfg))
        state = TrainState.create(params, tx)
        new_state, _ = step(state, batch, key, {})
        outs[dt] = float(new_state.params["w"])
    # bf16 has ~3 decimal digits; accumulation over 4 microbatches stays
    # within ~1% of the fp32 reference here
    np.testing.assert_allclose(outs["bfloat16"], outs["float32"], rtol=2e-2)


def test_optimizer_builder_mu_dtype():
    from siss_tpu.config import Config
    from siss_tpu.train.optim import build_optimizer

    tx = build_optimizer(Config({"_target_": "torch.optim.AdamW", "lr": 1e-4,
                                 "mu_dtype": "bfloat16"}))
    state = tx.init({"w": jnp.zeros((4,), jnp.float32)})
    # optax adamw state: (ScaleByAdamState, ...) — mu must be bf16, nu fp32
    adam_state = state[0]
    assert adam_state.mu["w"].dtype == jnp.bfloat16
    assert adam_state.nu["w"].dtype == jnp.float32


def test_optimizer_builder_nu_dtype():
    from siss_tpu.config import Config
    from siss_tpu.train.optim import build_optimizer

    tx = build_optimizer(Config({"_target_": "torch.optim.AdamW", "lr": 1e-4,
                                 "mu_dtype": "bfloat16", "nu_dtype": "bfloat16"}))
    params = {"w": jnp.zeros((4,), jnp.float32)}
    state = tx.init(params)
    adam_state = state[0]
    assert adam_state.mu["w"].dtype == jnp.bfloat16
    assert adam_state.nu["w"].dtype == jnp.bfloat16
    # update keeps the dtypes and produces finite params
    g = {"w": jnp.full((4,), 0.1, jnp.float32)}
    u, state = tx.update(g, state, params)
    assert state[0].nu["w"].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(optax.apply_updates(params, u)["w"])).all()


@pytest.mark.slow
def test_delete_tshirt_steps_per_call(tmp_path):
    """Fused unlearning blocks must complete all steps, log every step's
    metrics row, and fire cadences at block crossings (task end-to-end,
    ~43s — full tier like the other task e2e tests)."""
    import os

    from siss_tpu.config import load_config
    from siss_tpu.data import make_synthetic_mnist_tshirt
    from siss_tpu.tasks.delete_tshirt import DeleteTShirt

    npz = str(tmp_path / "d.npz")
    images, labels = make_synthetic_mnist_tshirt(n_per_class=6)
    np.savez(npz, images=images, labels=labels)
    cfg = load_config("delete_tshirt", [
        f"dataset_all.path={npz}", f"dataset_deletion.path={npz}",
        f"dataset.path={npz}", f"output_dir={tmp_path}/out",
        "checkpoint_path=null",
        "training_steps=5", "train_batch_size=4", "eval_images=4",
        "eval_batch_size=4", "sampling_steps=3", "steps_per_call=2",
        "metrics.likelihood=null", "mesh.data=2",
        "pipeline.num_inference_steps=4",
        "unet.block_out_channels=[16,32]",
        "unet.down_block_types=[DownBlock2D,DownBlock2D]",
        "unet.up_block_types=[UpBlock2D,UpBlock2D]",
        "+unet.norm_num_groups=8",
    ])
    DeleteTShirt(cfg).run()
    rows = [json.loads(l) for l in open(os.path.join(str(tmp_path), "out", "metrics.jsonl"))]
    train_steps = sorted(r["_step"] for r in rows if "loss_x/mean" in r)
    assert train_steps == [1, 2, 3, 4, 5], train_steps  # every step logged
    # sampling cadence 3 crossed inside block 2 -> eval logged at step 4
    eval_steps = sorted(r["_step"] for r in rows
                        if "metrics/deletion_class_fraction" in r)
    assert 4 in eval_steps, eval_steps
