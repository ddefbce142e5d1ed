"""Tensor-parallel correctness: the SISS step over a data×fsdp×tensor mesh
must produce the same update and metrics as one device, with the TP-role
parameters genuinely distributed (Megatron column/row rules in
``parallel/mesh.py::_tp_spec``). The reference has no TP at all
(SURVEY §2.8 — HF-Accelerate DDP only); this is TPU-native headroom for
models whose state exceeds one chip even under fsdp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.models import UNet2D, UNet2DConfig
from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig
from siss_tpu.parallel import (
    MeshConfig,
    make_mesh,
    microbatched_sharding,
    param_shardings,
    shard_params_fsdp,
)
from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step


def _cond_setup():
    cfg = UNet2DConditionConfig.tiny()
    model = UNet2DCondition(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    def eps_apply(p, x, t, cond):
        return model.apply({"params": p}, x, t, cond)

    sched = NoiseSchedule.create(100, "linear")
    tx = optax.adamw(1e-3)
    step_cfg = DeletionStepConfig(loss_fn="importance_sampling_with_mixture",
                                  loss_params=(("lambd", 0.5),),
                                  scaling_norm=5.0, grad_accum_steps=2,
                                  t_min=0, t_max=100)
    step = jax.jit(build_deletion_train_step(eps_apply, sched, tx, step_cfg))
    rng = np.random.default_rng(0)
    batch = {
        "all": jnp.asarray(rng.normal(size=(2, 8, 8, 8, 4)), jnp.float32),
        "deletion": jnp.asarray(rng.normal(size=(2, 8, 8, 8, 4)), jnp.float32),
        "conditioning": jnp.asarray(rng.normal(size=(2, 8, 7, 32)), jnp.float32),
    }
    return step, params, tx, batch


def _pixel_setup():
    cfg = UNet2DConfig(sample_size=8, in_channels=1, out_channels=1,
                       block_out_channels=(16, 32), layers_per_block=1,
                       down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                       up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                       norm_num_groups=4)
    model = UNet2D(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    def eps_apply(p, x, t, cond):
        return model.apply({"params": p}, x, t)

    sched = NoiseSchedule.create(100, "linear")
    tx = optax.adamw(1e-3)
    step_cfg = DeletionStepConfig(loss_fn="importance_sampling_with_mixture",
                                  loss_params=(("lambd", 0.5),),
                                  scaling_norm=5.0, grad_accum_steps=2,
                                  t_min=0, t_max=100)
    step = jax.jit(build_deletion_train_step(eps_apply, sched, tx, step_cfg))
    rng = np.random.default_rng(0)
    batch = {
        "all": jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)), jnp.float32),
        "deletion": jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)), jnp.float32),
    }
    return step, params, tx, batch


def _run_pair(step, params, tx, batch, mesh_cfg):
    key = jax.random.PRNGKey(42)
    state1 = TrainState.create(jax.device_put(params, jax.devices()[0]), tx)
    s1, m1 = step(state1, jax.device_put(batch, jax.devices()[0]), key, {})

    mesh = make_mesh(mesh_cfg)
    state2 = TrainState.create(shard_params_fsdp(params, mesh), tx)
    b2 = jax.tree.map(lambda x: jax.device_put(x, microbatched_sharding(mesh)), batch)
    s2, m2 = step(state2, b2, key, {})
    return (s1, m1), (s2, m2), mesh


def _assert_equivalent(one, sharded):
    (s1, m1), (s2, m2) = one, sharded
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=5e-5, atol=1e-6,
                                   err_msg=k)
    # fp32 reduction-order differs between sharded psums and local sums;
    # Adam's step-1 rsqrt amplifies it on near-zero leaves → absolute tol.
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5)


def test_tp_specs_cover_the_megatron_roles():
    """Every attention projection and resnet conv pair must get a tensor
    spec; norms before the pair and output biases after all-reduces stay
    replicated (or fsdp) — checked on the real param trees, not toys."""
    cfg = UNet2DConditionConfig.tiny()
    params = UNet2DCondition(cfg).init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    shardings = param_shardings(params, mesh)
    flat = {
        "/".join(getattr(e, "key", str(e)) for e in path): s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    }
    tb = "down_blocks_0_attentions_0/transformer_blocks_0"
    assert flat[f"{tb}/attn1/to_q/kernel"][-1] == "tensor"
    assert flat[f"{tb}/attn2/to_k/kernel"][-1] == "tensor"
    assert flat[f"{tb}/attn1/to_out/kernel"][0] == "tensor"
    assert flat[f"{tb}/ff/geglu_proj/kernel"][-1] == "tensor"
    assert flat[f"{tb}/ff/out_proj/kernel"][0] == "tensor"
    rb = "down_blocks_0_resnets_0"
    assert flat[f"{rb}/conv1/kernel"][-1] == "tensor"
    assert flat[f"{rb}/conv2/kernel"][-2] == "tensor"
    assert flat[f"{rb}/norm2/scale"][0] == "tensor"
    assert "tensor" not in tuple(flat[f"{rb}/norm1/scale"])
    assert "tensor" not in tuple(flat[f"{tb}/attn1/to_out/bias"])
    # TP composes with fsdp on a second dim for the big kernels
    assert flat[f"{rb}/conv2/kernel"] == (None, None, "tensor", None) or \
        "fsdp" in tuple(flat[f"{rb}/conv2/kernel"])


@pytest.mark.slow
def test_tp_step_matches_single_device_cond_unet():
    """2×2×2 data×fsdp×tensor: conditional UNet (cross-attn, GEGLU, flash
    gating off on CPU) — metrics and updated params match one device."""
    step, params, tx, batch = _cond_setup()
    one, sharded, mesh = _run_pair(step, params, tx, batch,
                                   MeshConfig(data=2, fsdp=2, tensor=2))
    _assert_equivalent(one, sharded)
    # the TP-role params must be genuinely distributed: a to_q kernel's
    # per-device shard is half (tensor=2) of the full array
    p = sharded[0].params["down_blocks_0_attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert p.addressable_shards[0].data.shape[-1] * 2 == p.shape[-1]


@pytest.mark.slow
def test_tp_step_matches_single_device_pixel_unet():
    """data=2×tensor=4 (no fsdp): pixel UNet with SpatialAttention."""
    step, params, tx, batch = _pixel_setup()
    one, sharded, _ = _run_pair(step, params, tx, batch,
                                MeshConfig(data=2, fsdp=1, tensor=4))
    _assert_equivalent(one, sharded)


@pytest.mark.slow
def test_mesh_sharded_eval_sampling_matches_single_device():
    """Evaluator(mesh=...) shards the eval batch over the data axes (the
    50-step sampler runs every grad step in the celeb workload); draws and
    trajectories must be identical to the unsharded path (partitionable
    threefry), and the produced arrays actually land sharded."""
    from siss_tpu.evaluate import Evaluator

    _, params, _, _ = _pixel_setup()
    cfg = UNet2DConfig(sample_size=8, in_channels=1, out_channels=1,
                       block_out_channels=(16, 32), layers_per_block=1,
                       down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                       up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                       norm_num_groups=4)
    model = UNet2D(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    def eps_apply(p, x, t, cond):
        return model.apply({"params": p}, x, t)

    sched = NoiseSchedule.create(100, "linear")
    ev1 = Evaluator(eps_apply, sched, (8, 8, 1), num_inference_steps=4, random_seed=7)
    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    ev2 = Evaluator(eps_apply, sched, (8, 8, 1), num_inference_steps=4, random_seed=7,
                    mesh=mesh)
    imgs1 = ev1.sample_images(params, 8, set_generator=True)
    imgs2 = ev2.sample_images(shard_params_fsdp(params, mesh), 8, set_generator=True)
    np.testing.assert_allclose(imgs1, imgs2, rtol=2e-4, atol=2e-5)
    # odd batch (not divisible by the 8-way data axes) falls back cleanly
    imgs3 = ev2.sample_images(shard_params_fsdp(params, mesh), 3, set_generator=True)
    assert imgs3.shape[0] == 3
    # denoise path too
    x_t = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 1)))
    d1 = ev1.denoise_images(params, x_t, 5)
    d2 = ev2.denoise_images(shard_params_fsdp(params, mesh), x_t, 5)
    np.testing.assert_allclose(d1, d2, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_tp_collectives_present_in_compiled_step():
    """The compiled TP program must actually contain cross-tensor-axis
    all-reduces (the Megatron row-parallel reductions) — i.e. the specs
    aren't being silently ignored/gathered away into replication."""
    step, params, tx, batch = _cond_setup()
    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    state = TrainState.create(shard_params_fsdp(params, mesh), tx)
    b = jax.tree.map(lambda x: jax.device_put(x, microbatched_sharding(mesh)), batch)
    hlo = step.lower(state, b, jax.random.PRNGKey(0), {}).compile().as_text()
    assert "all-reduce" in hlo
