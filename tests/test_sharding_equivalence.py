"""SPMD correctness: the SISS step over a sharded mesh must produce the
same update and metrics as the same step on one device — gradients, surgery
norms and the clip are semantically global (SURVEY §2.8 subtlety: the
scaling_norm clip must see the globally-reduced forget gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.models import UNet2D, UNet2DConfig
from siss_tpu.parallel import MeshConfig, make_mesh, microbatched_sharding, shard_params_fsdp
from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step
import pytest


def _setup():
    cfg = UNet2DConfig(sample_size=8, in_channels=1, out_channels=1,
                       block_out_channels=(8, 16), layers_per_block=1,
                       down_block_types=("DownBlock2D", "DownBlock2D"),
                       up_block_types=("UpBlock2D", "UpBlock2D"), norm_num_groups=4)
    model = UNet2D(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    sched = NoiseSchedule.create(100, "linear")
    tx = optax.adamw(1e-3)

    def eps_apply(p, x, t, cond):
        return model.apply({"params": p}, x, t)

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


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    step, params, tx, batch = _setup()
    key = jax.random.PRNGKey(42)

    # single device
    state1 = TrainState.create(jax.device_put(params, jax.devices()[0]), tx)
    b1 = jax.device_put(batch, jax.devices()[0])
    s1, m1 = step(state1, b1, key, {})

    # 4×2 data×fsdp mesh
    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    sharded_params = shard_params_fsdp(params, mesh)
    state2 = TrainState.create(sharded_params, tx)
    b2 = jax.tree.map(lambda x: jax.device_put(x, microbatched_sharding(mesh)), batch)
    s2, m2 = step(state2, b2, key, {})

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=5e-5, atol=1e-6,
                                   err_msg=k)
    # fp32 reduction-order differs between sharded psums and local sums;
    # Adam's step-1 rsqrt amplifies it on near-zero leaves → absolute tol.
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5)
