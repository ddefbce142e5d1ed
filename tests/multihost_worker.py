"""Worker for tests/test_multihost.py: one rank of a 2-process CPU cluster.

Proves the reference's DDP input contract (per-rank disjoint sampler
stripes, ``infinite_sampler.py:5-13``) end-to-end on the JAX side:
process-local batches → ``jax.make_array_from_process_local_data`` →
one global train step whose result is identical on every process.

Usage: python multihost_worker.py <process_id> <coordinator_port>
"""

import os
import sys

PID = int(sys.argv[1])
PORT = int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=2, process_id=PID)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from siss_tpu.data import InfiniteSampler  # noqa: E402
from siss_tpu.diffusion import NoiseSchedule  # noqa: E402
from siss_tpu.parallel import (  # noqa: E402
    MeshConfig,
    global_microbatches_from_local,
    make_mesh,
    process_batch_slice,
)
from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

N, GLOBAL_BS, ACCUM = 16, 8, 2
bs_local = process_batch_slice(GLOBAL_BS)
assert bs_local == 4

# ---- 1. striping contract: union of both ranks' stripes == rank-less stream
take = GLOBAL_BS * ACCUM
mine = [next(iter_) for iter_ in [iter(InfiniteSampler(N, rank=PID, num_replicas=2, seed=7))]
        for _ in range(take // 2)]
other = [next(it) for it in [iter(InfiniteSampler(N, rank=1 - PID, num_replicas=2, seed=7))]
         for _ in range(take // 2)]
full = [next(it) for it in [iter(InfiniteSampler(N, rank=0, num_replicas=1, seed=7))]
        for _ in range(take)]
interleaved = [None] * take
interleaved[PID::2] = mine
interleaved[1 - PID::2] = other
assert interleaved == full, "rank stripes must tile the single-rank stream"

# ---- 2. global assembly: every process contributes only its stripe
dataset = np.arange(N, dtype=np.float32).reshape(N, 1, 1, 1) * np.ones((1, 4, 4, 1), np.float32)
local_idx = np.asarray(mine[: ACCUM * bs_local]).reshape(ACCUM, bs_local)
local_batch = dataset[local_idx]  # [A, bs_local, 4, 4, 1]

mesh = make_mesh(MeshConfig(data=4, fsdp=1))
batch = {
    "all": global_microbatches_from_local(local_batch, mesh),
    "deletion": global_microbatches_from_local(local_batch * 0.5, mesh),
}
assert batch["all"].shape == (ACCUM, GLOBAL_BS, 4, 4, 1), batch["all"].shape

# replicated global mean must equal the mean over BOTH ranks' stripes
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

gmean = jax.jit(lambda x: jnp.mean(x), out_shardings=NamedSharding(mesh, P()))(batch["all"])
both_idx = np.asarray(interleaved[: ACCUM * GLOBAL_BS])
expected = float(dataset[both_idx].mean())
np.testing.assert_allclose(float(gmean), expected, rtol=1e-6)

# ---- 3. one SPMD deletion step over the global batch; identical results
schedule = NoiseSchedule.create(100, "linear")
params = {"w": jnp.asarray(0.5), "b": jnp.asarray(0.1)}
tx = optax.sgd(0.1)
cfg = DeletionStepConfig(loss_fn="importance_sampling_with_mixture",
                         loss_params=(("lambd", 0.5),), scaling_norm=5.0,
                         grad_accum_steps=ACCUM, t_min=0, t_max=100,
                         fused_siss=False)
step = jax.jit(build_deletion_train_step(
    lambda p, x, t, c: p["w"] * x + p["b"], schedule, tx, cfg))
state = TrainState.create(params, tx)
with mesh:
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0), {})
w = float(np.asarray(jax.device_get(new_state.params["w"])))
norm_a = float(np.asarray(jax.device_get(metrics["gradient/norm_loss_a"])))
assert np.isfinite(w) and np.isfinite(norm_a)
print(f"MULTIHOST_OK pid={PID} w={w:.8f} norm_a={norm_a:.8f}", flush=True)
