from siss_tpu.parallel.mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    microbatched_sharding,
    replicated_sharding,
    param_shardings,
    shard_params_fsdp,
    shard_state,
    shard_batch,
)
from siss_tpu.parallel.multihost import (
    global_batch_from_local,
    global_folded_microbatches_from_local,
    global_microbatches_from_local,
    local_stream,
    make_rank_sampler,
    process_batch_slice,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "microbatched_sharding",
    "replicated_sharding",
    "param_shardings",
    "shard_params_fsdp",
    "shard_state",
    "shard_batch",
    "global_batch_from_local",
    "global_folded_microbatches_from_local",
    "global_microbatches_from_local",
    "local_stream",
    "make_rank_sampler",
    "process_batch_slice",
]
