from siss_tpu.parallel.mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    microbatched_sharding,
    replicated_sharding,
    param_shardings,
    shard_params_fsdp,
    shard_batch,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "microbatched_sharding",
    "replicated_sharding",
    "param_shardings",
    "shard_params_fsdp",
    "shard_batch",
]
