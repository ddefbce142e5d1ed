"""Multi-host input feeding: per-process local batches → one global array.

The reference feeds per-rank DataLoaders under DDP — each rank's
``InfiniteSampler(rank, num_replicas)`` yields a disjoint stripe of the
shuffled index stream (``data/utils/infinite_sampler.py:5-13``). The
TPU-pod equivalent: every process assembles only its local slice of the
global batch on the host, and ``jax.make_array_from_process_local_data``
stitches the slices into one globally-sharded ``jax.Array`` laid out by the
mesh's batch sharding — no cross-host copies beyond what the sharding needs.

On single-process runs these helpers degrade to plain ``device_put`` with
the same sharding, so tasks call them unconditionally.
"""

from __future__ import annotations

from typing import Any, Iterator

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

from siss_tpu.parallel.mesh import batch_sharding, microbatched_sharding


def process_batch_slice(global_batch_size: int) -> int:
    """Per-process share of the global batch (must divide evenly, like the
    reference's per-rank batch under DDP)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} processes")
    return global_batch_size // n


def make_rank_sampler(sampler_cls, dataset_len: int, **kwargs):
    """Instantiate a sampler striped for this process (the reference's
    rank/num_replicas contract, actually used here)."""
    return sampler_cls(dataset_len, rank=jax.process_index(),
                       num_replicas=jax.process_count(), **kwargs)


def _from_local(x, sharding: NamedSharding):
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def global_batch_from_local(batch: Any, mesh: Mesh, batch_axis: int = 0) -> Any:
    """Assemble a globally batch-sharded array tree from process-local
    host slices. Each process passes ONLY its local rows; the result's
    global shape multiplies the batch axis by ``process_count``."""
    sh = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda x: _from_local(x, sh), batch)


def global_microbatches_from_local(batch: Any, mesh: Mesh) -> Any:
    """Same for [accum, local_batch, ...] trees (axis 1 is the batch)."""
    sh = microbatched_sharding(mesh)
    return jax.tree.map(lambda x: _from_local(x, sh), batch)


def global_folded_microbatches_from_local(batch: Any, mesh: Mesh) -> Any:
    """For [K, accum, local_batch, ...] trees (``steps_per_call`` folding:
    axis 0 = fused optimizer steps, axis 1 = accumulation, axis 2 = batch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_axes = ("data", "fsdp") if mesh.shape.get("fsdp", 1) > 1 else "data"
    sh = NamedSharding(mesh, P(None, None, data_axes))
    return jax.tree.map(lambda x: _from_local(x, sh), batch)


def local_stream(stream: Iterator, mesh: Mesh) -> Iterator:
    """Wrap a host batch stream so every yielded pytree is assembled into
    a global sharded array tree."""
    for batch in stream:
        yield global_microbatches_from_local(batch, mesh)
