"""Device mesh + sharding layer (the TPU-native replacement for the
reference's HF-Accelerate DDP/NCCL stack, SURVEY.md §2.8).

The reference's only parallelism is data-parallel DDP with gradient
all-reduce on backward; here the same semantics fall out of SPMD
partitioning: the batch axis is sharded over the ``data`` mesh axis,
gradients and the surgery's global norms are computed over the global batch
inside one jitted program, and XLA inserts the ICI collectives. An optional
``fsdp`` axis shards parameters/optimizer state (the reference only has
inert DeepSpeed-ZeRO scaffolding, ``delete_sd.py:421-444``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """How to lay the available devices out.

    ``data`` is the DP axis (batch-sharded); ``fsdp`` optionally shards
    parameters and optimizer state over a second axis. ``fsdp=1`` means
    pure DP (reference parity).
    """

    data: int = -1   # -1 → all remaining devices
    fsdp: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        data = self.data if self.data > 0 else n_devices // self.fsdp
        if data * self.fsdp != n_devices:
            raise ValueError(f"mesh {data}x{self.fsdp} != {n_devices} devices")
        return MeshConfig(data=data, fsdp=self.fsdp)


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if cfg.data > 0 and cfg.data * cfg.fsdp <= len(devices):
        devices = devices[: cfg.data * cfg.fsdp]  # explicit sizes may use a subset
    cfg = cfg.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(cfg.data, cfg.fsdp)
    return Mesh(dev_array, axis_names=("data", "fsdp"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch dimension over `data` (and `fsdp` if present — fully
    data-parallel batch)."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = ("data", "fsdp") if mesh.shape.get("fsdp", 1) > 1 else "data"
    return NamedSharding(mesh, P(*spec))


def microbatched_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [accum, batch, ...] arrays: axis 1 is the batch."""
    data_axes = ("data", "fsdp") if mesh.shape.get("fsdp", 1) > 1 else "data"
    return NamedSharding(mesh, P(None, data_axes))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape, mesh: Mesh, min_size: int = 2**16) -> P:
    """Shard the largest dimension divisible by the fsdp axis size; small
    params stay replicated (standard FSDP-ish heuristic)."""
    n = mesh.shape["fsdp"]
    if n <= 1 or np.prod(shape) < min_size:
        return P()
    # prefer the last dim (contraction layouts keep collectives on ICI)
    for axis in reversed(range(len(shape))):
        if shape[axis] % n == 0 and shape[axis] >= n:
            spec = [None] * len(shape)
            spec[axis] = "fsdp"
            return P(*spec)
    return P()


def shard_params_fsdp(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree: FSDP-shard big tensors, replicate the rest."""
    def place(p):
        sh = NamedSharding(mesh, _fsdp_spec(p.shape, mesh))
        return jax.device_put(p, sh)

    return jax.tree.map(place, params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda p: NamedSharding(mesh, _fsdp_spec(p.shape, mesh)), params)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Re-place a whole TrainState pytree on the mesh: big tensors
    FSDP-sharded, everything else replicated. Needed after checkpoint
    restore — orbax returns leaves committed to whatever devices the
    template leaves happened to live on (sharded params vs single-device
    scalars), and jit refuses arguments spanning inconsistent device sets."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, _fsdp_spec(x.shape, mesh))),
        state)


def shard_batch(batch: Any, mesh: Mesh, batch_axis: int = 0) -> Any:
    """device_put a host batch pytree with its batch axis sharded over `data`."""
    sh = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
