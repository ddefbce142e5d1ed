"""Device mesh + sharding layer (the TPU-native replacement for the
reference's HF-Accelerate DDP/NCCL stack, SURVEY.md §2.8).

The reference's only parallelism is data-parallel DDP with gradient
all-reduce on backward; here the same semantics fall out of SPMD
partitioning: the batch axis is sharded over the ``data`` mesh axis,
gradients and the surgery's global norms are computed over the global batch
inside one jitted program, and XLA inserts the ICI collectives. An optional
``fsdp`` axis shards parameters/optimizer state (the reference only has
inert DeepSpeed-ZeRO scaffolding, ``delete_sd.py:421-444``), and an
optional ``tensor`` axis splits the model itself Megatron-style
(``_tp_spec``; no reference equivalent). Batches are sharded over
data(+fsdp) and replicated over ``tensor``; all placement is parameter
shardings + XLA GSPMD propagation — the train-step code never changes.
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
    parameters and optimizer state over a second axis; ``tensor``
    optionally splits the model itself (Megatron-style tensor parallelism
    over attention heads and resnet conv channels — see ``_tp_spec``).
    ``fsdp=1, tensor=1`` means pure DP (reference parity). Axis order is
    data-outermost so the highest-volume collectives (tensor's per-layer
    all-reduces) ride the innermost, fastest ICI links.
    """

    data: int = -1   # -1 → all remaining devices
    fsdp: int = 1
    tensor: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        model = self.fsdp * self.tensor
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(f"mesh {data}x{self.fsdp}x{self.tensor} != {n_devices} devices")
        return MeshConfig(data=data, fsdp=self.fsdp, tensor=self.tensor)


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if cfg.data > 0 and cfg.data * cfg.fsdp * cfg.tensor <= len(devices):
        devices = devices[: cfg.data * cfg.fsdp * cfg.tensor]  # explicit sizes may use a subset
    cfg = cfg.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(cfg.data, cfg.fsdp, cfg.tensor)
    return Mesh(dev_array, axis_names=("data", "fsdp", "tensor"))


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


def _fsdp_spec(shape, mesh: Mesh, min_size: int = 2**16, taken=()) -> P:
    """Shard the largest dimension divisible by the fsdp axis size; small
    params stay replicated (standard FSDP-ish heuristic). ``taken`` marks
    dims already claimed by the tensor axis."""
    n = mesh.shape.get("fsdp", 1)
    if n <= 1 or np.prod(shape) < min_size:
        return P()
    # prefer the last dim (contraction layouts keep collectives on ICI)
    for axis in reversed(range(len(shape))):
        if axis not in taken and shape[axis] % n == 0 and shape[axis] >= n:
            spec = [None] * len(shape)
            spec[axis] = "fsdp"
            return P(*spec)
    return P()


def _tp_spec(path_names: Sequence[str], shape) -> Optional[P]:
    """Megatron-style tensor-parallel PartitionSpec for a UNet parameter,
    or None when the parameter has no TP role (caller falls back to fsdp).

    The column/row pairing keeps one all-reduce per attention block, per
    feed-forward, and per resnet:

    - attention (``SpatialAttention`` / ``CrossAttention``): ``to_q/to_k/
      to_v`` kernels column-sharded (heads split across the axis, each
      head's QK^T and AV einsums stay device-local), ``to_out`` kernel
      row-sharded → one all-reduce; its bias replicated (added after).
    - GEGLU feed-forward: ``geglu_proj`` column-sharded, ``out_proj``
      row-sharded → one all-reduce. (The [h | gate] concat layout of the
      fused GEGLU kernel is diffusers'; GSPMD reshards its two slices —
      an interleaved layout would avoid that but break converter parity.)
    - resnet conv pair: ``conv1`` output-channel-sharded, the time-emb
      projection and ``norm2``'s scale/bias sharded to match (GroupNorm
      stats stay local while tp divides num_groups — channels are grouped
      contiguously), ``conv2`` input-channel-sharded → one all-reduce.
      ``norm1`` and the shortcut see full-channel tensors → replicated.

    Activations are never annotated: batch stays sharded over data(+fsdp)
    and replicated over tensor; XLA's sharding propagation derives the
    intermediate layouts and inserts the all-reduces.
    """
    leaf = path_names[-1]
    parent = path_names[-2] if len(path_names) >= 2 else ""
    block = path_names[-3] if len(path_names) >= 3 else ""

    if parent in ("to_q", "to_k", "to_v") and leaf == "kernel":
        return P(None, "tensor")
    if parent == "to_out":
        return P("tensor", None) if leaf == "kernel" else P()
    if parent == "geglu_proj":
        return P(None, "tensor") if leaf == "kernel" else P("tensor")
    if parent == "out_proj" and block == "ff":
        return P("tensor", None) if leaf == "kernel" else P()
    if "resnets" in block:
        if parent == "conv1":
            return P(None, None, None, "tensor") if leaf == "kernel" else P("tensor")
        if parent == "time_emb_proj":
            return P(None, "tensor") if leaf == "kernel" else P("tensor")
        if parent == "norm2":
            return P("tensor")
        if parent == "conv2":
            return P(None, None, "tensor", None) if leaf == "kernel" else P()
    return None


def _param_spec(path_names: Sequence[str], shape, mesh: Mesh) -> P:
    """Full placement spec for one parameter: tensor-parallel role first
    (when the mesh has a tensor axis and the dim divides), then fsdp over
    a remaining dim, else replicated."""
    tp = mesh.shape.get("tensor", 1)
    if tp > 1:
        spec = _tp_spec(path_names, shape)
        if spec is not None:
            taken = [i for i, a in enumerate(spec) if a == "tensor"]
            # rank guard: factored optimizer states (adafactor v_row/v_col)
            # keep the parameter's path names but are 1-D — a spec indexing
            # a missing dim means "this leaf is not the parameter", so fall
            # through to plain fsdp-by-shape placement
            if all(i < len(shape) and shape[i] % tp == 0 for i in taken):
                # compose with fsdp on a different dim (TP+FSDP, standard
                # 3D layout) — e.g. conv kernels shard cout over tensor
                # AND cin over fsdp
                fs = _fsdp_spec(shape, mesh, taken=tuple(taken))
                merged = [
                    t if t is not None else f
                    for t, f in zip(tuple(spec) + (None,) * (len(shape) - len(spec)),
                                    tuple(fs) + (None,) * (len(shape) - len(fs)))
                ]
                return P(*merged)
    return _fsdp_spec(shape, mesh)


def _path_names(path) -> tuple:
    return tuple(getattr(e, "key", None) or getattr(e, "name", None) or str(e) for e in path)


def shard_params_fsdp(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree on the mesh: tensor-parallel roles sharded
    over ``tensor`` (when the axis exists), big tensors FSDP-sharded,
    everything else replicated. (Name kept from the fsdp-only era; this is
    the one placement entry point tasks use.)"""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: jax.device_put(
            p, NamedSharding(mesh, _param_spec(_path_names(path), p.shape, mesh))),
        params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, p: NamedSharding(mesh, _param_spec(_path_names(path), p.shape, mesh)),
        params)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Re-place a whole TrainState pytree on the mesh: params and optimizer
    moments by their parameter spec (tp+fsdp), everything else replicated.
    Needed after checkpoint restore — orbax returns leaves committed to
    whatever devices the template leaves happened to live on (sharded
    params vs single-device scalars), and jit refuses arguments spanning
    inconsistent device sets."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, _param_spec(_path_names(path), x.shape, mesh))),
        state)


def shard_batch(batch: Any, mesh: Mesh, batch_axis: int = 0) -> Any:
    """device_put a host batch pytree with its batch axis sharded over `data`."""
    sh = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
