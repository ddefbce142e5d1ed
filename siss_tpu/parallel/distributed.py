"""Multi-host initialization (pods/slices).

The reference's multi-process story is `accelerate launch` + NCCL process
groups with a 7200 s timeout (``delete_celeb.py:99-101``); on TPU pods the
equivalent is ``jax.distributed.initialize`` — after which ``jax.devices()``
spans the slice, the mesh covers all chips, and every collective rides
ICI/DCN via XLA with no explicit barriers (SPMD).

Call ``maybe_initialize_distributed()`` once at entry; it is a no-op on
single-host (including this repo's single-chip dev environment) and reads
the standard cluster env vars on pods.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed(coordinator_address: str | None = None,
                                 num_processes: int | None = None,
                                 process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-process; returns True
    when initialization happened."""
    import jax

    # Require an explicit multi-process signal: a coordinator address (arg
    # or env) or JAX_NUM_PROCESSES > 1. Heuristics like TPU_WORKER_HOSTNAMES
    # misfire on single-host dev tunnels.
    explicit = coordinator_address is not None
    env_coord = any(os.environ.get(k) for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ))
    n_proc = int(os.environ.get("JAX_NUM_PROCESSES", num_processes or 1) or 1)
    if not (explicit or env_coord or n_proc > 1):
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except Exception as e:  # already initialized / single-process launch
        print(f"[distributed] initialize skipped: {e}")
        return False
