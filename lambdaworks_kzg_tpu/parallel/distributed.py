"""Multi-host (DCN) initialization for the multi-chip tier.

The reference is single-process (SURVEY.md §2c: no NCCL/MPI/collectives
anywhere); its implicit batch/MSM parallelism maps here onto a JAX device
mesh that can span hosts. Inside a slice the mesh axes ride ICI; across
hosts, `jax.distributed` brings every process's local chips into one
global device list and the same `shard_map` programs run unchanged —
collectives cross DCN only where the mesh axis does.

Usage (one call per process, before building meshes):

    from lambdaworks_kzg_tpu.parallel import distributed
    distributed.initialize()          # env-driven (JAX_COORDINATOR_ADDRESS
                                      # / TPU pod env / single-process no-op)
    mesh = distributed.global_mesh()  # (data, points) over ALL hosts' chips

Layout rule (scaling-book recipe): keep the ``points`` axis inside a
slice (the window-sum all_gather is latency-sensitive), spread ``data``
across hosts — per-blob MSMs are independent, so DCN carries only the
final 48-byte commitments. `global_mesh` does this by default.
"""

import os
from typing import Optional

from .mesh import make_mesh

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed for multi-host meshes.

    Explicit args win; otherwise JAX's automatic cluster detection (TPU
    pod metadata, or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID) is used. A single-process environment (no coordinator
    configured) is a no-op returning False — the single-host path needs
    no initialization. Idempotent.
    """
    global _initialized
    if _initialized:
        return True
    explicit = coordinator_address is not None
    env = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    in_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES"))
    if not (explicit or env or in_pod):
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def is_initialized() -> bool:
    return _initialized


def global_mesh(data: Optional[int] = None, points: Optional[int] = None):
    """(data, points) mesh over every chip of every initialized host.

    Default layout: ``points`` spans the chips of one host/slice (ICI for
    the window-sum all_gather), ``data`` spans hosts (DCN carries only
    per-blob results). Explicit axis sizes override.
    """
    import jax

    devices = jax.devices()
    if data is None and points is None:
        local = jax.local_device_count()
        if len(devices) % local == 0 and len(devices) > local:
            data, points = len(devices) // local, local
    return make_mesh(devices=devices, data=data, points=points)
