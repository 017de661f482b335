"""Device mesh helpers.

The process-group/rendezvous layer of the reference (NCCL init +
filesystem rendezvous, driver/drivers/ddp.py:245-309) collapses to
`jax.distributed.initialize` (multi-host) plus a named Mesh; collectives
ride ICI/DCN automatically based on the mesh layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the data axis — each device owns one feature partition
    and one microbatch stream (the reference's one-process-per-GPU layout)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def multiprocess_intended(env) -> bool:
    """True when the environment says this process is one of several:
    manual JAX coordinator vars, a SLURM/MPI launcher with >1 tasks, or a
    multi-host TPU worker list. (A genuinely metadata-server-only Cloud
    TPU pod exposes TPU_WORKER_HOSTNAMES too, so this covers the
    auto-detectable launchers jax.distributed itself knows about.)"""
    if any(v in env for v in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")):
        return True
    for v in ("SLURM_NTASKS", "SLURM_STEP_NUM_TASKS",
              "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
        try:
            if int(env.get(v, "1")) > 1:
                return True
        except ValueError:
            pass
    hosts = [h for h in env.get("TPU_WORKER_HOSTNAMES", "").split(",")
             if h.strip()]
    return len(hosts) > 1


def maybe_initialize_distributed() -> None:
    """Multi-host bootstrap (idempotent). On TPU pods the coordinator is
    discovered from the environment; single-process runs are a no-op.

    Must run BEFORE any other JAX call (even jax.process_count()
    initializes the backends, after which jax.distributed.initialize
    refuses to run). Fail-fast (SURVEY §5.3): when a multi-process run is
    clearly intended (coordinator/launcher/worker-list env vars present —
    :func:`multiprocess_intended`), a failed bootstrap raises instead of
    silently degrading to single-process.
    """
    import os

    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    if not multiprocess_intended(os.environ):
        return  # plain single-process run: leave jax alone
    jax.distributed.initialize()  # raises on a half-configured pod
