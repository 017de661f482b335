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


def maybe_initialize_distributed() -> None:
    """Multi-host bootstrap (idempotent). On TPU pods the coordinator is
    discovered from the environment; single-process runs are a no-op."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
        jax.distributed.initialize()
    except Exception:
        pass  # single-process / already initialized / unsupported backend
