from .mesh import make_mesh, DATA_AXIS
from .spmd import (
    make_spmd_train_step, make_spmd_eval_step, stack_batches,
)

__all__ = [
    "make_mesh", "DATA_AXIS",
    "make_spmd_train_step", "make_spmd_eval_step", "stack_batches",
]
