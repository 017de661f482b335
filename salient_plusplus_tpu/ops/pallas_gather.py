"""Pallas TPU kernels for the feature-gather hot path.

The per-batch feature assembly is a row gather ``x[n_id]`` of ~1e5 rows
from an HBM-resident table — the single most bandwidth-critical op in the
step (SURVEY.md §7 step 9). ``pallas_gather_rows`` keeps the table in HBM
and streams rows into VMEM with double-buffered async DMAs whose addresses
come from scalar-prefetched indices (PrefetchScalarGridSpec), overlapping
index-dependent DMA issue with the copy-out of the previous row block.

Used behind the same signature as ops.segment.gather_rows; enable with
``use_pallas_gather(True)`` (TPU backends only — interpret mode covers CPU
tests). Falls back to XLA's native gather elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_USE_PALLAS = False


def use_pallas_gather(on: bool = True):
    global _USE_PALLAS
    _USE_PALLAS = on


def _gather_kernel(idx_ref, table_ref, out_ref, scratch, sems, *,
                   block: int):
    """One program gathers `block` rows. Row DMAs are double-buffered:
    row r+1's DMA is issued while row r is copied from scratch to the
    output block."""
    n_buf = scratch.shape[0]

    def issue(slot, r):
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[r]],
            scratch.at[slot],
            sems.at[slot],
        )

    base = pl.program_id(0) * block
    issue(0, base).start()

    def body(i, _):
        slot = jax.lax.rem(i, n_buf)
        nxt = jax.lax.rem(i + 1, n_buf)

        @pl.when(i + 1 < block)
        def _():
            issue(nxt, base + i + 1).start()

        issue(slot, base + i).wait()
        out_ref[i, :] = scratch[slot]
        return 0

    jax.lax.fori_loop(0, block, body, 0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pallas_gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                       block: int = 256, interpret: bool = False
                       ) -> jnp.ndarray:
    """out[i] = table[idx[i]] — Pallas DMA gather. idx length must be a
    multiple of `block` (pad with any valid index)."""
    n = idx.shape[0]
    assert n % block == 0, (n, block)
    f = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block, f), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, f), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_gather_kernel, block=block)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, f), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx.astype(jnp.int32), table)


def gather_rows_auto(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas DMA gather when enabled (TPU), else XLA gather."""
    if _USE_PALLAS and idx.ndim == 1 and table.ndim == 2:
        n = idx.shape[0]
        block = 256 if n % 256 == 0 else (128 if n % 128 == 0 else None)
        if block is not None:
            return pallas_gather_rows(table, idx, block=block)
    return jnp.take(table, idx, axis=0)
