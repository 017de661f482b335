"""Pallas fused gather→segment-sum aggregation kernel.

The hot op of every GNN layer is ``segment_sum(emb[src], dst)`` over a
target-grouped edge list. XLA lowers it as gather (E row writes) + scatter
(E row reads + adds): ~4·E row operations. This kernel fuses them: per
target tile, edge indices are DMA'd to SMEM in chunks, neighbor rows are
streamed from HBM through a ring of R outstanding row DMAs, and accumulated
directly into the tile's VMEM output — ~E row reads + T row writes, about
half the row traffic.

Requires the sampler's sorted-dst layout (dst nondecreasing, padding ==
num_segments) and `tile_starts` (per-tile edge offsets, derived from the
searchsorted rowptr — see ops.segment.segment_degrees_sorted). Gradient is
provided via custom_vjp with the XLA scatter formulation (the dominant use,
the outermost hop over raw features, needs no gradient at all).

Enable on TPU with ``use_fused_aggregate(True)``; interpret mode backs the
CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_USE_FUSED = False


def use_fused_aggregate(on: bool = True):
    global _USE_FUSED
    _USE_FUSED = on


def _kernel(tile_starts_ref, emb_ref, src_ref, dst_ref, out_ref,
            src_sm, dst_sm, ring, ring_sems, idx_sems, *,
            t_tile: int, chunk: int, r: int):
    i = pl.program_id(0)
    t0 = i * t_tile
    e0 = tile_starts_ref[i]
    e1 = tile_starts_ref[i + 1]
    out_ref[:] = jnp.zeros_like(out_ref)
    n_e = e1 - e0
    n_ch = pl.cdiv(n_e, chunk)

    def row_dma(slot, k):
        return pltpu.make_async_copy(
            emb_ref.at[src_sm[k]], ring.at[slot], ring_sems.at[slot])

    def chunk_body(c, _):
        base = e0 + c * chunk
        cp_s = pltpu.make_async_copy(
            src_ref.at[pl.ds(base, chunk)], src_sm, idx_sems.at[0])
        cp_d = pltpu.make_async_copy(
            dst_ref.at[pl.ds(base, chunk)], dst_sm, idx_sems.at[1])
        cp_s.start()
        cp_d.start()
        cp_s.wait()
        cp_d.wait()
        limit = jnp.minimum(n_e - c * chunk, chunk)

        for pre in range(r):  # static ring prologue
            @pl.when(pre < limit)
            def _():
                row_dma(pre, pre).start()

        def edge_body(k, _):
            slot = jax.lax.rem(k, r)
            row_dma(slot, k).wait()
            lt = dst_sm[k] - t0

            @pl.when((lt >= 0) & (lt < t_tile))
            def _():
                out_ref[lt, :] += ring[slot].astype(out_ref.dtype)

            @pl.when(k + r < limit)
            def _():
                row_dma(slot, k + r).start()

            return 0

        jax.lax.fori_loop(0, limit, edge_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, n_ch, chunk_body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=(
    "num_segments", "t_tile", "chunk", "r", "interpret"))
def fused_gather_segment_sum(emb: jnp.ndarray, src: jnp.ndarray,
                             dst: jnp.ndarray, tile_starts: jnp.ndarray,
                             num_segments: int, t_tile: int = 64,
                             chunk: int = 512, r: int = 8,
                             interpret: bool = False) -> jnp.ndarray:
    """out[t] = Σ_{e: dst[e]==t} emb[src[e]] (float32 accumulate).

    src/dst must be padded to a multiple of `chunk` beyond the last real
    edge (extra slots: src=0, dst=num_segments). num_segments must be a
    multiple of t_tile. tile_starts: int32 [num_segments//t_tile + 1].
    """
    assert num_segments % t_tile == 0
    f = emb.shape[1]
    n_tiles = num_segments // t_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # emb (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # src (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # dst (HBM)
        ],
        out_specs=pl.BlockSpec((t_tile, f), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.VMEM((8, f), emb.dtype),        # ring buffers (r ≤ 8)
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, t_tile=t_tile, chunk=chunk, r=r)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_segments, f), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_starts.astype(jnp.int32), emb, src.astype(jnp.int32),
      dst.astype(jnp.int32))


def make_tile_starts(dst: jnp.ndarray, count, num_segments: int,
                     t_tile: int = 64) -> jnp.ndarray:
    """Per-tile edge offsets from the sorted dst array (device-side)."""
    from .segment import valid_mask

    safe_dst = jnp.where(valid_mask(dst.shape[0], count), dst, num_segments)
    n_tiles = num_segments // t_tile
    bounds = jax.lax.broadcasted_iota(jnp.int32, (n_tiles + 1,), 0) * t_tile
    return jnp.searchsorted(safe_dst, bounds, side="left").astype(jnp.int32)
