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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_USE_FUSED = False


def use_fused_aggregate(on: bool = True):
    global _USE_FUSED
    _USE_FUSED = on


def _kernel(tile_starts_ref, emb_ref, src_ref, dst_ref, out_ref,
            src_sm, dst_sm, ring, ring_sems, idx_sems, *,
            t_tile: int, chunk: int, r: int):
    # Mosaic constraints shape this kernel: VMEM vector accesses at dynamic
    # sublane offsets are illegal, so (a) the DMA ring has a leading batch
    # dim ([r, 1, F] — dynamic leading-dim indexing is allowed), and (b)
    # accumulation runs in a loop-carried row register that is flushed into
    # the output tile with a masked full-tile add whenever the target
    # changes (edges are target-grouped, so each target flushes once).
    # 1-D HBM memrefs are (1024)-tiled: index DMAs use absolute
    # 1024-aligned chunks of the global edge space, with per-tile [lo, hi)
    # bounds inside each chunk. emb is rank-3 [N, 1, F] so row DMAs slice
    # full minor planes at a dynamic (untiled) leading index.
    i = pl.program_id(0)
    t0 = i * t_tile
    e0 = tile_starts_ref[i]
    e1 = tile_starts_ref[i + 1]
    out_ref[:] = jnp.zeros_like(out_ref)
    f = out_ref.shape[1]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (t_tile, f), 0)

    def row_dma(slot, k):
        return pltpu.make_async_copy(
            emb_ref.at[src_sm[k]], ring.at[slot], ring_sems.at[slot])

    c0 = e0 // chunk
    c1 = (e1 + chunk - 1) // chunk

    def chunk_body(c, carry):
        acc, cur = carry
        base = c * chunk
        cp_s = pltpu.make_async_copy(
            src_ref.at[pl.ds(base, chunk)], src_sm, idx_sems.at[0])
        cp_d = pltpu.make_async_copy(
            dst_ref.at[pl.ds(base, chunk)], dst_sm, idx_sems.at[1])
        cp_s.start()
        cp_d.start()
        cp_s.wait()
        cp_d.wait()
        lo = jnp.maximum(e0 - base, 0)
        hi = jnp.minimum(e1 - base, chunk)

        for pre in range(r):  # static ring prologue
            @pl.when(lo + pre < hi)
            def _():
                row_dma(pre, lo + pre).start()

        def edge_body(k, carry):
            acc, cur = carry
            slot = jax.lax.rem(k - lo, r)
            row_dma(slot, k).wait()
            row = ring[slot, 0, :].astype(jnp.float32)
            lt = dst_sm[k] - t0
            changed = lt != cur

            @pl.when(changed)
            def _():
                # flush the finished target's accumulator
                @pl.when(cur >= 0)
                def _():
                    out_ref[:] += jnp.where(rows_iota == cur, acc, 0.0)

            acc = jnp.where(changed, row, acc + row)
            cur = lt

            @pl.when(k + r < hi)
            def _():
                row_dma(slot, k + r).start()

            return acc, cur

        return jax.lax.fori_loop(lo, hi, edge_body, (acc, cur),
                                 unroll=False)

    acc0 = jnp.zeros((1, f), jnp.float32)
    acc, cur = jax.lax.fori_loop(c0, c1, chunk_body,
                                 (acc0, jnp.int32(-1)), unroll=False)

    @pl.when(cur >= 0)
    def _():
        out_ref[:] += jnp.where(rows_iota == cur, acc, 0.0)


@functools.partial(jax.jit, static_argnames=(
    "num_segments", "t_tile", "chunk", "r", "interpret"))
def fused_gather_segment_sum(emb: jnp.ndarray, src: jnp.ndarray,
                             dst: jnp.ndarray, tile_starts: jnp.ndarray,
                             num_segments: int, t_tile: int = 64,
                             chunk: int = 1024, r: int = 8,
                             interpret: bool = False) -> jnp.ndarray:
    """out[t] = Σ_{e: dst[e]==t} emb[src[e]] (float32 accumulate).

    src/dst length must be a multiple of `chunk` (1-D HBM tiling) with
    padding beyond the last real edge (src=0, dst=num_segments).
    num_segments must be a multiple of t_tile. tile_starts: int32
    [num_segments//t_tile + 1].
    """
    assert num_segments % t_tile == 0
    assert src.shape[0] % chunk == 0, (src.shape, chunk)
    assert r <= 8, f"DMA ring scratch is sized for r <= 8, got r={r}"
    f = emb.shape[1]
    emb = emb[:, None, :]  # rank-3: row DMAs slice untiled leading dim
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
            pltpu.VMEM((8, 1, f), emb.dtype),     # ring buffers (r ≤ 8)
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


def _fused_fwd_impl(emb, src, dst, count, num_segments, t_tile, chunk, r):
    # pad edge arrays to a chunk multiple so in-kernel index DMAs stay in
    # bounds and chunk-aligned
    pad = (-src.shape[0]) % chunk
    src_p = jnp.concatenate([src, jnp.zeros(pad, src.dtype)])
    dst_p = jnp.concatenate(
        [dst, jnp.full(pad, num_segments, dst.dtype)])
    ts = make_tile_starts(dst_p, count, num_segments, t_tile)
    return fused_gather_segment_sum(emb, src_p, dst_p, ts, num_segments,
                                    t_tile=t_tile, chunk=chunk, r=r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_segment_sum_op(emb, src, dst, count, num_segments: int,
                         t_tile: int = 64):
    """Differentiable fused aggregation (sorted-dst layout). Forward is the
    Pallas kernel; backward is the XLA scatter formulation (transpose)."""
    return _fused_fwd_impl(emb, src, dst, count, num_segments, t_tile,
                           chunk=1024, r=8)


def _fused_fwd(emb, src, dst, count, num_segments, t_tile):
    out = _fused_fwd_impl(emb, src, dst, count, num_segments, t_tile,
                          chunk=1024, r=8)
    # zero-byte proto array: residuals must be JAX-typed pytree leaves —
    # a raw np.dtype residual crashes grad tracing (mxu_segment.py uses
    # the same trick)
    proto = jnp.zeros((emb.shape[0], 0), emb.dtype)
    return out, (proto, src, dst, count)


def _fused_bwd(num_segments, t_tile, res, g):
    (proto, src, dst, count) = res
    emb_shape, emb_dtype = proto.shape, proto.dtype
    # d_emb[src[e]] += g[dst[e]] for real edges; padded dst==num_segments
    # reads the appended zero row, so padded edges contribute nothing
    g_pad = jnp.concatenate(
        [g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
    rows = jnp.take(g_pad, jnp.minimum(dst, num_segments), axis=0)
    d_emb = jax.ops.segment_sum(rows, src, num_segments=emb_shape[0])
    return (d_emb.astype(emb_dtype), None, None, None)


fused_segment_sum_op.defvjp(_fused_fwd, _fused_bwd)


def maybe_fused_segment_sum(values_src_emb, src, dst, count,
                            num_segments: int):
    """Dispatch: fused Pallas path when enabled and shapes qualify,
    else None (caller falls back to gather+segment_sum)."""
    if not _USE_FUSED:
        return None
    if num_segments % 64 != 0 or values_src_emb.ndim != 2:
        return None
    return fused_segment_sum_op(values_src_emb, src, dst, count,
                                num_segments)


def make_tile_starts(dst: jnp.ndarray, count, num_segments: int,
                     t_tile: int = 64) -> jnp.ndarray:
    """Per-tile edge offsets from the sorted dst array (device-side)."""
    from .segment import valid_mask

    safe_dst = jnp.where(valid_mask(dst.shape[0], count), dst, num_segments)
    n_tiles = num_segments // t_tile
    bounds = jax.lax.broadcasted_iota(jnp.int32, (n_tiles + 1,), 0) * t_tile
    return jnp.searchsorted(safe_dst, bounds, side="left").astype(jnp.int32)
