"""MXU one-hot-matmul segment ops over sorted edge lists (Pallas TPU).

The aggregation hot path. XLA lowers scatter-adds to a serialized while
loop (~15 ns/edge on v5e) and row gathers to ~8 ns/row regardless of row
width — both far from HBM bandwidth. This kernel retires edges at ~1
edge/cycle instead: the sampler emits each hop's COO sorted by target
(``dst`` nondecreasing, pads == num_segments), so a grid over 128-target
tiles can stream aligned 512-edge chunks of the (pre-gathered) message
rows through VMEM and accumulate each chunk with a single MXU matmul

    acc[TT, F] += onehot[TT, G] @ chunk[G, F],

where ``onehot[r, g] = (ids[g] == tile_base + r)``. Edges outside the
tile's id window (chunk-boundary overlap, padding) fall out of the
one-hot automatically, so correctness needs no masking and no assumptions
beyond sortedness.

The backward pass never scatters either: the sampler also emits a
src-sorted mirror of each hop (``EdgeBlock.msrc/mdst``), so d_x is the
same kernel over the transposed CSR (see ``spmm_agg``):

    fwd:  msg = x[src]            (XLA row gather)
          out = segsum(msg, dst)  (this kernel, dst-sorted)
    bwd:  h   = (d_out/deg)[mdst] (XLA row gather)
          d_x = segsum(h, msrc)   (this kernel, src-sorted mirror)

Reference hot path replaced: PyG SpMM/scatter in every conv
(driver/models.py:19-56, fast_trainer/train.py:15-71).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TT = 128    # targets per grid tile (one-hot rows)
G = 512     # edges per DMA chunk (one-hot cols / matmul contraction)
NBUF = 6    # DMA ring depth
AHEAD = 4   # chunks kept in flight (must be <= NBUF - 2: one slot margin
            # for the boundary chunk shared by adjacent tiles)

# None = auto (TPU backends only); tests force True with interpret mode.
_USE_MXU = None
_INTERPRET = False


def use_mxu_spmm(on: bool | None = True, interpret: bool = False):
    global _USE_MXU, _INTERPRET
    _USE_MXU = on
    _INTERPRET = interpret


def mxu_spmm_enabled() -> bool:
    import os

    if os.environ.get("SPTPU_DISABLE_MXU"):
        return False
    if _USE_MXU is not None:
        return _USE_MXU
    return jax.default_backend() == "tpu"


def _segment_kernel(tile_ptr_ref, ids_hbm, vals_hbm, out_ref,
                    ids_buf, vals_buf, state, sems):
    """One grid step = one 128-target tile. The chunk stream is GLOBAL:
    tiles consume consecutive (overlapping at boundaries) ranges of the
    same aligned chunk sequence, so a single ring pipeline persists across
    grid steps via SMEM issue/wait pointers — DMA cold-start latency is
    paid once per call, not once per tile."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    e0 = tile_ptr_ref[t]
    e1 = tile_ptr_ref[t + 1]
    c0 = jax.lax.div(e0, G)
    nchunks = jax.lax.div(e1 + (G - 1), G) - c0
    # highest chunk any tile will consume (pads excluded by tile_ptr[nt])
    last_chunk = jax.lax.div(tile_ptr_ref[nt] + (G - 1), G) - 1

    @pl.when(t == 0)
    def _():
        state[0] = 0  # next chunk to issue
        state[1] = 0  # next chunk to wait on

    def copies(c, slot):
        # Mosaic requires 8-aligned sublane slice offsets+shapes on the 2-D
        # int32 ids array: fetch the aligned [8, G] super-chunk containing
        # chunk c; the kernel body selects row (c & 7) with a masked sum.
        sc8 = pl.multiple_of((c // 8) * 8, 8)
        return (
            pltpu.make_async_copy(ids_hbm.at[pl.ds(sc8, 8), :],
                                  ids_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                vals_hbm.at[pl.ds(pl.multiple_of(c * G, G), G), :],
                vals_buf.at[slot], sems.at[slot, 1]),
        )

    def issue_upto(x):
        def cond(p):
            return p <= x

        def body(p):
            for cp in copies(p, jax.lax.rem(p, NBUF)):
                cp.start()
            return p + 1

        state[0] = jax.lax.while_loop(cond, body, state[0])

    out_ref[...] = jnp.zeros_like(out_ref)
    base = t * TT

    def body(i, carry):
        c = c0 + i
        slot = jax.lax.rem(c, NBUF)
        issue_upto(jnp.minimum(c + AHEAD, last_chunk))

        @pl.when(state[1] <= c)  # boundary chunks are waited once only
        def _():
            for cp in copies(c, slot):
                cp.wait()
            state[1] = c + 1

        row = jax.lax.rem(c, 8)
        rowmask = (jax.lax.broadcasted_iota(jnp.int32, (8, G), 0) == row)
        ids_row = jnp.sum(ids_buf[slot] * rowmask.astype(jnp.int32),
                          axis=0, keepdims=True)
        local = ids_row - base                             # [1, G] int32
        sel = jax.lax.broadcasted_iota(jnp.int32, (TT, G), 0) == local
        onehot = sel.astype(vals_buf.dtype)
        out_ref[...] += jax.lax.dot_general(
            onehot, vals_buf[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, nchunks, body, 0)


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def sorted_segment_sum_mxu(vals: jnp.ndarray, ids: jnp.ndarray,
                           num_segments: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Segment sum of ``vals`` [E, F] by nondecreasing ``ids`` [E] int32.

    Pad slots must carry ``ids == num_segments`` (the sampler's layout,
    native/sampler.cpp edge padding). ``num_segments`` must be a multiple
    of 128 (BatchSpec caps are). Returns float32 [num_segments, F].
    """
    E, F = vals.shape
    # Mosaic HBM->VMEM copies need 128-lane-aligned minor dims; pad the
    # feature axis up (bench shapes are already aligned — zero cost there)
    F_pad = -(-F // 128) * 128
    if F_pad != F:
        vals = jnp.pad(vals, ((0, 0), (0, F_pad - F)))
    if E % G:
        pad = G - E % G
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
        ids = jnp.pad(ids, (0, pad), constant_values=num_segments)
        E += pad
    # pad the segment space to whole tiles; pad ids (== num_segments) land
    # at row num_segments of the padded output, which is sliced away
    T_pad = -(-num_segments // TT) * TT
    nt = T_pad // TT
    bounds = jax.lax.broadcasted_iota(jnp.int32, (nt + 1,), 0) * TT
    tile_ptr = jnp.searchsorted(ids, bounds, side="left").astype(jnp.int32)
    # 7 pad rows so the kernel's [8, G] aligned ids slices stay in bounds
    ids2d = jnp.pad(ids.reshape(E // G, G), ((0, 7), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            # explicit HBM: VMEM placement would impose (8,128) tiling
            # constraints on the manually-DMA'd slices
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((TT, F_pad), lambda t, ptr: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, 8, G), jnp.int32),
            pltpu.VMEM((NBUF, G, F_pad), vals.dtype),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    out = pl.pallas_call(
        _segment_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_pad, F_pad), jnp.float32),
        interpret=interpret,
    )(tile_ptr, ids2d, vals)
    if T_pad != num_segments:
        out = out[:num_segments]
    return out[:, :F] if F_pad != F else out


def _sorted_degrees(ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Per-segment counts of a nondecreasing id array (pads == num_segments):
    searchsorted + diff, no scatter (ops/segment.py:77-89 semantics)."""
    bounds = jax.lax.broadcasted_iota(jnp.int32, (num_segments + 1,), 0)
    rowptr = jnp.searchsorted(ids, bounds, side="left")
    return jnp.diff(rowptr)


# ---------------------------------------------------------------------------
# spmm_agg: gather + segment mean/sum with a scatter-free custom VJP.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_agg_vjp(out_cap: int, mean: bool, x, src, dst, msrc, mdst):
    out, _ = _spmm_fwd(out_cap, mean, x, src, dst, msrc, mdst)
    return out


def _spmm_fwd(out_cap, mean, x, src, dst, msrc, mdst):
    msg = jnp.take(x, src, axis=0)
    s = sorted_segment_sum_mxu(msg, dst, out_cap, interpret=_INTERPRET)
    if mean:
        deg = jnp.maximum(_sorted_degrees(dst, out_cap), 1).astype(jnp.float32)
        out = s / deg[:, None]
    else:
        deg = None
        out = s
    # zero-byte proto carries x's static row cap + dtype through residuals
    proto = jnp.zeros((x.shape[0], 0), x.dtype)
    return out.astype(x.dtype), (deg, msrc, mdst, proto)


def _spmm_bwd(out_cap, mean, res, d_out):
    deg, msrc, mdst, proto = res
    n_in_cap, x_dtype = proto.shape[0], proto.dtype
    g = d_out.astype(jnp.float32)
    if mean:
        g = g / deg[:, None]
    h = jnp.take(g.astype(x_dtype), mdst, axis=0)
    d_x = sorted_segment_sum_mxu(h, msrc, n_in_cap,
                                 interpret=_INTERPRET).astype(x_dtype)

    # src/dst/msrc/mdst all share shape [E_cap] by construction
    ez = np.zeros(msrc.shape, jax.dtypes.float0)
    return (d_x, ez, ez, ez, ez)


_spmm_agg_vjp.defvjp(
    lambda out_cap, mean, x, src, dst, msrc, mdst: _spmm_fwd(
        out_cap, mean, x, src, dst, msrc, mdst),
    _spmm_bwd,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_agg_nomirror(out_cap: int, mean: bool, x, src, dst, count):
    out, _ = _spmm_fwd(out_cap, mean, x, src, dst, None, None)
    return out


def _spmm_nm_fwd(out_cap, mean, x, src, dst, count):
    out, (deg, _, _, proto) = _spmm_fwd(out_cap, mean, x, src, dst,
                                        None, None)
    return out, (deg, src, dst, count, proto)


def _spmm_nm_bwd(out_cap, mean, res, d_out):
    """No-mirror fallback backward: XLA gather + scatter-add (only reached
    when a caller differentiates a mirror-less hop, e.g. GCN's projected
    input on the outermost hop)."""
    deg, src, dst, count, proto = res
    n_in_cap, x_dtype = proto.shape[0], proto.dtype
    g = d_out.astype(jnp.float32)
    if mean:
        g = g / deg[:, None]
    E = src.shape[0]
    mask = jax.lax.broadcasted_iota(jnp.int32, (E,), 0) < count
    d_msg = jnp.take(g.astype(x_dtype), jnp.where(mask, dst, 0), axis=0)
    safe_src = jnp.where(mask, src, n_in_cap)
    d_x = jax.ops.segment_sum(d_msg, safe_src,
                              num_segments=n_in_cap + 1)[:n_in_cap]

    def f0(a):
        return np.zeros(a.shape, jax.dtypes.float0)

    return (d_x.astype(x_dtype), f0(src), f0(dst), f0(count))


_spmm_agg_nomirror.defvjp(_spmm_nm_fwd, _spmm_nm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sorted_segment_sum(num_segments: int, vals, ids):
    """Differentiable segment sum of PRE-GATHERED per-edge values (sorted
    ids, pads == num_segments): MXU-kernel forward, masked-gather backward.
    Used where messages are computed per edge before aggregation (GAT's
    attention-weighted sum) — replaces XLA's scatter-add forward."""
    return sorted_segment_sum_mxu(vals, ids, num_segments,
                                  interpret=_INTERPRET)


def _sss_fwd(num_segments, vals, ids):
    out = sorted_segment_sum_mxu(vals, ids, num_segments,
                                 interpret=_INTERPRET)
    return out, (ids, jnp.zeros((0,), vals.dtype))


def _sss_bwd(num_segments, res, d_out):
    ids, proto = res
    real = ids < num_segments
    d_vals = jnp.take(d_out.astype(proto.dtype),
                      jnp.minimum(ids, num_segments - 1), axis=0)
    d_vals = jnp.where(real[:, None], d_vals, 0)
    return (d_vals, np.zeros(ids.shape, jax.dtypes.float0))


sorted_segment_sum.defvjp(_sss_fwd, _sss_bwd)


def spmm_agg(x: jnp.ndarray, edge, out_cap: int, mean: bool = True):
    """Aggregate ``x[src]`` per target over one hop's sorted COO.

    With a src-sorted mirror present (``edge.msrc``), gradients w.r.t. x
    flow through the transposed-CSR kernel (scatter-free). Without one
    (the outermost hop) the forward still runs the MXU kernel and the
    backward — needed only by models that aggregate projected inputs,
    e.g. GCN — falls back to XLA gather + scatter.
    """
    if getattr(edge, "msrc", None) is not None:
        return _spmm_agg_vjp(out_cap, mean, x, edge.src, edge.dst,
                             edge.msrc, edge.mdst)
    return _spmm_agg_nomirror(out_cap, mean, x, edge.src, edge.dst,
                              edge.count)
