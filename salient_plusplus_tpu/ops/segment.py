"""Masked segment ops over padded edge lists.

The aggregation primitives behind every GNN conv in this framework: a hop's
padded COO (EdgeBlock) is reduced target-wise with the padding masked via
iota-vs-count comparison — the static-shape equivalent of the dynamic
SpMM/scatter the reference delegates to PyG/torch_scatter. All ops are pure
jnp (XLA scatter/segment lowering); the Pallas fused gather-aggregate kernel
(ops/pallas_aggregate.py) plugs in behind the same signatures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def valid_mask(length: int, count) -> jnp.ndarray:
    """[length] bool: True for slots < count. TPU-safe (2D iota internally)."""
    return jax.lax.broadcasted_iota(jnp.int32, (length,), 0) < count


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather x[idx] — routed through the Pallas DMA kernel when
    enabled (ops.pallas_gather.use_pallas_gather), XLA gather otherwise."""
    from .pallas_gather import gather_rows_auto

    return gather_rows_auto(x, idx)


def _segment_rowptr_sorted(dst: jnp.ndarray, count,
                           num_segments: int) -> jnp.ndarray:
    """[T+1] edge offsets per target for a nondecreasing dst array
    (padding == num_segments sorts after every real boundary)."""
    safe_dst = jnp.where(valid_mask(dst.shape[0], count), dst, num_segments)
    bounds = jax.lax.broadcasted_iota(jnp.int32, (num_segments + 1,), 0)
    return jnp.searchsorted(safe_dst, bounds, side="left").astype(jnp.int32)


def sorted_segment_sum_scan(values: jnp.ndarray, dst: jnp.ndarray, count,
                            num_segments: int) -> jnp.ndarray:
    """Segment sum over target-grouped edges as a DIFFERENCE OF PREFIX
    SUMS: cumsum along edges (vectorized associative scan) + two T-row
    gathers at the segment boundaries. On TPU, XLA lowers scatter-adds to
    a serialized while-loop (~40% of a training step at real sizes);
    this formulation has no scatter at all — its backward is a reversed
    cumsum plus a tiny 2T-row scatter. fp32 accumulation.
    """
    rowptr = _segment_rowptr_sorted(dst, count, num_segments)
    c = jnp.cumsum(values.astype(jnp.float32), axis=0)
    pad_shape = (1,) + c.shape[1:]
    cpad = jnp.concatenate([jnp.zeros(pad_shape, c.dtype), c], axis=0)
    out = (jnp.take(cpad, rowptr[1:], axis=0)
           - jnp.take(cpad, rowptr[:-1], axis=0))
    return out.astype(values.dtype)


def masked_segment_sum(values: jnp.ndarray, dst: jnp.ndarray, count,
                       num_segments: int,
                       sorted_dst: bool = False) -> jnp.ndarray:
    """Scatter-add values[e] into out[dst[e]] for real edges (e < count).

    values: [E, F] (or [E]); dst: int32 [E]; count: scalar actual edge count.
    Padded edges are routed to segment `num_segments` (an extra dropped
    row). NOTE: the scan-based no-scatter formulation
    (sorted_segment_sum_scan) measured SLOWER than XLA's while-loop
    scatter at real sizes on v5e (33 vs 22 ms — the f32 cumsum
    materialization costs more than the scatter saves; PERF_NOTES.md), so
    sorted_dst only sets indices_are_sorted.
    """
    mask = valid_mask(dst.shape[0], count)
    safe_dst = jnp.where(mask, dst, num_segments)
    out = jax.ops.segment_sum(values, safe_dst, num_segments=num_segments + 1,
                              indices_are_sorted=sorted_dst)
    return out[:num_segments]


def segment_degrees_sorted(dst: jnp.ndarray, count,
                           num_segments: int) -> jnp.ndarray:
    """Per-target in-degree when dst is nondecreasing (the sampler's
    target-grouped layout, padding == num_segments): searchsorted + diff —
    no scatter. On TPU, scatters cost per ROW regardless of width, so this
    replaces a width-1 scatter over all E edges with two O(T log E) ops.
    """
    # clamp padding/tail beyond `count` to num_segments so it lands after
    # every real boundary (already true by construction; cheap belt+braces)
    safe_dst = jnp.where(valid_mask(dst.shape[0], count), dst, num_segments)
    bounds = jax.lax.broadcasted_iota(jnp.int32, (num_segments + 1,), 0)
    rowptr = jnp.searchsorted(safe_dst, bounds, side="left")
    return jnp.diff(rowptr)


def masked_segment_mean(values: jnp.ndarray, dst: jnp.ndarray, count,
                        num_segments: int,
                        sorted_dst: bool = False) -> jnp.ndarray:
    """Mean aggregation; zero for targets with no edges (PyG mean semantics)."""
    if sorted_dst:
        rowptr = _segment_rowptr_sorted(dst, count, num_segments)
        deg = jnp.diff(rowptr).astype(values.dtype)
        s = masked_segment_sum(values, dst, count, num_segments,
                               sorted_dst=True)
    else:
        mask = valid_mask(dst.shape[0], count)
        safe_dst = jnp.where(mask, dst, num_segments)
        ones = mask.astype(values.dtype)
        deg = jax.ops.segment_sum(
            ones, safe_dst, num_segments=num_segments + 1)[:num_segments]
        s = jax.ops.segment_sum(
            values, safe_dst, num_segments=num_segments + 1)[:num_segments]
    deg = jnp.maximum(deg, 1)
    if values.ndim > 1:
        deg = deg[:, None]
    return s / deg


def masked_segment_max(values: jnp.ndarray, dst: jnp.ndarray, count,
                       num_segments: int, neutral=None) -> jnp.ndarray:
    """Max aggregation; targets with no edges get `neutral` (default 0)."""
    mask = valid_mask(dst.shape[0], count)
    safe_dst = jnp.where(mask, dst, num_segments)
    out = jax.ops.segment_max(values, safe_dst, num_segments=num_segments + 1)
    has_edge = jax.ops.segment_sum(
        mask.astype(jnp.int32), safe_dst, num_segments=num_segments + 1)
    fill = jnp.asarray(0 if neutral is None else neutral, values.dtype)
    cond = has_edge > 0
    if values.ndim > 1:
        cond = cond[:, None]
    return jnp.where(cond, out, fill)[:num_segments]


def sorted_segment_softmax(logits: jnp.ndarray, dst: jnp.ndarray, count,
                           num_segments: int) -> jnp.ndarray:
    """Scatter- and gather-free per-target softmax for TARGET-GROUPED
    edges (dst nondecreasing — the sampler layout).

    Four segmented associative scans instead of segment_max/sum scatters
    (which XLA lowers to serialized while-loops on TPU): a forward and a
    backward segmented running-max give every edge its full-segment max
    (max(fwd, bwd)), and likewise fwd+bwd running sums of exp give the
    full-segment denominator (fwd + bwd − self). No indexed memory ops at
    all — pure scans + elementwise, which is the TPU-native shape of this
    computation.
    """
    E = dst.shape[0]
    mask = valid_mask(E, count)
    two_d = logits.ndim == 2
    lg = logits if two_d else logits[:, None]
    m = mask[:, None]
    neg = jnp.asarray(jnp.finfo(lg.dtype).min, lg.dtype)
    lg = jnp.where(m, lg, neg)

    # segment-start flags in forward / reverse traversal order
    start_f = jnp.concatenate(
        [jnp.ones(1, bool), dst[1:] != dst[:-1]])[:, None]
    start_r = jnp.concatenate(
        [(dst[:-1] != dst[1:]), jnp.ones(1, bool)])[:, None]

    def seg_scan(vals, starts, combine_op, reverse):
        def comb(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, combine_op(va, vb))

        _, out = jax.lax.associative_scan(
            comb, (jnp.broadcast_to(starts, vals.shape), vals),
            axis=0, reverse=reverse)
        return out

    fwd_max = seg_scan(lg, start_f, jnp.maximum, False)
    bwd_max = seg_scan(lg, start_r, jnp.maximum, True)
    seg_max = jnp.maximum(fwd_max, bwd_max)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0)
    ex = jnp.where(m, jnp.exp(lg - seg_max), 0)
    fwd_sum = seg_scan(ex, start_f, jnp.add, False)
    bwd_sum = seg_scan(ex, start_r, jnp.add, True)
    denom = jnp.maximum(fwd_sum + bwd_sum - ex,
                        jnp.asarray(1e-16, lg.dtype))
    att = ex / denom
    return att if two_d else att[:, 0]


def segment_softmax_self(logits: jnp.ndarray, dst: jnp.ndarray, count,
                         num_segments: int, self_logit: jnp.ndarray,
                         sorted_dst: bool = True, return_stats: bool = False):
    """Per-target softmax over incoming edges PLUS one implicit self-loop
    logit per target.

    Reference-parity primitive: PyG's GATConv defaults to
    ``add_self_loops=True``, which on the reference's bipartite MFG
    SparseTensor calls ``set_diag`` — every target also attends to itself
    (input row i < T IS target i under the prefix convention). The
    reference instantiates GATConv with the default
    (driver/models.py:197-204), so attention normalizes over sampled
    edges + the self edge.

    logits: [E, H]; self_logit: [T, H]. Returns (att [E, H], self_att
    [T, H]) with padded edges → 0 and empty targets → self_att 1.
    Numerically stable: per-edge weights renormalize against
    max(segment max, self logit). Sorted path is scan-based (no
    scatters); only [E]- and [T]-row gathers remain.
    """
    E = dst.shape[0]
    mask = valid_mask(E, count)
    m = mask[:, None]
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    lg = jnp.where(m, logits, neg)
    safe_dst = jnp.where(mask, dst, num_segments)

    if sorted_dst:
        start_f = jnp.concatenate(
            [jnp.ones(1, bool), dst[1:] != dst[:-1]])[:, None]
        start_r = jnp.concatenate(
            [(dst[:-1] != dst[1:]), jnp.ones(1, bool)])[:, None]

        def seg_scan(vals, starts, combine_op, reverse):
            def comb(a, b):
                fa, va = a
                fb, vb = b
                return fa | fb, jnp.where(fb, vb, combine_op(va, vb))

            _, out = jax.lax.associative_scan(
                comb, (jnp.broadcast_to(starts, vals.shape), vals),
                axis=0, reverse=reverse)
            return out

        seg_max = jnp.maximum(seg_scan(lg, start_f, jnp.maximum, False),
                              seg_scan(lg, start_r, jnp.maximum, True))
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, neg)
        ex = jnp.where(m, jnp.exp(lg - jnp.where(jnp.isfinite(seg_max),
                                                 seg_max, 0)), 0)
        den = (seg_scan(ex, start_f, jnp.add, False)
               + seg_scan(ex, start_r, jnp.add, True) - ex)
        # per-target M/S via the first edge of each segment
        rowptr = _segment_rowptr_sorted(dst, count, num_segments)
        first = jnp.minimum(rowptr[:-1], E - 1)
        has_edge = rowptr[1:] > rowptr[:-1]
        M_t = jnp.take(seg_max, first, axis=0)
        S_t = jnp.take(den, first, axis=0)
    else:
        seg_max_t = jax.ops.segment_max(lg, safe_dst,
                                        num_segments=num_segments + 1)
        has_edge = (jax.ops.segment_sum(
            mask.astype(jnp.int32), safe_dst,
            num_segments=num_segments + 1) > 0)[:num_segments]
        M_full = jnp.where(jnp.isfinite(seg_max_t), seg_max_t, neg)
        ex = jnp.where(
            m, jnp.exp(lg - jnp.where(jnp.isfinite(seg_max_t), seg_max_t,
                                      0)[safe_dst]), 0)
        S_full = jax.ops.segment_sum(ex, safe_dst,
                                     num_segments=num_segments + 1)
        M_t, S_t = M_full[:num_segments], S_full[:num_segments]
        seg_max = M_full[safe_dst]
        den = S_full[safe_dst]
    he = has_edge[:, None] if has_edge.ndim == 1 else has_edge
    M_t = jnp.where(he, M_t, neg)
    S_t = jnp.where(he, S_t, 0)
    # per-target totals with the self term folded in
    m_t = jnp.maximum(M_t, self_logit)
    scale_t = jnp.where(he, jnp.exp(M_t - m_t), 0)
    self_ex = jnp.exp(self_logit - m_t)
    D_t = jnp.maximum(S_t * scale_t + self_ex,
                      jnp.asarray(1e-16, lg.dtype))
    self_att = self_ex / D_t
    # per-edge attention rescaled to the self-inclusive normalizer
    c_t = scale_t / D_t                       # [T, H]
    c_pad = jnp.concatenate([c_t, jnp.zeros_like(c_t[:1])], axis=0)
    att = ex * jnp.take(c_pad, safe_dst, axis=0)
    if return_stats:
        # (m_t, D_t) fully determine the normalizer: att_e for any edge
        # order is exp(z_e - m_t[dst_e]) / D_t[dst_e] — the residuals the
        # scatter-free GAT backward (ops/gat_agg.py) recomputes attention
        # from in src-sorted mirror order
        return att, self_att, m_t, D_t
    return att, self_att


def masked_segment_softmax(logits: jnp.ndarray, dst: jnp.ndarray, count,
                           num_segments: int,
                           sorted_dst: bool = False) -> jnp.ndarray:
    """Per-target softmax over incoming edges (GAT attention).

    logits: [E] or [E, H]; returns same shape with padded edges = 0.
    Numerically stable via segment max subtraction; empty segments are
    guarded against inf/NaN. With ``sorted_dst`` (the sampler's
    target-grouped layout) the scan-based scatter-free formulation is
    used instead of XLA segment_max/sum.
    """
    if sorted_dst:
        return sorted_segment_softmax(logits, dst, count, num_segments)
    mask = valid_mask(dst.shape[0], count)
    safe_dst = jnp.where(mask, dst, num_segments)
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    masked_logits = jnp.where(
        mask if logits.ndim == 1 else mask[:, None], logits, neg)
    seg_max = jax.ops.segment_max(masked_logits, safe_dst,
                                  num_segments=num_segments + 1)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0)
    ex = jnp.exp(masked_logits - seg_max[safe_dst])
    ex = jnp.where(mask if logits.ndim == 1 else mask[:, None], ex, 0)
    denom = jax.ops.segment_sum(ex, safe_dst, num_segments=num_segments + 1)
    denom = jnp.maximum(denom, jnp.asarray(1e-16, logits.dtype))
    return ex / denom[safe_dst]
