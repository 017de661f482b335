"""Scatter-free GAT attention aggregation (forward + hand-derived VJP).

The reference's GATConv (driver/models.py:197-244, PyG gat_conv.py
semantics with ``add_self_loops=True``) autodiffs its backward, which on
XLA turns every gather-by-src in the forward into a scatter-add over
UNSORTED src indices — the per-edge [E, H*C] d_xs scatter alone is
~15-20% of GAT step time at bench shapes (PERF_NOTES round-4).

This module replaces the whole attention-weighted aggregation block with
one ``jax.custom_vjp`` whose backward contains NO wide scatter:

  fwd:  z    = leaky_relu(a_src[src] + a_dst[dst])            (H-wide)
        att  = softmax_per_target(z ∪ z_self)                 (scan-based)
        out  = segsum_dst(att · xs[src]) + self_att · xt      (MXU kernel)
        residuals: per-target (m, D) — the softmax max/denominator —
        plus self_att and the f32 out.
  bwd:  S    = <g, out> per (target, head)   — the softmax-backward
               segment reduction collapses to an elementwise dot because
               d att_e = <g_dst, xs_src> makes Σ att·datt = <g, out>.
        attention is RECOMPUTED in src-sorted mirror order from (m, D):
        att_m = exp(z_m - m[mdst]) / D[mdst]  — all gathers — so
        d_xs  = segsum_msrc(att_m · g[mdst])                  (MXU kernel)
        d_a_src = segsum_msrc(dz_m)                           (sorted, H-wide)
        d_a_dst = segsum_mdst(dz_m)          (unsorted but only H-wide)

The only remaining scatter is the H-wide d_a_dst (H ≤ 8); every [E, H*C]
op is a gather or the sorted-COO MXU segment kernel. Requires the hop's
src-sorted mirror (EdgeBlock.msrc/mdst) and ``add_self_loops=True`` (the
reference's default); callers fall back to the autodiff path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import mxu_segment
from .segment import masked_segment_sum, segment_softmax_self, valid_mask


def gat_custom_agg_enabled() -> bool:
    """Gate for the custom-VJP attention block. DEFAULT OFF: the round-5
    on-chip A/B (experiments/gat_bwd_diag.py, real v5e) measured the
    autodiff path at 42.2 ms fwd+bwd vs 109.2 ms for this backward at the
    outer-hop shape (N=560k, T=66k, E=660k; mid hop 6.4 vs 14.6 ms) — the
    'scatter-free' reformulation LOSES ~2.6x: its five per-edge gathers
    each cost a full (8,128) tile read (~9.7 ns/row), while XLA's
    unsorted scatter-add in the autodiff backward is far cheaper than the
    round-1 scatter folklore predicted (~10 ms for the whole outer-hop
    backward). Kept as an opt-in (SPTPU_GAT_CUSTOM_VJP=1) with its parity
    tests — a recorded negative result, not a deletion."""
    import os

    return os.environ.get("SPTPU_GAT_CUSTOM_VJP", "") == "1"


def _lrelu(x, ns):
    return jnp.where(x > 0, x, ns * x)


def _dlrelu(x, ns):
    return jnp.where(x > 0, 1.0, ns)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def gat_attention_agg(out_cap: int, negative_slope: float,
                      xs, xt, a_src, a_dst, src, dst, count, msrc, mdst):
    """out[t] = Σ_{e: dst_e=t} att_e · xs[src_e] + self_att_t · xt[t].

    xs: [N_in, H, C] (bf16), xt: [T, H, C]; a_src: [N_in, H] f32 per-source
    logit term, a_dst: [T, H]; src/dst target-grouped sorted COO (pads:
    dst == out_cap), msrc/mdst its src-sorted mirror (pads: msrc == N_in).
    Self-loops are always included (PyG default the reference uses).
    Returns [T, H, C] in xs.dtype.
    """
    out, _ = _gat_fwd(out_cap, negative_slope, xs, xt, a_src, a_dst,
                      src, dst, count, msrc, mdst)
    return out


def _gat_fwd(out_cap, ns, xs, xt, a_src, a_dst, src, dst, count,
             msrc, mdst):
    T = out_cap
    E = src.shape[0]
    N, H, C = xs.shape
    raw = (jnp.take(a_src, src, axis=0)
           + jnp.take(a_dst, jnp.minimum(dst, T - 1), axis=0))  # [E, H]
    z = _lrelu(raw, ns)
    z_self = _lrelu(a_src[:T] + a_dst, ns)                      # [T, H]
    att, self_att, m_t, d_t = segment_softmax_self(
        z, dst, count, T, z_self, sorted_dst=True, return_stats=True)
    msg = jnp.take(xs.reshape(N, H * C), src, axis=0).reshape(E, H, C)
    msg = msg * att[:, :, None].astype(xs.dtype)
    out32 = mxu_segment.sorted_segment_sum_mxu(
        msg.reshape(E, H * C), dst, T,
        interpret=mxu_segment._INTERPRET).reshape(T, H, C)
    out32 = out32 + self_att[:, :, None] * xt.astype(jnp.float32)
    res = (m_t, d_t, self_att, out32, xs, xt, a_src, a_dst,
           src, dst, count, msrc, mdst)
    return out32.astype(xs.dtype), res


def _gat_bwd(out_cap, ns, res, d_out):
    (m_t, d_t, self_att, out32, xs, xt, a_src, a_dst,
     src, dst, count, msrc, mdst) = res
    T = out_cap
    N, H, C = xs.shape
    E = msrc.shape[0]
    g = d_out.astype(jnp.float32)                               # [T, H, C]

    # softmax-backward segment sum, collapsed: S_t = Σ_e att·datt +
    # self_att·dself_att = <g_t, out_t>
    s_t = (g * out32).sum(-1)                                   # [T, H]

    # self-loop leg (no edges involved)
    d_xt = (g * self_att[:, :, None]).astype(xt.dtype)
    dself_att = (g * xt.astype(jnp.float32)).sum(-1)            # [T, H]
    raw_self = a_src[:T] + a_dst
    draw_self = (self_att * (dself_att - s_t)) * _dlrelu(raw_self, ns)

    # mirror (src-sorted) pass: recompute attention from (m, D), then
    # every edge-indexed reduction is over SORTED msrc. An XLA row gather
    # costs a full (8,128) tile read per row REGARDLESS of row width
    # (PERF_NOTES "chained microbenchmarks"), so all four target-side
    # per-edge operands — a_dst, m, D, S — ride ONE [E, 4H] gather
    # instead of four thin ones.
    mm = valid_mask(E, count)
    ms = jnp.minimum(msrc, N - 1)
    md = jnp.minimum(mdst, T - 1)
    tstats = jnp.concatenate([a_dst, m_t, d_t, s_t], axis=1)    # [T, 4H]
    st = jnp.take(tstats, md, axis=0)                           # [E, 4H]
    a_dst_m, m_m, d_m, s_m = (st[:, :H], st[:, H:2 * H],
                              st[:, 2 * H:3 * H], st[:, 3 * H:])
    raw_m = jnp.take(a_src, ms, axis=0) + a_dst_m
    z_m = _lrelu(raw_m, ns)
    att_m = jnp.where(mm[:, None], jnp.exp(z_m - m_m) / d_m, 0.0)
    g_m = jnp.take(g.reshape(T, H * C).astype(xs.dtype), md,
                   axis=0).reshape(E, H, C)
    d_msg = att_m[:, :, None].astype(xs.dtype) * g_m
    d_xs = mxu_segment.sorted_segment_sum_mxu(
        d_msg.reshape(E, H * C), msrc, N,
        interpret=mxu_segment._INTERPRET).reshape(N, H, C).astype(xs.dtype)

    xs_m = jnp.take(xs.reshape(N, H * C), ms, axis=0).reshape(E, H, C)
    datt_m = (g_m.astype(jnp.float32) * xs_m.astype(jnp.float32)).sum(-1)
    dz_m = att_m * (datt_m - s_m)
    draw_m = dz_m * _dlrelu(raw_m, ns)                          # [E, H]

    d_a_src = masked_segment_sum(draw_m, msrc, count, N, sorted_dst=True)
    d_a_src = d_a_src.at[:T].add(draw_self)
    d_a_dst = masked_segment_sum(draw_m, md, count, T) + draw_self

    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (d_xs, d_xt, d_a_src.astype(a_src.dtype),
            d_a_dst.astype(a_dst.dtype),
            f0(src), f0(dst), f0(count), f0(msrc), f0(mdst))


gat_attention_agg.defvjp(_gat_fwd, _gat_bwd)
