"""Static-shape padded mini-batch types.

The TPU-native replacement for the reference's dynamic PreparedBatch /
ProtoSample (fast_trainer/samplers.py:231-260, fast_sampler.cpp:180-227).
XLA compiles one program per shape, so batches are padded to the capacities
of a static ``BatchSpec`` bucket; actual sizes travel as scalar counts and
padding is masked with iota comparisons inside the jitted step.

Frontier layout (prefix property, mirroring the reference's cumulative
``n_ids`` in multilayer_sample, fast_sampler.cpp:191-227):

  n_id[:level_sizes[0]]  = seed nodes
  n_id[:level_sizes[l]]  = frontier after sampling hop l
  n_id[:level_sizes[L]]  = full receptive field (rows of the gathered x)

Edges of hop h (sampling order h=0..L-1) form a bipartite COO with
``dst`` indexing the hop's target frontier (level h) and ``src`` indexing
the grown frontier (level h+1). Models process hops outermost-first
(the reference reverses ``adjs``, fast_sampler.cpp:224), i.e. model layer i
uses hop L-1-i; `PaddedBatch.edges` is stored in *processing* order.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import numpy as np
from flax import struct


@dataclass(frozen=True)
class BatchSpec:
    """Static capacities for one batch bucket. Hashable → jit cache key."""

    fanouts: Tuple[int, ...]          # sampling order (seeds outward)
    seed_cap: int                     # max seeds per batch
    node_caps: Tuple[int, ...]        # len L+1; cap of cumulative frontier per level
    edge_caps: Tuple[int, ...]        # len L; per-hop edge capacity (sampling order)
    # emit the src-sorted mirror for the OUTERMOST hop too (default: hops
    # 0..L-2 only). Models that differentiate a projection of the raw
    # input — GAT (w_src·x), GCN/ARMA (x·W aggregated) — need layer-0
    # d_x, which without a mirror falls back to an unsorted scatter-add
    # over the LARGEST hop's edges. Incompatible with gsrc mode (the
    # outer hop's src slots are rewritten to global ids there).
    mirror_all: bool = False

    def __post_init__(self):
        L = len(self.fanouts)
        assert len(self.node_caps) == L + 1
        assert len(self.edge_caps) == L
        assert self.node_caps[0] >= self.seed_cap
        assert all(a <= b for a, b in zip(self.node_caps, self.node_caps[1:]))

    @property
    def num_hops(self) -> int:
        return len(self.fanouts)

    @property
    def total_node_cap(self) -> int:
        return self.node_caps[-1]

    @classmethod
    def worst_case(cls, batch_size: int, fanouts: Sequence[int],
                   align: int = 128) -> "BatchSpec":
        """Worst-case caps (no dedup). Explodes for big fanouts; use
        ``calibrate`` for real graphs — this exists for tiny tests."""
        def rnd(v):
            return max(align, int(math.ceil(v / align)) * align)

        node_caps = [batch_size]
        edge_caps = []
        for f in fanouts:
            assert f >= 0, "worst_case cannot bound full expansion"
            e = node_caps[-1] * f
            edge_caps.append(rnd(e))
            node_caps.append(rnd(node_caps[-1] + e))
        return cls(tuple(fanouts), batch_size, tuple(node_caps), tuple(edge_caps))

    def grown(self, factor: float = 1.3, align: int = 128,
              edge_align: int = 512) -> "BatchSpec":
        """A same-shape spec with caps scaled up (self-correction after a
        cap-overflow epoch — the reference never drops data, N9/N10;
        static shapes make the cap a compiled constant, so growth means a
        retrace, not a silent loss)."""
        def rnd(v, a):
            return max(a, int(math.ceil(v * factor / a)) * a)

        node_caps = [self.node_caps[0]]
        node_caps += [rnd(v, align) for v in self.node_caps[1:]]
        for i in range(1, len(node_caps)):
            node_caps[i] = max(node_caps[i], node_caps[i - 1])
        return BatchSpec(self.fanouts, self.seed_cap, tuple(node_caps),
                         tuple(rnd(v, edge_align) for v in self.edge_caps))

    @classmethod
    def from_measurements(cls, batch_size: int, fanouts: Sequence[int],
                          level_sizes_max: Sequence[int],
                          edge_counts_max: Sequence[int],
                          safety: float = 1.3, align: int = 128,
                          edge_align: int = 512) -> "BatchSpec":
        def rnd(v, a):
            return max(a, int(math.ceil(v * safety / a)) * a)

        node_caps = [max(batch_size, int(level_sizes_max[0]))]
        node_caps += [rnd(v, align) for v in level_sizes_max[1:]]
        # caps must stay monotone after rounding
        for i in range(1, len(node_caps)):
            node_caps[i] = max(node_caps[i], node_caps[i - 1])
        # edge caps align to the MXU segment kernel's DMA chunk so the hot
        # path never pads (ops/mxu_segment.py G)
        edge_caps = [rnd(v, edge_align) for v in edge_counts_max]
        return cls(tuple(fanouts), batch_size, tuple(node_caps), tuple(edge_caps))


# Models that differentiate a PROJECTION of the raw input: GCN/ARMA
# (x·W aggregated) need layer-0 d_x, so their specs emit the outermost
# hop's src-sorted mirror too (mirror-backed backward over the largest
# hop). SAGE-family models never need it (their layer-0 input carries no
# gradient through the aggregation's src side). GAT consumes mirrors
# only under the opt-in custom-VJP attention block
# (ops/gat_agg.gat_custom_agg_enabled — measured slower than autodiff on
# v5e, default off), so its specs stay mirror-free by default.
MIRROR_ALL_MODELS = ("GCN", "ARMA")


def mirror_all_specs(model_name: str, spec: "BatchSpec",
                     tight: "BatchSpec" = None):
    """Apply the model-dependent ``mirror_all`` flag to a calibrated
    (spec, tight) pair — shared by the single-chip Trainer and the SPMD
    DistributedTrainer so the mirror-backed layer-0 backward runs on both
    paths (the reference's models are identical under DDP,
    driver/drivers/ddp.py:344-351). Mutually exclusive with gsrc mode,
    which only SAGE-family models enable (sampling/cpp.py asserts)."""
    import dataclasses

    from ..ops.gat_agg import gat_custom_agg_enabled

    if model_name in MIRROR_ALL_MODELS or (
            model_name == "GAT" and gat_custom_agg_enabled()):
        spec = dataclasses.replace(spec, mirror_all=True)
        if tight is not None:
            tight = dataclasses.replace(tight, mirror_all=True)
    return spec, tight


def _unpack24(lo, hi):
    import jax.numpy as jnp

    v = lo.astype(jnp.int32)
    if hi is not None:
        v = v | (hi.astype(jnp.int32) << 16)
    return v


class EdgeBlock(struct.PyTreeNode):
    """One hop's padded bipartite COO, target-grouped (dst nondecreasing,
    pads = out-level cap). ``msrc/mdst`` is the src-sorted mirror of the
    same edges (msrc ascending, pads = in-level cap) used by the
    scatter-free backward aggregation (ops/mxu_segment.py); it is omitted
    (None) for the outermost hop, whose raw-feature input carries no
    gradient."""

    src: "np.ndarray"     # int32 [E_cap] — index into input frontier
    dst: "np.ndarray"     # int32 [E_cap] — index into output (target) frontier
    count: "np.ndarray"   # int32 [] — actual number of edges
    msrc: "np.ndarray" = None   # int32 [E_cap] sorted srcs (or None)
    mdst: "np.ndarray" = None   # int32 [E_cap] dsts in msrc order (or None)
    # wire-compressed dst: per-target in-batch degrees (uint8 [out_cap];
    # degree <= fanout <= 127). When present, ``dst`` ships as None and is
    # reconstructed on device by one searchsorted over cumsum(ddeg) —
    # whose out-of-range result is exactly the pad convention (== out_cap)
    ddeg: "np.ndarray" = None
    # wire-packed index arrays (BatchBuffers.fill_pack): each int32 index
    # array ships as its low uint16 halves plus, only when the hop's value
    # range needs bits 16..23, a uint8 of the third byte (ids are < 2^24).
    # The matching int32 field ships as None and is rebuilt on device by
    # ``lo | hi << 16`` — a fused cast, ~free next to the H2D bytes saved
    # (int32 indices are ~75% of batch H2D once dst rides ddeg).
    src_lo: "np.ndarray" = None    # uint16 [E_cap]
    src_hi: "np.ndarray" = None    # uint8 [E_cap] or None (values < 2^16)
    msrc_lo: "np.ndarray" = None
    msrc_hi: "np.ndarray" = None
    mdst_lo: "np.ndarray" = None
    mdst_hi: "np.ndarray" = None

    @property
    def cap(self) -> int:
        a = self.src if self.src is not None else self.src_lo
        return a.shape[0]

    def decoded(self, E_cap: int):
        """Materialize wire-compressed fields (device-side)."""
        out = self
        if out.src_lo is not None:
            out = out.replace(
                src=_unpack24(out.src_lo, out.src_hi),
                msrc=(_unpack24(out.msrc_lo, out.msrc_hi)
                      if out.msrc_lo is not None else out.msrc),
                mdst=(_unpack24(out.mdst_lo, out.mdst_hi)
                      if out.mdst_lo is not None else out.mdst),
                src_lo=None, src_hi=None, msrc_lo=None, msrc_hi=None,
                mdst_lo=None, mdst_hi=None)
        if out.ddeg is None:
            return out
        import jax
        import jax.numpy as jnp

        bounds = jnp.cumsum(out.ddeg.astype(jnp.int32))
        e_iota = jax.lax.broadcasted_iota(jnp.int32, (E_cap,), 0)
        dst = jnp.searchsorted(bounds, e_iota, side="right"
                               ).astype(jnp.int32)
        return out.replace(dst=dst, ddeg=None)


class PaddedBatch(struct.PyTreeNode):
    """A fully-prepared, fixed-shape mini-batch (host numpy or device jnp).

    ``spec`` is static pytree metadata (part of the treedef): batches from
    the same bucket share a treedef, so jitted consumers compile once per
    bucket and can read capacities as Python ints.
    """

    n_id: "np.ndarray"          # int32 [node_caps[-1]] global ids, padded
    #                             with 0 (None when shipped wire-packed)
    level_sizes: "np.ndarray"   # int32 [L+1]
    edges: Tuple[EdgeBlock, ...]  # PROCESSING order: edges[i] = hop L-1-i
    y: "np.ndarray"             # int32 [seed_cap]
    seed_count: "np.ndarray"    # int32 []
    overflow: "np.ndarray"      # int32 [2] — (dropped_nodes, dropped_edges)
    # host-tier features (the reference's gpu_percent split,
    # driver/drivers/base.py:107-116): rows of frontier vertices whose
    # features live in host RAM, gathered by the sampler thread and shipped
    # with the batch. None on the all-HBM path.
    cold_rows: "np.ndarray" = None   # [cold_cap, F] feature rows
    cold_pos: "np.ndarray" = None    # int32 [cold_cap] frontier slots (pad=N_cap)
    cold_count: "np.ndarray" = None  # int32 []
    # fp8 cold wire (cold_fp8): cold_rows is a uint8 e4m3 payload and this
    # carries the per-row dequant scale (parallel/exchange.fp8_decode_rows)
    cold_scale: "np.ndarray" = None  # float32 [cold_cap] or None
    # GLOBAL src ids of the outermost hop (edges[0]); lets layer 0
    # aggregate straight from the HBM feature table so the frontier gather
    # shrinks to the level-(L-1) prefix — the level-L tail is only ever a
    # message source (single-host all-HBM path; see train/step.py)
    gsrc: "np.ndarray" = None        # int32 [edge_caps[L-1]] or None
    # wire-packed n_id (global ids < 2^24; see EdgeBlock packed fields)
    n_id_lo: "np.ndarray" = None     # uint16
    n_id_hi: "np.ndarray" = None     # uint8 or None (V < 2^16)
    spec: BatchSpec = struct.field(pytree_node=False, default=None)

    def decoded_n_id(self) -> "PaddedBatch":
        if self.n_id_lo is None:
            return self
        return self.replace(n_id=_unpack24(self.n_id_lo, self.n_id_hi),
                            n_id_lo=None, n_id_hi=None)

    @property
    def num_layers(self) -> int:
        return len(self.edges)

    def layer_caps(self, i: int) -> Tuple[int, int]:
        """(input_rows_cap, output_rows_cap) for model layer i (static)."""
        L = len(self.edges)
        return self.spec.node_caps[L - i], self.spec.node_caps[L - i - 1]

    def num_real_edges(self) -> int:
        return int(sum(int(e.count) for e in self.edges))
