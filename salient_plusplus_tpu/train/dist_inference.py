"""Mesh-sharded layerwise full-graph inference (distributed final test).

The reference implements layerwise inference single-GPU only and gates it
out of its own driver (driver/models.py:441-495; base.py:430-432 asserts
the path away). Here the partitioned trainer computes exact full-graph
embeddings shard-wise: each device propagates its own contiguous vertex
range chunk by chunk, gathering neighbor embeddings of the previous layer
through the same static-shape request/response all_to_all exchange the
training step uses (parallel/exchange.py). Per-layer embeddings stay
row-sharded over the mesh — O(V/k) HBM per device — so the whole model
zoo's exact inference scales with the pod.

Requires fully HBM-resident feature shards (hbm_fraction=1, the realistic
pod configuration: sharding is why the features fit); the trainer falls
back to batchwise eval otherwise, mirroring the single-host rule.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.inference import run_layerwise_zoo
from ..parallel.exchange import assemble_features
from ..parallel.mesh import DATA_AXIS
from ..sampling.batch import BatchSpec, EdgeBlock


class ShardedEngine:
    """run_layerwise_zoo propagation engine over a partitioned mesh.

    Static shapes are calibrated EXACTLY (not probabilistically): chunks
    are fixed contiguous id ranges, so the worst chunk's edge count and
    per-destination remote-neighbor count over the whole graph are
    computable host-side up front — overflow is impossible by
    construction (every process computes identical caps from the
    replicated graph structure).
    """

    def __init__(self, trainer, chunk: int = 2048, align: int = 128):
        assert trainer.hot_size is None, \
            "sharded layerwise inference needs HBM-resident shards"
        self.tr = trainer
        self.world = trainer.world
        self.S = int(trainer.part_offsets[1] - trainer.part_offsets[0])
        self.chunk = int(min(chunk, self.S))
        self.seed_cap = self.chunk
        rowptr = np.asarray(trainer.pg.rowptr)
        col = np.asarray(trainer.pg.col)
        offs = np.asarray(trainer.part_offsets, np.int64)
        deg = np.diff(rowptr)
        worst_e, worst_r = 0, align
        for d in range(self.world):
            lo, hi = int(offs[d]), int(offs[d + 1])
            for s in range(lo, hi, self.chunk):
                e = min(s + self.chunk, hi)
                worst_e = max(worst_e, int(deg[s:e].sum()))
                nb = np.unique(col[rowptr[s]:rowptr[e]])
                owner = np.searchsorted(offs[1:], nb, side="right")
                rem = owner != d
                if rem.any():
                    worst_r = max(worst_r, int(np.bincount(
                        owner[rem], minlength=self.world).max()))

        def al(v):
            return int(-(-v // align) * align)

        e_cap = al(worst_e) + align
        n_cap = al(self.chunk + worst_e) + align
        self.r_cap = al(worst_r)
        self.spec = BatchSpec((-1,), self.chunk, (self.chunk, n_cap),
                              (e_cap,))

    def full(self, fn, *arrays):
        """Full-graph (non-neighborhood) op on sharded arrays: jit so XLA
        keeps the row sharding (out-of-jit jnp ops reject non-addressable
        global arrays in multi-process runs)."""
        return jax.jit(fn)(*arrays)

    def propagate(self, core, emb, feat_out):
        """One exact full-graph layer, shard-wise: every device runs the
        same chunk count (equal partition sizes), so the exchange
        collectives inside each chunk program line up across the mesh —
        the N9/N10 equal-program invariant, free by construction."""
        tr = self.tr
        S, chunk, world = self.S, self.chunk, self.world
        r_cap = self.r_cap

        def f(emb_sh, out_sh, part_offsets, n_id, seed_local,
              src, dst, count, fcount):
            n_id, seed_local = n_id[0], seed_local[0]
            src, dst = src[0], dst[0]
            count, fcount = count[0], fcount[0]
            x, _ = assemble_features(emb_sh, n_id, fcount, part_offsets,
                                     DATA_AXIS, r_cap)
            h = core(x, EdgeBlock(src=src, dst=dst, count=count))
            # pad seed slots point at S → dropped by the scatter
            return out_sh.at[seed_local].set(h.astype(out_sh.dtype),
                                             mode="drop")

        sm = jax.shard_map(
            f, mesh=tr.mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_vma=False)
        step = jax.jit(sm, donate_argnums=(1,))

        out = jax.jit(
            lambda: jnp.zeros((world * S, feat_out), emb.dtype),
            out_shardings=tr.batch_sharding)()
        spec = self.spec
        for s0 in range(0, S, chunk):
            n_ids, seeds_l, srcs, dsts, counts, fcounts = \
                [], [], [], [], [], []
            for d in tr.local_ranks:
                lo = d * S + s0
                ids = np.arange(lo, min(lo + chunk, (d + 1) * S),
                                dtype=np.int64)
                b = tr.native.sample(spec, ids, rng_seed=1)
                assert b.overflow.tolist() == [0, 0]
                sl = np.full(chunk, S, np.int32)
                sl[: len(ids)] = (ids - d * S).astype(np.int32)
                eb = b.edges[0]
                n_ids.append(np.asarray(b.n_id))
                seeds_l.append(sl)
                srcs.append(np.asarray(eb.src))
                dsts.append(np.asarray(eb.dst))
                counts.append(np.int32(eb.count))
                fcounts.append(np.int32(b.level_sizes[-1]))
            args = tr._to_global(tuple(
                np.stack(a) for a in
                (n_ids, seeds_l, srcs, dsts, counts, fcounts)))
            out = step(emb, out, tr.part_offsets_dev, *args)
        return out


def layerwise_inference_spmd(trainer, chunk: int = 2048,
                             dtype=jnp.bfloat16,
                             batch_stats: Optional[Dict] = None):
    """Exact full-graph log-probs for every node, mesh-sharded
    [world·S, C]. ``trainer`` is a DistributedTrainer with HBM-resident
    shards (hbm_fraction=1)."""
    eng = ShardedEngine(trainer, chunk=chunk)
    params = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    bs = batch_stats
    if bs is None and trainer.state.batch_stats:
        bs = jax.tree_util.tree_map(np.asarray,
                                    trainer.state.batch_stats)
    return run_layerwise_zoo(
        trainer.cfg.model_name, params, trainer.cfg.num_layers,
        trainer.features, eng, dtype=dtype, batch_stats=bs)
