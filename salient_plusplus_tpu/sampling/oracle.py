"""Pure-numpy reference sampler — the test oracle.

Implements exactly the sampling semantics of the reference's
multilayer_sample (fast_sampler/fast_sampler.cpp:191-227 +
sample_cpu.hpp:25-143): per hop, every node of the *cumulative* frontier
samples up to ``fanout`` distinct neighbors uniformly without replacement
(fanout < 0 = take all); newly seen neighbors are appended to the frontier
via first-seen relabeling. The C++ production sampler (native/sampler.cpp)
is tested against this oracle: bit-exact in full-expansion mode (both
traverse targets in order and neighbors in CSR order), structurally in
sampled mode (different RNG streams).

Kept dependency-free (numpy only) so it doubles as the PyG-free
cross-check the reference lacked (SURVEY.md §4 implication (c)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from .batch import BatchSpec, EdgeBlock, PaddedBatch


@dataclass
class SampleResult:
    """Unpadded multilayer sample (sampling order)."""

    n_id: np.ndarray                  # int32 [n_L]
    level_sizes: List[int]            # [L+1]
    hops: List[Tuple[np.ndarray, np.ndarray]]  # per hop (dst, src) int32
    dropped_nodes: int = 0
    dropped_edges: int = 0


def _sample_row(neighbors: np.ndarray, fanout: int, rng: np.random.Generator):
    """Uniform without replacement; take-all when deg<=fanout or fanout<0."""
    deg = len(neighbors)
    if fanout < 0 or deg <= fanout:
        return neighbors
    # permutation-based; same distribution as Robert Floyd in the native code
    return neighbors[rng.choice(deg, size=fanout, replace=False)]


def multilayer_sample_np(
    rowptr: np.ndarray,
    col: np.ndarray,
    seeds: np.ndarray,
    fanouts: Sequence[int],
    rng: np.random.Generator | None = None,
    node_caps: Sequence[int] | None = None,
    edge_caps: Sequence[int] | None = None,
) -> SampleResult:
    rng = rng or np.random.default_rng(0)
    n_id: List[int] = [int(s) for s in seeds]
    n_id_map = {int(s): i for i, s in enumerate(seeds)}
    assert len(n_id_map) == len(n_id), "duplicate seeds"
    level_sizes = [len(n_id)]
    hops = []
    dropped_nodes = dropped_edges = 0

    for h, fanout in enumerate(fanouts):
        frontier_size = len(n_id)
        node_cap = node_caps[h + 1] if node_caps is not None else None
        edge_cap = edge_caps[h] if edge_caps is not None else None
        dsts: List[int] = []
        srcs: List[int] = []
        for i in range(frontier_size):
            n = n_id[i]
            row = col[rowptr[n]:rowptr[n + 1]]
            chosen = _sample_row(row, fanout, rng)
            for c in chosen:
                c = int(c)
                j = n_id_map.get(c)
                if j is None:
                    if node_cap is not None and len(n_id) >= node_cap:
                        dropped_nodes += 1
                        continue
                    j = len(n_id)
                    n_id_map[c] = j
                    n_id.append(c)
                if edge_cap is not None and len(dsts) >= edge_cap:
                    dropped_edges += 1
                    continue
                dsts.append(i)
                srcs.append(j)
        hops.append((np.asarray(dsts, np.int32), np.asarray(srcs, np.int32)))
        level_sizes.append(len(n_id))

    return SampleResult(
        n_id=np.asarray(n_id, np.int32),
        level_sizes=level_sizes,
        hops=hops,
        dropped_nodes=dropped_nodes,
        dropped_edges=dropped_edges,
    )


def pad_sample(sample: SampleResult, spec: BatchSpec,
               y_global: np.ndarray) -> PaddedBatch:
    """Pad an unpadded sample into the static bucket + slice labels."""
    L = spec.num_hops
    assert len(sample.hops) == L
    n_id = np.zeros(spec.total_node_cap, np.int32)
    n = len(sample.n_id)
    assert n <= spec.total_node_cap
    n_id[:n] = sample.n_id

    edges = []
    for h in reversed(range(L)):  # processing order
        dst, src = sample.hops[h]
        cap = spec.edge_caps[h]
        e = len(dst)
        assert e <= cap, (e, cap)
        psrc = np.zeros(cap, np.int32)
        # dst padding = out-level cap: keeps dst nondecreasing and
        # self-dropping in segment reductions (matches the native sampler)
        pdst = np.full(cap, spec.node_caps[h], np.int32)
        psrc[:e] = src
        pdst[:e] = dst
        edges.append(EdgeBlock(src=psrc, dst=pdst, count=np.int32(e)))

    seed_count = sample.level_sizes[0]
    y = np.zeros(spec.seed_cap, np.int32)
    y[:seed_count] = y_global[sample.n_id[:seed_count]]

    return PaddedBatch(
        n_id=n_id,
        level_sizes=np.asarray(sample.level_sizes, np.int32),
        edges=tuple(edges),
        y=y,
        seed_count=np.int32(seed_count),
        overflow=np.asarray([sample.dropped_nodes, sample.dropped_edges], np.int32),
        spec=spec,
    )
