"""Multi-constraint graph partitioning (METIS-equivalent role).

The reference shells out to 64-bit METIS with 4-constraint node weights
[is_train, is_valid, is_other, degree] and ubvec 1.001
(partitioners/run_4constraint_partition.py:24-37, partition.py:67-81) to
balance train seeds, validation seeds, remaining vertices and edges across
partitions simultaneously while minimizing cut edges. METIS is not
available in this image, so the same contract is provided by:

  1. a BFS-grown seeded initial partition (locality-aware),
  2. a constrained label-propagation refinement that only accepts moves
     keeping every constraint within the imbalance bound.

Quality is verified relative to random partitioning in tests (cut fraction
must drop substantially) rather than against METIS bit-for-bit. If pymetis
is installed it is used instead for the initial partition.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def get_4d_node_weights(num_nodes: int, rowptr: np.ndarray,
                        train_idx: np.ndarray, valid_idx: np.ndarray
                        ) -> np.ndarray:
    """[V, 4] weights: is_train, is_valid, is_other, degree
    (run_4constraint_partition.py:24-37 parity)."""
    w = np.zeros((num_nodes, 4), np.float64)
    w[train_idx, 0] = 1
    w[valid_idx, 1] = 1
    w[:, 2] = 1
    w[train_idx, 2] = 0
    w[valid_idx, 2] = 0
    w[:, 3] = np.diff(rowptr)
    return w


def random_partition(num_nodes: int, k: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, k, size=num_nodes).astype(np.int32)


def contiguous_partition(num_nodes: int, k: int) -> np.ndarray:
    return (np.arange(num_nodes, dtype=np.int64) * k // num_nodes
            ).astype(np.int32)


def _bfs_grow(rowptr, col, k: int, weights, caps, seed: int) -> np.ndarray:
    """Seeded multi-source BFS growth: k frontiers grab vertices round-robin,
    each respecting its per-constraint capacity."""
    V = len(rowptr) - 1
    rng = np.random.default_rng(seed)
    labels = np.full(V, -1, np.int32)
    loads = np.zeros((k, weights.shape[1]))
    from collections import deque

    frontiers = [deque() for _ in range(k)]
    seeds = rng.choice(V, size=k, replace=False)
    for p, s in enumerate(seeds):
        labels[s] = p
        loads[p] += weights[s]
        frontiers[p].append(s)

    unassigned = V - k
    stalled = 0
    while unassigned > 0:
        progressed = False
        for p in range(k):
            grabbed = 0
            budget = max(1, unassigned // (4 * k))
            while frontiers[p] and grabbed < budget:
                u = frontiers[p].popleft()
                for v in col[rowptr[u]:rowptr[u + 1]]:
                    if labels[v] != -1:
                        continue
                    if np.any(loads[p] + weights[v] > caps):
                        continue
                    labels[v] = p
                    loads[p] += weights[v]
                    frontiers[p].append(v)
                    unassigned -= 1
                    grabbed += 1
                    progressed = True
        if not progressed:
            # disconnected remainder: reseed each partition with the least
            # loaded constraint-feasible unassigned vertex
            rest = np.flatnonzero(labels == -1)
            if len(rest) == 0:
                break
            order = np.argsort(loads.sum(axis=1))
            placed = False
            for p in order:
                for v in rest:
                    if labels[v] == -1 and not np.any(
                            loads[p] + weights[v] > caps):
                        labels[v] = p
                        loads[p] += weights[v]
                        frontiers[p].append(v)
                        unassigned -= 1
                        placed = True
                        break
                if placed:
                    break
            if not placed:  # capacities exhausted: force least-loaded
                p = int(np.argmin(loads[:, 3]))
                v = rest[0]
                labels[v] = p
                loads[p] += weights[v]
                frontiers[p].append(v)
                unassigned -= 1
    return labels


def _refine(rowptr, col, labels, k, weights, caps, passes: int = 4,
            seed: int = 0) -> np.ndarray:
    """Constrained label propagation: move a vertex to the neighbor-majority
    partition iff every constraint stays under its cap (the same idea as the
    reference's experimental refine_partition, eval_quality.py:648-715, but
    capacity-safe)."""
    V = len(rowptr) - 1
    labels = labels.copy()
    loads = np.zeros((k, weights.shape[1]))
    np.add.at(loads, labels, weights)
    rng = np.random.default_rng(seed)
    for _ in range(passes):
        moved = 0
        order = rng.permutation(V)
        for u in order:
            row = col[rowptr[u]:rowptr[u + 1]]
            if len(row) == 0:
                continue
            cnt = np.bincount(labels[row], minlength=k)
            cur = labels[u]
            best = int(np.argmax(cnt))
            if best == cur or cnt[best] <= cnt[cur]:
                continue
            if np.any(loads[best] + weights[u] > caps):
                continue
            loads[cur] -= weights[u]
            loads[best] += weights[u]
            labels[u] = best
            moved += 1
        if moved < V // 1000:
            break
    return labels


def multiconstraint_partition(
    rowptr: np.ndarray, col: np.ndarray, k: int,
    node_weights: Optional[np.ndarray] = None,
    imbalance: float = 1.05, seed: int = 0, refine_passes: int = 4,
) -> np.ndarray:
    """k-way multi-constraint partition labels [V] (metis_partition parity,
    partitioners/partition.py:67-81). ``imbalance`` is the per-constraint
    cap multiplier (METIS ubvec analog; looser than METIS's 1.001 — the
    heuristic needs slack, and the SPMD layer pads shards anyway)."""
    V = len(rowptr) - 1
    if node_weights is None:
        node_weights = np.stack(
            [np.ones(V), np.diff(rowptr)], axis=1).astype(np.float64)
    try:
        import pymetis  # optional, not in this image

        adj = [col[rowptr[i]:rowptr[i + 1]].tolist() for i in range(V)]
        _, labels = pymetis.part_graph(k, adjacency=adj)
        return np.asarray(labels, np.int32)
    except ImportError:
        pass
    caps = node_weights.sum(axis=0) / k * imbalance + node_weights.max(axis=0)
    labels = _bfs_grow(rowptr, col, k, node_weights, caps, seed)
    labels = _refine(rowptr, col, labels, k, node_weights, caps,
                     refine_passes, seed)
    return labels


def partition_quality(rowptr, col, labels, node_weights=None) -> dict:
    """Cut fraction + per-constraint imbalance diagnostics."""
    V = len(rowptr) - 1
    rows = np.repeat(np.arange(V, dtype=np.int32),
                     np.diff(rowptr).astype(np.int64))
    cut = (labels[rows] != labels[col]).sum()
    out = {"cut_fraction": float(cut / max(len(col), 1))}
    if node_weights is not None:
        k = int(labels.max()) + 1
        loads = np.zeros((k, node_weights.shape[1]))
        np.add.at(loads, labels, node_weights)
        mean = node_weights.sum(axis=0) / k
        out["max_imbalance"] = float(
            np.max(loads / np.maximum(mean, 1e-12)))
    return out
