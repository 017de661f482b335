"""Vertex Inclusion Probability (VIP) estimators and cache generation.

Re-implementation of the reference's curated VIP library (caching/vip.py)
— the MLSys'23 paper's probabilistic neighborhood-expansion analysis. All
estimators return, per partition, a V-length weight vector; higher weight =
more likely that partition's sampler touches the vertex, so its feature row
is worth caching locally.

The analytical model (caching/vip.py:123-180 in the reference) is the
per-hop recurrence over the symmetric graph

    p_hop[v] ← 1 − exp( Σ_{u∈N(v)} log(1 − min(1, fanout/deg(u))·p_hop[u]) )
    p_total  ← 1 − Π_hops (1 − p_hop)

seeded with p_hop = minibatch/|train_p| on partition p's training vertices.
Pure tensor math: a numpy edition for offline tooling and a chunked jnp
edition (`vip_analytical_device`) that streams edge blocks through a
lax.scan — the XLA counterpart of the reference's prefetch-stream GPU
variant (caching/vip.py:185-271, driver/drivers/ddp.py:133-239).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

VIP_SCHEMES = (
    "vip-analytical", "vip-analytical-device", "vip-simulation",
    "vip-analytical-taylor", "vip-analytical-cascade",
    "vip-analytical-taylor-cascade", "random-multiwalk", "shuffle",
    "degree-reachable", "num-paths-reachable", "halo-1hop", "random-walk",
    "oracle", "degree",
)


def vertex_indegrees(rowptr: np.ndarray) -> np.ndarray:
    return np.diff(rowptr)


def _edge_rows(rowptr: np.ndarray) -> np.ndarray:
    V = len(rowptr) - 1
    return np.repeat(np.arange(V, dtype=np.int32),
                     np.diff(rowptr).astype(np.int64))


def partitionwise_train_idx(partition_ids: np.ndarray,
                            train_idx: np.ndarray) -> List[np.ndarray]:
    """Split global train ids by owning partition (caching/util.py analog)."""
    k = int(partition_ids.max()) + 1
    owner = partition_ids[train_idx]
    return [train_idx[owner == p] for p in range(k)]


def vip_analytical(rowptr: np.ndarray, col: np.ndarray,
                   train_idx_per_partition: Sequence[np.ndarray],
                   minibatch_size: int,
                   fanouts: Sequence[int],
                   taylor: bool = False, cascade: bool = False,
                   init_scale: Optional[float] = None) -> List[np.ndarray]:
    """Analytical VIP weights, numpy (reference caching/vip.py:123-180;
    variants from partitioners/eval_quality.py:248-295).

    taylor:  first-order approximation 1−exp(−Σ tw·p) of the exact
             1−exp(Σ log(1−tw·p)) recurrence (ddp.py:219-224).
    cascade: hop h also inherits hop h−1's probability (a vertex stays in
             the frontier once reached).
    init_scale: seed probability override (random-multiwalk uses 1/|train|
             instead of minibatch/|train|).

    NOTE (deliberate, reference parity): the hop-0 SEED access probability
    is not folded into p_total — only the L neighbor hops are (reference
    caching/vip.py:160-180 does the same). VIP weights rank REMOTE-access
    likelihood for caching, and a partition's own train seeds are local by
    construction, so their hop-0 accesses never cross the wire. The
    empirical schemes (simulation/oracle) do count seed accesses; the
    correlation test tolerates that known difference.
    """
    V = len(rowptr) - 1
    deg = vertex_indegrees(rowptr).astype(np.float64)
    rows = _edge_rows(rowptr)
    p_total_out = []
    for train_idx in train_idx_per_partition:
        p_hop = np.zeros(V, np.float64)
        if len(train_idx):
            p_hop[train_idx] = (init_scale if init_scale is not None
                                else minibatch_size / len(train_idx))
        p_not = np.ones(V, np.float64)
        for fanout in fanouts:
            with np.errstate(divide="ignore", invalid="ignore"):
                tw = np.minimum(1.0, fanout / deg)
            tw = np.nan_to_num(tw, nan=1.0, posinf=1.0)
            if taylor:
                s = np.bincount(rows, weights=tw[col] * p_hop[col],
                                minlength=V)
                if cascade:
                    s = s + p_hop
                p_hop = 1.0 - np.exp(-s)
            else:
                with np.errstate(divide="ignore"):
                    logs = np.log(
                        np.maximum(1.0 - tw[col] * p_hop[col], 1e-300))
                logsum = np.bincount(rows, weights=logs, minlength=V)
                if cascade:
                    logsum = logsum + np.log(
                        np.maximum(1.0 - p_hop, 1e-300))
                p_hop = 1.0 - np.exp(logsum)
            p_not *= 1.0 - p_hop
        p_total_out.append((1.0 - p_not).astype(np.float32))
    return p_total_out


def vip_analytical_device(rowptr: np.ndarray, col: np.ndarray,
                          train_idx_per_partition: Sequence[np.ndarray],
                          minibatch_size: int, fanouts: Sequence[int],
                          edge_chunk: int = 1 << 22) -> List[np.ndarray]:
    """Analytical VIP on device: edges streamed in fixed-size chunks through
    a lax.scan with a segment-sum accumulator (static shapes; the last chunk
    is padded with a sink row). Equivalent to `vip_analytical`."""
    import jax
    import jax.numpy as jnp

    V = len(rowptr) - 1
    E = len(col)
    deg = vertex_indegrees(rowptr).astype(np.float32)
    rows_np = _edge_rows(rowptr)
    n_chunks = max(1, -(-E // edge_chunk))
    pad_e = n_chunks * edge_chunk - E
    rows_p = np.concatenate([rows_np, np.full(pad_e, V, np.int32)])
    col_p = np.concatenate([col.astype(np.int32),
                            np.zeros(pad_e, np.int32)])
    rows_d = jnp.asarray(rows_p.reshape(n_chunks, edge_chunk))
    col_d = jnp.asarray(col_p.reshape(n_chunks, edge_chunk))
    deg_d = jnp.asarray(deg)

    @jax.jit
    def one_hop(p_hop, fanout):
        tw = jnp.minimum(1.0, fanout / jnp.maximum(deg_d, 1e-30))
        tw = jnp.where(deg_d > 0, tw, 1.0)

        def body(acc, chunk):
            r, c = chunk
            contrib = jnp.log(jnp.maximum(1.0 - tw[c] * p_hop[c], 1e-30))
            acc = acc + jax.ops.segment_sum(contrib, r, num_segments=V + 1)
            return acc, None

        logsum, _ = jax.lax.scan(body, jnp.zeros(V + 1, jnp.float32),
                                 (rows_d, col_d))
        return 1.0 - jnp.exp(logsum[:V])

    out = []
    for train_idx in train_idx_per_partition:
        p_hop = np.zeros(V, np.float32)
        if len(train_idx):
            p_hop[train_idx] = minibatch_size / len(train_idx)
        p_hop = jnp.asarray(p_hop)
        p_not = jnp.ones(V, jnp.float32)
        for fanout in fanouts:
            p_hop = one_hop(p_hop, float(fanout))
            p_not = p_not * (1.0 - p_hop)
        out.append(np.asarray(1.0 - p_not, np.float32))
    return out


def vip_simulation(rowptr: np.ndarray, col: np.ndarray,
                   train_idx_per_partition: Sequence[np.ndarray],
                   minibatch_size: int, fanouts: Sequence[int],
                   num_epochs: int = 2, seed: int = 0) -> List[np.ndarray]:
    """Empirical VIP: run the real sampler and count vertex accesses
    (reference caching/vip.py:276-289 → simulate_vertex_accesses)."""
    from .simulate import simulate_vertex_accesses

    return simulate_vertex_accesses(rowptr, col, train_idx_per_partition,
                                    fanouts, minibatch_size, num_epochs,
                                    seed=seed)


def vip_proxy_degree_reachable(rowptr, col, train_idx_per_partition,
                               num_hops: int) -> List[np.ndarray]:
    """deg(v) if v is within num_hops of the partition's train set else 0
    (reference caching/vip.py:294-324)."""
    V = len(rowptr) - 1
    deg = vertex_indegrees(rowptr)
    rows = _edge_rows(rowptr)
    out = []
    for train_idx in train_idx_per_partition:
        reach = np.zeros(V, np.int64)
        reach[train_idx] = 1
        for _ in range(num_hops):
            s = np.bincount(rows, weights=reach[col].astype(np.float64),
                            minlength=V)
            reach = (s != 0).astype(np.int64)
        out.append((reach * deg).astype(np.float32))
    return out


def vip_proxy_num_paths_reachable(rowptr, col, train_idx_per_partition,
                                  num_hops: int) -> List[np.ndarray]:
    """Cumulative path counts from the train set (caching/vip.py:329-357)."""
    V = len(rowptr) - 1
    rows = _edge_rows(rowptr)
    out = []
    for train_idx in train_idx_per_partition:
        num_paths = np.zeros(V, np.float64)
        num_paths[train_idx] = 1
        for _ in range(num_hops):
            num_paths = num_paths + np.bincount(
                rows, weights=num_paths[col], minlength=V)
        out.append(num_paths.astype(np.float32))
    return out


def vip_proxy_degree_1hop(rowptr, col, train_idx_per_partition
                          ) -> List[np.ndarray]:
    """1-hop halo indicator (caching/vip.py:362-387). Vectorized O(E):
    select the edges whose source row is a train vertex, mark their
    endpoints (a per-train-vertex slice loop took minutes at products
    scale)."""
    V = len(rowptr) - 1
    rows = _edge_rows(rowptr)
    out = []
    for train_idx in train_idx_per_partition:
        in_train = np.zeros(V, bool)
        in_train[train_idx] = True
        halo = np.zeros(V, bool)
        halo[col[in_train[rows]]] = True
        out.append(halo.astype(np.float32))
    return out


def vip_randomwalk(rowptr, col, train_idx_per_partition,
                   fanouts: Sequence[int]) -> List[np.ndarray]:
    """Random-walk probability accumulation (caching/vip.py:392-427)."""
    V = len(rowptr) - 1
    deg = vertex_indegrees(rowptr).astype(np.float64)
    rows = _edge_rows(rowptr)
    with np.errstate(divide="ignore"):
        tw = 1.0 / deg
    tw[~np.isfinite(tw)] = 0.0
    out = []
    for train_idx in train_idx_per_partition:
        p = np.zeros(V, np.float64)
        if len(train_idx):
            p[train_idx] = 1.0 / len(train_idx)
        for _ in range(len(fanouts)):
            p = p + np.bincount(rows, weights=tw[col] * p[col], minlength=V)
        out.append(p.astype(np.float32))
    return out


def argsort_vip(vip_weights_per_partition) -> List[np.ndarray]:
    """Partition-wise vertex ids in descending VIP order
    (caching/vip.py:437-448)."""
    return [np.argsort(-w, kind="stable") for w in vip_weights_per_partition]


def get_lambda_vip_cache(
    rowptr: np.ndarray, col: np.ndarray,
    partition_ids: np.ndarray, train_idx: np.ndarray,
    fanouts: Sequence[int], minibatch_size: int,
    scheme: str = "vip-analytical",
    actual_vertex_accesses: Optional[List[np.ndarray]] = None,
    num_iter_simulation: int = 2,
) -> Callable[[float], List[np.ndarray]]:
    """λ(replication_factor) → per-partition cached vertex ids
    (reference caching/vip.py:456-528). Own-partition vertices are zeroed
    before the argsort, so caches hold only remote rows."""
    V = len(partition_ids)
    k = int(partition_ids.max()) + 1
    tipp = partitionwise_train_idx(partition_ids, train_idx)

    if scheme == "vip-analytical":
        w = vip_analytical(rowptr, col, tipp, minibatch_size, fanouts)
    elif scheme == "vip-analytical-taylor":
        w = vip_analytical(rowptr, col, tipp, minibatch_size, fanouts,
                           taylor=True)
    elif scheme == "vip-analytical-cascade":
        w = vip_analytical(rowptr, col, tipp, minibatch_size, fanouts,
                           cascade=True)
    elif scheme == "vip-analytical-taylor-cascade":
        w = vip_analytical(rowptr, col, tipp, minibatch_size, fanouts,
                           taylor=True, cascade=True)
    elif scheme == "random-multiwalk":
        # eval_quality.py:264: exact recurrence seeded with 1/|train|
        w = [vip_analytical(rowptr, col, [ti], minibatch_size, fanouts,
                            init_scale=1.0 / max(len(ti), 1))[0]
             for ti in tipp]
    elif scheme == "shuffle":
        # random-permutation baseline (eval_quality.py:434-447)
        rng = np.random.default_rng(0)
        w = [rng.random(V).astype(np.float32) for _ in range(k)]
    elif scheme == "vip-analytical-device":
        w = vip_analytical_device(rowptr, col, tipp, minibatch_size, fanouts)
    elif scheme == "vip-simulation":
        w = vip_simulation(rowptr, col, tipp, minibatch_size, fanouts,
                           num_iter_simulation)
    elif scheme == "degree-reachable":
        w = vip_proxy_degree_reachable(rowptr, col, tipp, len(fanouts))
    elif scheme == "num-paths-reachable":
        w = vip_proxy_num_paths_reachable(rowptr, col, tipp, len(fanouts))
    elif scheme == "halo-1hop":
        w = vip_proxy_degree_1hop(rowptr, col, tipp)
    elif scheme == "random-walk":
        w = vip_randomwalk(rowptr, col, tipp, fanouts)
    elif scheme == "degree":
        deg = vertex_indegrees(rowptr).astype(np.float32)
        w = [deg.copy() for _ in range(k)]
    elif scheme == "oracle":
        assert actual_vertex_accesses is not None
        w = [np.array(a, np.float32) for a in actual_vertex_accesses]
    else:
        raise ValueError(f"Invalid caching scheme: {scheme}")

    for p in range(k):
        w[p] = w[p].copy()
        w[p][partition_ids == p] = 0
    order = argsort_vip(w)

    def cached_idx(replication_factor: float) -> List[np.ndarray]:
        size = int(V * replication_factor / k)
        return [order[p][:size].copy() for p in range(k)]

    return cached_idx
