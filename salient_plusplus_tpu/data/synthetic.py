"""Synthetic graph generators for tests and benchmarks.

The environment has no network egress, so OGB datasets cannot be downloaded;
these generators produce graphs with (a) realistic degree distributions for
throughput benchmarking at ogbn-arxiv / ogbn-products scale, and (b) planted
community structure with class-correlated features so end-to-end training
has a learnable signal (the accuracy-sanity analog of the reference's OGB
accuracy tracking, driver/main.py:188-245).
"""

from __future__ import annotations

import numpy as np

from .dataset import GraphData, symmetrize_csr


def planted_partition(
    name: str = "synth",
    num_nodes: int = 20_000,
    num_classes: int = 16,
    avg_degree: int = 12,
    p_intra: float = 0.7,
    num_features: int = 64,
    feature_noise: float = 1.0,
    seed: int = 0,
    x_dtype=np.float16,
    normalize: bool = False,
) -> GraphData:
    """Stochastic block model-ish graph with class-informative features.

    Each node draws ``avg_degree`` endpoints; a fraction ``p_intra`` land in
    the same class, the rest uniform. Features = class centroid + N(0, noise).
    A 2-3 hop GNN separates classes well above chance, so training-accuracy
    regressions are observable.

    ``normalize`` rescales features to unit total variance so raising
    ``feature_noise`` dials task hardness (signal fraction
    1/sqrt(1+noise^2)) WITHOUT growing the input scale — large-noise
    unnormalized inputs saturate the logits and collapse training, which
    measures optimization fragility, not graph learning. Use for
    non-saturating accuracy-tracking runs (docs/SCALE_RUN.md).
    """
    rng = np.random.default_rng(seed)
    V, C = num_nodes, num_classes
    y = rng.integers(0, C, size=V).astype(np.int32)

    n_draw = V * avg_degree
    src = rng.integers(0, V, size=n_draw).astype(np.int64)
    intra = rng.random(n_draw) < p_intra
    # same-class targets: pick a random node, then map into src's class bucket
    order = np.argsort(y, kind="stable")
    class_start = np.searchsorted(y[order], np.arange(C))
    class_count = np.bincount(y, minlength=C)
    r = rng.integers(0, 1 << 62, size=n_draw)
    same = order[class_start[y[src]] + (r % np.maximum(class_count[y[src]], 1))]
    unif = rng.integers(0, V, size=n_draw)
    dst = np.where(intra, same, unif).astype(np.int64)

    order_e = np.argsort(src, kind="stable")
    src, dst = src[order_e], dst[order_e]
    rowptr = np.zeros(V + 1, dtype=np.int64)
    np.add.at(rowptr, src + 1, 1)
    np.cumsum(rowptr, out=rowptr)
    rowptr, col = symmetrize_csr(rowptr, dst.astype(np.int32), V)

    centroids = rng.normal(0, 1, size=(C, num_features)).astype(np.float32)
    x = centroids[y] + rng.normal(0, feature_noise, size=(V, num_features)).astype(np.float32)
    if normalize:
        x /= np.sqrt(1.0 + feature_noise * feature_noise)
    x = x.astype(x_dtype)

    perm = rng.permutation(V)
    n_train, n_valid = int(0.6 * V), int(0.2 * V)
    split_idx = {
        "train": np.sort(perm[:n_train]).astype(np.int64),
        "valid": np.sort(perm[n_train:n_train + n_valid]).astype(np.int64),
        "test": np.sort(perm[n_train + n_valid:]).astype(np.int64),
    }
    g = GraphData(name=name, rowptr=rowptr, col=col, x=x, y=y,
                  split_idx=split_idx, num_classes=C)
    g.validate()
    return g


def powerlaw_graph(
    name: str = "synth-pl",
    num_nodes: int = 100_000,
    avg_degree: int = 15,
    alpha: float = 0.8,
    num_features: int = 128,
    num_classes: int = 40,
    seed: int = 0,
    x_dtype=np.float16,
    train_frac: float = 0.5,
    valid_frac: float = 0.25,
) -> GraphData:
    """Skewed-degree graph (Zipf-weighted endpoints) for perf benchmarking.

    Degree skew stresses the sampler hash map and the gather paths the same
    way ogbn-products' hubs do. Labels/features are random (not learnable) —
    use planted_partition for accuracy tests.
    """
    # skew exponent 1/(1-alpha)+1 (alpha=0.8 -> u^6): defined for
    # alpha in [0, 1) only — at alpha >= 1 the formula degenerates
    # (division by zero, or every endpoint collapsing onto one hub)
    assert 0.0 <= alpha < 1.0, alpha
    rng = np.random.default_rng(seed)
    V = num_nodes
    n_draw = V * avg_degree // 2
    # Zipf-ish endpoint weights via inverse-CDF on u^(1/(1-alpha)+1)
    u1 = rng.random(n_draw)
    u2 = rng.random(n_draw)
    src = np.minimum((V * u1 ** (1.0 / (1.0 - alpha) + 1.0)), V - 1).astype(np.int64)
    dst = np.minimum((V * u2), V - 1).astype(np.int64)
    rowptr = np.zeros(V + 1, dtype=np.int64)
    order_e = np.argsort(src, kind="stable")
    src, dst = src[order_e], dst[order_e]
    np.add.at(rowptr, src + 1, 1)
    np.cumsum(rowptr, out=rowptr)
    rowptr, col = symmetrize_csr(rowptr, dst.astype(np.int32), V)

    y = rng.integers(0, num_classes, size=V).astype(np.int32)
    x = rng.normal(0, 1, size=(V, num_features)).astype(np.float32).astype(x_dtype)
    perm = rng.permutation(V)
    # products-shaped drills use sparse splits (ogbn-products trains on
    # ~8% of nodes); the default 50/25/25 keeps historical bench behavior
    n_train = int(train_frac * V)
    n_valid = int(valid_frac * V)
    split_idx = {
        "train": np.sort(perm[:n_train]).astype(np.int64),
        "valid": np.sort(perm[n_train:n_train + n_valid]).astype(np.int64),
        "test": np.sort(perm[n_train + n_valid:]).astype(np.int64),
    }
    g = GraphData(name=name, rowptr=rowptr, col=col, x=x, y=y,
                  split_idx=split_idx, num_classes=num_classes)
    g.validate()
    return g
