import numpy as np
import pytest

from salient_plusplus_tpu.caching import (
    argsort_vip, evaluate_communication_volume, get_lambda_vip_cache,
    simulate_vertex_accesses, vip_analytical, vip_analytical_device,
    vip_proxy_degree_1hop, vip_proxy_degree_reachable,
    vip_proxy_num_paths_reachable, vip_randomwalk,
)
from salient_plusplus_tpu.caching.simulate import (
    run_replication_sweep, tabulate_comm_results,
)
from salient_plusplus_tpu.caching.vip import partitionwise_train_idx


def _star_graph(n_leaves=4):
    """Vertex 0 connected to 1..n (symmetric CSR)."""
    V = n_leaves + 1
    rowptr = np.zeros(V + 1, np.int64)
    rowptr[1] = n_leaves
    rowptr[2:] = n_leaves + np.arange(1, V)
    col = np.concatenate([np.arange(1, V), np.zeros(n_leaves)]).astype(np.int32)
    return rowptr, col


def test_vip_analytical_closed_form():
    """Closed-form check on a star: seeds = all leaves, fanout 1, one hop.

    p_hop(center) = 1 - Π_leaves (1 - min(1, 1/1)·p_seed) with p_seed =
    B/|train| — each leaf has degree 1 so tw=1.
    """
    rowptr, col = _star_graph(4)
    train = np.array([1, 2, 3, 4], np.int64)
    B = 2
    w = vip_analytical(rowptr, col, [train], minibatch_size=B, fanouts=[1])[0]
    p_seed = B / 4
    expect_center = 1 - (1 - p_seed) ** 4
    np.testing.assert_allclose(w[0], expect_center, rtol=1e-6)
    # leaves: neighbor is center with p_hop(center)=0 initially → p=0
    np.testing.assert_allclose(w[1:], 0.0, atol=1e-7)


def test_vip_device_matches_numpy(small_graph):
    g = small_graph
    pids = (np.arange(g.num_nodes) * 2 // g.num_nodes).astype(np.int32)
    tipp = partitionwise_train_idx(pids, g.split_idx["train"])
    w_np = vip_analytical(g.rowptr, g.col, tipp, 256, [5, 3])
    w_dev = vip_analytical_device(g.rowptr, g.col, tipp, 256, [5, 3],
                                  edge_chunk=4096)
    for a, b in zip(w_np, w_dev):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)


def test_vip_analytical_vs_simulation_correlation(small_graph):
    """Analytical VIP must rank vertices like empirical access frequency
    (Spearman corr over accessed vertices)."""
    g = small_graph
    train = g.split_idx["train"]
    w = vip_analytical(g.rowptr, g.col, [train], 256, [5, 3])[0]
    acc = simulate_vertex_accesses(g.rowptr, g.col, [train], [5, 3], 256,
                                   num_epochs=2, seed=1)[0]
    touched = acc > 0
    # rank correlation on touched vertices
    from scipy.stats import spearmanr

    rho, _ = spearmanr(w[touched], acc[touched])
    assert rho > 0.5, rho


def test_proxies_shapes_and_masks(small_graph):
    g = small_graph
    tipp = [g.split_idx["train"][:500]]
    for fn, args in [
        (vip_proxy_degree_reachable, (g.rowptr, g.col, tipp, 2)),
        (vip_proxy_num_paths_reachable, (g.rowptr, g.col, tipp, 2)),
        (vip_proxy_degree_1hop, (g.rowptr, g.col, tipp)),
        (vip_randomwalk, (g.rowptr, g.col, tipp, [5, 3])),
    ]:
        w = fn(*args)[0]
        assert w.shape == (g.num_nodes,)
        assert np.isfinite(w).all() and (w >= 0).all()
        assert (w > 0).sum() > 0


def test_lambda_vip_cache_excludes_own_partition(small_graph):
    g = small_graph
    pids = (np.arange(g.num_nodes) * 2 // g.num_nodes).astype(np.int32)
    lam = get_lambda_vip_cache(g.rowptr, g.col, pids, g.split_idx["train"],
                               [5, 3], 256, scheme="vip-analytical")
    cached = lam(0.2)
    assert len(cached) == 2
    for p, ids in enumerate(cached):
        assert len(ids) == int(g.num_nodes * 0.2 / 2)
        assert np.all(pids[ids] != p)  # cache only remote vertices


def test_comm_volume_identity_and_vip_wins(small_graph):
    """Cache-quality ordering + accounting identity (the reference's core
    claims): cross traffic decreases monotonically with replication factor,
    VIP beats the degree heuristic, and the access-count oracle beats VIP."""
    g = small_graph
    pids = (np.arange(g.num_nodes) * 4 // g.num_nodes).astype(np.int32)
    rng = np.random.default_rng(0)
    train = np.sort(rng.choice(g.num_nodes, 600, replace=False)).astype(np.int64)
    results = run_replication_sweep(
        g.rowptr, g.col, pids, train, [5, 3], 128,
        schemes=("vip-analytical", "degree", "oracle"),
        replication_factors=(0.0, 0.1, 0.3, 0.6), num_epochs=1)
    vip = results["vip-analytical"]
    base_cross = vip[0.0]["cross"]
    assert base_cross > 0
    # monotone in replication factor
    crosses = [vip[a]["cross"] for a in (0.0, 0.1, 0.3, 0.6)]
    assert crosses == sorted(crosses, reverse=True)
    assert crosses[-1] < base_cross
    for alpha in (0.1, 0.3, 0.6):
        # vip strictly better than degree heuristic at equal budget
        assert vip[alpha]["cross"] < results["degree"][alpha]["cross"]
        # oracle (true access counts) is the upper bound on cache quality
        assert results["oracle"][alpha]["cross"] <= vip[alpha]["cross"]
    table = tabulate_comm_results(results)
    assert "vip-analytical" in table


def test_comm_volume_fractional_epochs(small_graph):
    """num_epochs > 1 averages access counts to fractions; the accounting
    must stay consistent (regression: per-bucket int() truncation tripped
    the identity assert on any multi-epoch run)."""
    g = small_graph
    pids = (np.arange(g.num_nodes) * 2 // g.num_nodes).astype(np.int32)
    rng = np.random.default_rng(4)
    train = np.sort(rng.choice(g.num_nodes, 400,
                               replace=False)).astype(np.int64)
    results = run_replication_sweep(
        g.rowptr, g.col, pids, train, [4, 3], 64,
        schemes=("vip-analytical",), replication_factors=(0.0, 0.2),
        num_epochs=2)
    for d in results["vip-analytical"].values():
        assert d["total"] == d["internal"] + d["cross"] + d["cache_hits"]
        assert d["total"] > 0


def test_strategy_zoo_variants(small_graph):
    """Taylor/cascade analytic variants + shuffle/random-multiwalk
    baselines (reference eval_quality.py:192-526, ddp.py:219-224): all run
    through the sweep, and quality orders sanely — analytic variants track
    the exact recurrence closely and every informed scheme beats the
    shuffle baseline."""
    g = small_graph
    pids = (np.arange(g.num_nodes) * 4 // g.num_nodes).astype(np.int32)
    rng = np.random.default_rng(1)
    train = np.sort(rng.choice(g.num_nodes, 600,
                               replace=False)).astype(np.int64)
    results = run_replication_sweep(
        g.rowptr, g.col, pids, train, [5, 3], 128,
        schemes=("vip-analytical", "vip-analytical-taylor",
                 "vip-analytical-cascade", "vip-analytical-taylor-cascade",
                 "random-multiwalk", "shuffle"),
        replication_factors=(0.0, 0.2), num_epochs=1)
    alpha = 0.2
    exact = results["vip-analytical"][alpha]["cross"]
    shuffle = results["shuffle"][alpha]["cross"]
    for scheme in ("vip-analytical-taylor", "vip-analytical-cascade",
                   "vip-analytical-taylor-cascade", "random-multiwalk"):
        cross = results[scheme][alpha]["cross"]
        assert cross < shuffle, (scheme, cross, shuffle)
        # analytic family stays within 25% of the exact recurrence
        assert cross < exact * 1.25, (scheme, cross, exact)
    # accounting identity holds for every scheme
    for scheme, per_alpha in results.items():
        for a, r in per_alpha.items():
            assert r["total"] == r["internal"] + r["cross"] + r["cache_hits"]
