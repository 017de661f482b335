import numpy as np
import pytest

from salient_plusplus_tpu.sampling import BatchSpec, multilayer_sample_np, pad_sample


def check_sample_invariants(g, s, seeds, fanouts):
    """Structural invariants of reference multilayer_sample semantics."""
    L = len(fanouts)
    assert s.level_sizes[0] == len(seeds)
    assert np.array_equal(s.n_id[: len(seeds)], seeds.astype(np.int32))
    assert len(np.unique(s.n_id)) == len(s.n_id)  # relabeling is injective
    assert s.level_sizes == sorted(s.level_sizes)  # prefix property
    adj = {}
    for h in range(L):
        dst, src = s.hops[h]
        n_in, n_out = s.level_sizes[h + 1], s.level_sizes[h]
        assert np.all(dst < n_out) and np.all(src < n_in)
        # every edge exists in the graph
        for d, sr in zip(dst[:500], src[:500]):
            u, v = int(s.n_id[d]), int(s.n_id[sr])
            row = g.col[g.rowptr[u]:g.rowptr[u + 1]]
            assert v in row
        # fanout bound per target
        if fanouts[h] >= 0:
            counts = np.bincount(dst, minlength=n_out)
            degs = np.diff(g.rowptr)[s.n_id[:n_out]]
            assert np.all(counts <= np.minimum(
                np.maximum(fanouts[h], 0), degs) + (fanouts[h] < 0) * degs)
        # no duplicate (dst,src) pairs per hop (sampling w/o replacement)
        pairs = dst.astype(np.int64) * len(s.n_id) + src
        assert len(np.unique(pairs)) == len(pairs)


def test_sampled_invariants(small_graph, rng):
    g = small_graph
    seeds = g.split_idx["train"][:128]
    fanouts = [5, 3]
    s = multilayer_sample_np(g.rowptr, g.col, seeds, fanouts, rng)
    check_sample_invariants(g, s, seeds, fanouts)


def test_full_expansion_matches_bfs(tiny_graph):
    """fanout=-1 must produce exactly the 2-hop neighborhood."""
    g = tiny_graph
    seeds = g.split_idx["train"][:16]
    s = multilayer_sample_np(g.rowptr, g.col, seeds, [-1, -1])
    check_sample_invariants(g, s, seeds, [-1, -1])
    # BFS closure check
    reach = set(seeds.tolist())
    frontier = set(seeds.tolist())
    for _ in range(2):
        nxt = set()
        for u in sorted(reach):  # cumulative frontier semantics
            nxt.update(g.col[g.rowptr[u]:g.rowptr[u + 1]].tolist())
        reach |= nxt
    assert set(s.n_id.tolist()) == reach
    # hop edge count equals sum of degrees of the hop's target frontier
    for h in range(2):
        n_out = s.level_sizes[h]
        degs = np.diff(g.rowptr)[s.n_id[:n_out]]
        assert len(s.hops[h][0]) == degs.sum()


def test_padding_roundtrip(small_graph, rng):
    g = small_graph
    seeds = g.split_idx["train"][:64]
    fanouts = [4, 3]
    spec = BatchSpec.worst_case(64, fanouts)
    s = multilayer_sample_np(g.rowptr, g.col, seeds, fanouts, rng)
    b = pad_sample(s, spec, g.y)
    assert b.n_id.shape == (spec.total_node_cap,)
    assert int(b.seed_count) == 64
    assert np.array_equal(b.y[:64], g.y[seeds])
    assert b.overflow.tolist() == [0, 0]
    # processing order: edges[0] is the LAST sampled hop
    assert int(b.edges[0].count) == len(s.hops[1][0])
    assert int(b.edges[1].count) == len(s.hops[0][0])
    np.testing.assert_array_equal(
        b.edges[1].src[: int(b.edges[1].count)], s.hops[0][1])


def test_overflow_drops(small_graph, rng):
    g = small_graph
    seeds = g.split_idx["train"][:64]
    fanouts = [8, 8]
    caps_node = [64, 200, 400]
    caps_edge = [256, 512]
    s = multilayer_sample_np(g.rowptr, g.col, seeds, fanouts, rng,
                             node_caps=caps_node, edge_caps=caps_edge)
    assert s.level_sizes[1] <= 200 and s.level_sizes[2] <= 400
    assert all(len(d) <= c for (d, _), c in zip(s.hops, caps_edge))
    assert s.dropped_nodes > 0 or s.dropped_edges > 0


def test_deterministic_given_rng(small_graph):
    g = small_graph
    seeds = g.split_idx["train"][:32]
    s1 = multilayer_sample_np(g.rowptr, g.col, seeds, [5, 5],
                              np.random.default_rng(42))
    s2 = multilayer_sample_np(g.rowptr, g.col, seeds, [5, 5],
                              np.random.default_rng(42))
    assert np.array_equal(s1.n_id, s2.n_id)
    for (d1, x1), (d2, x2) in zip(s1.hops, s2.hops):
        assert np.array_equal(d1, d2) and np.array_equal(x1, x2)
