"""OGB ingest conversion logic, tested with a faked ogb package.

No egress in this environment, so the real download can never run; the
conversion path (edge_index → symmetrized CSR, fp16 features, split
arrays, on-disk cache) is what can and should be verified (reference
preprocessing: driver/dataset.py:29-142)."""

import sys
import types

import numpy as np

from salient_plusplus_tpu.data.dataset import GraphData


def _install_fake_ogb(monkeypatch, V=200, E=900, C=5, F=6, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, V, E)
    dst = rng.integers(0, V, E)
    feats = rng.standard_normal((V, F)).astype(np.float32)
    labels = rng.integers(0, C, (V, 1)).astype(np.float64)
    labels[::17] = np.nan  # unlabeled rows, as papers100M has
    perm = rng.permutation(V)
    split = {"train": perm[:100], "valid": perm[100:140],
             "test": perm[140:180]}

    class FakeDataset:
        def __init__(self, name, root):
            self.name = name

        def get_idx_split(self):
            return {k: v.copy() for k, v in split.items()}

        def __getitem__(self, i):
            assert i == 0
            return ({"num_nodes": V,
                     "edge_index": np.stack([src, dst]),
                     "node_feat": feats}, labels)

    mod = types.ModuleType("ogb")
    sub = types.ModuleType("ogb.nodeproppred")
    sub.NodePropPredDataset = FakeDataset
    mod.nodeproppred = sub
    monkeypatch.setitem(sys.modules, "ogb", mod)
    monkeypatch.setitem(sys.modules, "ogb.nodeproppred", sub)
    return src, dst, feats, labels, split


def test_load_ogb_conversion_and_cache(tmp_path, monkeypatch):
    from salient_plusplus_tpu.data.ogb import load_ogb

    src, dst, feats, labels, split = _install_fake_ogb(monkeypatch)
    g = load_ogb("ogbn-fake", str(tmp_path))
    V = feats.shape[0]
    assert g.num_nodes == V
    # symmetrized simple graph: every input edge present in both directions
    adj = set()
    for u, v in zip(src.tolist(), dst.tolist()):
        if u != v:
            adj.add((u, v))
            adj.add((v, u))
    got = set()
    for u in range(V):
        for v in g.col[g.rowptr[u]:g.rowptr[u + 1]].tolist():
            got.add((u, v))
    assert got == adj
    assert g.x.dtype == np.float16
    # NaN labels → -1
    assert (g.y[::17] == -1).all()
    for s in ("train", "valid", "test"):
        np.testing.assert_array_equal(np.sort(g.split_idx[s]),
                                      np.sort(split[s]))
    # cached on disk in this framework's format
    reloaded = GraphData.load(str(tmp_path), "ogbn_fake")
    np.testing.assert_array_equal(reloaded.rowptr, g.rowptr)
    np.testing.assert_array_equal(reloaded.col, g.col)
