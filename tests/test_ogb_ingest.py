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


def test_import_mag240_conversion():
    """MAG240 array-level converter (reference FastDataset.import_mag240,
    driver/dataset.py:43-57): fp16 features, nan labels -> -1, symmetrized
    CSR, 'MAG240' name."""
    from salient_plusplus_tpu.data.ogb import import_mag240

    rng = np.random.default_rng(3)
    V, E, C = 150, 600, 153
    src = rng.integers(0, V, E)
    dst = rng.integers(0, V, E)
    x = rng.standard_normal((V, 8)).astype(np.float16)
    y = rng.integers(0, C, V).astype(np.float32)
    y[::11] = np.nan  # MAG240M: most papers unlabeled
    perm = rng.permutation(V)
    split = {"train": perm[:60], "valid": perm[60:90], "test": perm[90:120]}

    g = import_mag240(np.stack([src, dst]), x, y, split, num_classes=C)
    assert g.name == "MAG240" and g.num_classes == C
    assert g.x.dtype == np.float16 and g.y.dtype == np.int32
    assert (g.y[::11] == -1).all()
    labeled = np.ones(V, bool)
    labeled[::11] = False
    np.testing.assert_array_equal(g.y[labeled],
                                  y[labeled].astype(np.int32))
    # symmetry: every input edge present both ways
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


def test_load_mag240_routes_through_import(tmp_path, monkeypatch):
    """Gated loader: fake ogb.lsc installed -> full conversion + cache;
    'test' split is valid-derived (hidden LSC test labels)."""
    import sys
    import types

    from salient_plusplus_tpu.data.ogb import load_mag240

    rng = np.random.default_rng(5)
    V, E = 120, 480
    src = rng.integers(0, V, E)
    dst = rng.integers(0, V, E)
    feats = rng.standard_normal((V, 16)).astype(np.float16)
    labels = np.full(V, np.nan, np.float32)
    lab_idx = rng.permutation(V)[:60]
    labels[lab_idx] = rng.integers(0, 10, 60)
    train, valid = lab_idx[:40], lab_idx[40:]

    class FakeLSC:
        num_classes = 10

        def __init__(self, root):
            pass

        def edge_index(self, s, r, d):
            assert (s, r, d) == ("paper", "cites", "paper")
            return np.stack([src, dst])

        paper_feat = feats
        paper_label = labels

        def get_idx_split(self, name):
            return {"train": train, "valid": valid}[name]

    mod = types.ModuleType("ogb")
    sub = types.ModuleType("ogb.lsc")
    sub.MAG240MDataset = FakeLSC
    mod.lsc = sub
    monkeypatch.setitem(sys.modules, "ogb", mod)
    monkeypatch.setitem(sys.modules, "ogb.lsc", sub)

    g = load_mag240(str(tmp_path))
    assert g.name == "MAG240"
    np.testing.assert_array_equal(g.split_idx["train"], train)
    got = np.sort(np.concatenate([g.split_idx["valid"],
                                  g.split_idx["test"]]))
    np.testing.assert_array_equal(got, np.sort(valid))
    reloaded = GraphData.load(str(tmp_path), "MAG240")
    assert reloaded.num_nodes == V
