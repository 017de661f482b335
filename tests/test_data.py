import numpy as np

from salient_plusplus_tpu.data import GraphData, synthetic
from salient_plusplus_tpu.data.dataset import symmetrize_csr
from salient_plusplus_tpu.data.partition_book import RangePartitionBook


def test_symmetrize_csr():
    # path graph 0-1-2 plus extra dir edge 2->0, self loop 1->1
    rowptr = np.array([0, 1, 3, 4], np.int64)
    col = np.array([1, 0, 1, 0], np.int32)  # 0->1, 1->0, 1->1(self), 2->0
    rp, c = symmetrize_csr(rowptr, col, 3)
    # symmetric simple graph: edges {0-1, 0-2}
    assert rp.tolist() == [0, 2, 3, 4]
    assert c.tolist() == [1, 2, 0, 0]


def test_synthetic_valid(tiny_graph):
    g = tiny_graph
    g.validate()
    # symmetry: every edge has its reverse
    src = np.repeat(np.arange(g.num_nodes), np.diff(g.rowptr))
    keys = set(zip(src.tolist(), g.col.tolist()))
    assert all((d, s) in keys for s, d in list(keys)[:200])
    # splits are a disjoint cover
    allidx = np.concatenate([g.split_idx[s] for s in ("train", "valid", "test")])
    assert len(np.unique(allidx)) == g.num_nodes


def test_save_load_roundtrip(tmp_path, tiny_graph):
    g = tiny_graph
    g.save(str(tmp_path))
    g2 = GraphData.load(str(tmp_path), g.name)
    assert np.array_equal(g2.rowptr, g.rowptr)
    assert np.array_equal(g2.col, g.col)
    assert np.array_equal(g2.x, g.x)
    assert np.array_equal(g2.split_idx["valid"], g.split_idx["valid"])
    assert g2.num_classes == g.num_classes


def test_get_num_iterations(tiny_graph):
    it = tiny_graph.get_num_iterations(64)
    assert it["train"] == -(-len(tiny_graph.split_idx["train"]) // 64)


def test_range_partition_book():
    book = RangePartitionBook(np.array([0, 10, 25, 40], np.int64))
    nids = np.array([0, 9, 10, 24, 25, 39], np.int64)
    assert book.nid2partid(nids).tolist() == [0, 0, 1, 1, 2, 2]
    assert book.nid_is_local(nids, 1).tolist() == [False, False, True, True, False, False]
    assert book.nid2localnid(np.array([12, 24]), 1).tolist() == [2, 14]
    assert book.partid2nids(2).tolist() == list(range(25, 40))
    assert book.part_sizes().tolist() == [10, 15, 15]
