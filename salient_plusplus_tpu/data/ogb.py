"""OGB ingest (gated — requires the ``ogb`` package + network access).

Reference parity: FastDataset.from_ogb preprocessing (driver/dataset.py:
29-142) — symmetrized CSR, fp16 row-major features, int labels, split
index arrays — emitted in this framework's on-disk format. Environments
without ogb installed (e.g. zero-egress containers) use synthetic graphs
or `data/salient_import.py` to convert an existing SALIENT++ dataset dir.
"""

from __future__ import annotations

import os

import numpy as np

from .dataset import GraphData, symmetrize_csr


def _coo_to_csr(src: np.ndarray, dst: np.ndarray, V: int):
    """COO edge list → CSR, at ingest scale (MAG240 is 1.3G directed
    edges: bincount for degrees + one argsort; np.add.at is ~10x slower
    there). Returns (int64 rowptr, int32 col) sorted by source."""
    rowptr = np.zeros(V + 1, np.int64)
    rowptr[1:] = np.bincount(src, minlength=V)
    np.cumsum(rowptr, out=rowptr)
    order = np.argsort(src, kind="stable")
    return rowptr, dst[order].astype(np.int32)


def load_ogb(name: str, root: str, cache: bool = True) -> GraphData:
    try:
        from ogb.nodeproppred import NodePropPredDataset
    except ImportError as e:
        raise ImportError(
            "OGB ingest requires the 'ogb' package (not installed in this "
            "environment). Use a synthetic dataset ('synth:V=...'), a "
            "pre-converted dataset directory, or data/salient_import.py "
            "to convert a SALIENT++-format dataset.") from e

    ds = NodePropPredDataset(name=name, root=os.path.join(root, "_ogb_raw"))
    split = ds.get_idx_split()
    g, labels = ds[0]
    V = g["num_nodes"]
    src = g["edge_index"][0].astype(np.int64)
    dst = g["edge_index"][1].astype(np.int64)
    rowptr, col = _coo_to_csr(src, dst, V)
    rowptr, col = symmetrize_csr(rowptr, col, V)

    x = np.ascontiguousarray(g["node_feat"], dtype=np.float16)
    y = np.nan_to_num(labels.reshape(-1), nan=-1).astype(np.int32)
    num_classes = int(y.max()) + 1
    out = GraphData(
        name=name.replace("-", "_"),
        rowptr=rowptr, col=col, x=x, y=y,
        split_idx={k2: np.asarray(v, np.int64).reshape(-1)
                   for k2, v in split.items()},
        num_classes=num_classes,
    )
    out.validate()
    if cache:
        out.save(root)
    return out


def import_mag240(edge_index: np.ndarray, x: np.ndarray, y: np.ndarray,
                  split_idx: dict, num_classes: int = 153) -> GraphData:
    """Convert pre-extracted MAG240 arrays into this framework's format.

    Reference parity: FastDataset.import_mag240 (driver/dataset.py:43-57)
    — the homogeneous paper-cites-paper component of MAG240M (see the
    reference's INSTALL.md:101): fp16 row-major features, float labels
    nan->-1 then cast to int, symmetrized CSR. Takes arrays rather than
    the ogb.lsc dataset object so it is fixture-testable and usable with
    any offline extraction of the LSC data (the reference likewise takes
    pre-built adj_t/x/y/split tensors).
    """
    src = np.asarray(edge_index[0], np.int64)
    dst = np.asarray(edge_index[1], np.int64)
    V = int(x.shape[0])
    rowptr, col = _coo_to_csr(src, dst, V)
    rowptr, col = symmetrize_csr(rowptr, col, V)

    y = np.asarray(y).reshape(-1)
    if np.issubdtype(y.dtype, np.floating):
        y = np.nan_to_num(y, nan=-1.0)
    y = y.astype(np.int32)
    out = GraphData(
        name="MAG240",
        rowptr=rowptr, col=col,
        x=np.ascontiguousarray(x, dtype=np.float16), y=y,
        split_idx={k: np.asarray(v, np.int64).reshape(-1)
                   for k, v in split_idx.items()},
        num_classes=num_classes,
    )
    out.validate()
    return out


def load_mag240(root: str, cache: bool = True) -> GraphData:
    """Gated MAG240M (LSC) ingest of the paper-citation component.

    Requires the ``ogb`` package + the ~200 GB LSC download; zero-egress
    environments exercise :func:`import_mag240` via fixtures instead
    (tests/test_ogb_ingest.py). MAG240M's test-dev labels are hidden, so
    like the reference distribution the 'test' split is valid-derived.
    """
    try:
        from ogb.lsc import MAG240MDataset
    except ImportError as e:
        raise ImportError(
            "MAG240 ingest requires the 'ogb' package (not installed in "
            "this environment). Use import_mag240 with pre-extracted "
            "arrays, a synthetic dataset, or data/salient_import.py.") from e

    ds = MAG240MDataset(root=os.path.join(root, "_ogb_raw"))
    edge_index = ds.edge_index("paper", "cites", "paper")
    x = ds.paper_feat          # memmapped float16 [num_papers, 768]
    y = ds.paper_label         # float with nan for unlabeled
    train = np.asarray(ds.get_idx_split("train"), np.int64)
    valid = np.asarray(ds.get_idx_split("valid"), np.int64)
    # Hidden test labels: hold out the back half of valid as 'test'
    # (matches how the reference's pre-partitioned MAG240 is scored on
    # labeled splits only).
    split = {"train": train, "valid": valid[: len(valid) // 2],
             "test": valid[len(valid) // 2:]}
    out = import_mag240(edge_index, np.asarray(x), y, split,
                        num_classes=int(ds.num_classes))
    if cache:
        out.save(root)
    return out
