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
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    rowptr = np.zeros(V + 1, np.int64)
    np.add.at(rowptr, src + 1, 1)
    np.cumsum(rowptr, out=rowptr)
    rowptr, col = symmetrize_csr(rowptr, dst.astype(np.int32), V)

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
