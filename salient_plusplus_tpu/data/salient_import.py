"""Convert a SALIENT++ on-disk dataset into this framework's format.

The reference stores datasets as directories of .pt tensors (rowptr.pt,
col.pt, x.pt, y.pt, split_idx_*.pt — driver/dataset.py:85-142; partitioned
variants add part_offsets.pt and per-rank x{rank}.pt, :184-215). Users
migrating from SALIENT++ convert once with this module (torch CPU is only
needed at conversion time).
"""

from __future__ import annotations

import os

import numpy as np

from .dataset import GraphData, SPLIT_NAMES


def _load_pt(path):
    import torch

    t = torch.load(path, map_location="cpu", weights_only=True)
    return t.numpy() if hasattr(t, "numpy") else t


def import_salient_dataset(src_dir: str, name: str, out_root: str
                           ) -> GraphData:
    """Convert an unpartitioned SALIENT(++) FastDataset directory."""
    def p(f):
        return os.path.join(src_dir, f)

    rowptr = _load_pt(p("rowptr.pt")).astype(np.int64)
    col = _load_pt(p("col.pt")).astype(np.int32)
    x = np.ascontiguousarray(_load_pt(p("x.pt")))
    y = np.nan_to_num(_load_pt(p("y.pt")).reshape(-1), nan=-1).astype(np.int32)
    split_idx = {}
    for s in SPLIT_NAMES:
        for cand in (f"split_idx_{s}.pt", f"{s}_idx.pt"):
            if os.path.exists(p(cand)):
                split_idx[s] = _load_pt(p(cand)).astype(np.int64)
                break
        else:
            raise FileNotFoundError(f"missing split file for '{s}' in {src_dir}")
    g = GraphData(name=name, rowptr=rowptr, col=col, x=x, y=y,
                  split_idx=split_idx, num_classes=int(y.max()) + 1)
    g.validate()
    g.save(out_root)
    return g
