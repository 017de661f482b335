"""DataCollector — distributed-aware npz dumps of per-epoch batch data.

Parity with the reference's DataCollector (fast_trainer/utils.py:28-115):
optional offline-analysis dumps laid out as
``collected_data_<timestamp>/epoch<N>/rank<r>_<name>.npz``. Disabled unless
enabled explicitly (the reference ships it mostly disabled too).
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import numpy as np


class DataCollector:
    def __init__(self, root: str = ".", rank: int = 0, enabled: bool = False,
                 tag: Optional[str] = None):
        self.enabled = enabled
        self.rank = rank
        self.epoch = 0
        if enabled:
            tag = tag or time.strftime("%Y%m%d_%H%M%S")
            self.dir = os.path.join(root, f"collected_data_{tag}")
            os.makedirs(self.dir, exist_ok=True)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if self.enabled:
            os.makedirs(os.path.join(self.dir, f"epoch{epoch}"),
                        exist_ok=True)

    def collect(self, name: str, **arrays: Any):
        if not self.enabled:
            return
        path = os.path.join(self.dir, f"epoch{self.epoch}",
                            f"rank{self.rank}_{name}.npz")
        np.savez_compressed(
            path, **{k: np.asarray(v) for k, v in arrays.items()})

    def collect_batch(self, name: str, batch):
        """Dump a PaddedBatch's composition (n_id, level sizes, counts)."""
        if not self.enabled:
            return
        self.collect(
            name,
            n_id=batch.n_id, level_sizes=batch.level_sizes,
            y=batch.y, seed_count=batch.seed_count,
            edge_counts=[int(e.count) for e in batch.edges],
        )
