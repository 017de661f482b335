"""Environment configuration — machine-adaptive defaults.

Parity with utils/configure_for_environment.py (reference): detect CPU
count → sampler worker heuristic (:63-102) and free disk → feasible
dataset list with per-k size multipliers (:123-152), written to a config
file the launcher can consume.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List


# unpartitioned base footprints in GB (configure_for_environment.py:137-144)
DATASET_BASE_GB = {
    "ogbn-arxiv": 0.5,
    "ogbn-products": 2.0,
    "ogbn-papers100M": 100.0,
    "MAG240": 300.0,
}
# reordered k-way copies cost roughly (1 + 1/8·k) of base (features split
# once + shared structure per partition count kept on disk)
def _k_footprint_gb(base: float, k: int) -> float:
    return base * (1.0 + k / 8.0) + base  # reordered copy + the original


def recommended_num_workers(cpu_count: int = 0) -> int:
    """Sampler threads: use every core — the feeder thread blocks on
    device dispatch, so oversubscription is free (measured +20% vs n-1
    on a 4-core host; PERF_NOTES.md)."""
    n = cpu_count or os.cpu_count() or 4
    return max(1, n)


def feasible_datasets(free_gb: float = 0.0,
                      ks: List[int] = (2, 4, 8)) -> Dict[str, List[int]]:
    if not free_gb:
        free_gb = shutil.disk_usage(".").free / 1e9
    out: Dict[str, List[int]] = {}
    for name, base in DATASET_BASE_GB.items():
        fits = [k for k in ks if _k_footprint_gb(base, k) <= free_gb]
        if base <= free_gb:
            out[name] = fits
    return out


def write_environment_config(path: str = "configuration_files") -> str:
    os.makedirs(path, exist_ok=True)
    cfg = {
        "num_workers": recommended_num_workers(),
        "cpu_count": os.cpu_count(),
        "free_gb": round(shutil.disk_usage(".").free / 1e9, 1),
        "feasible_datasets": feasible_datasets(),
    }
    out = os.path.join(path, "environment.json")
    with open(out, "w") as f:
        json.dump(cfg, f, indent=2)
    return out


if __name__ == "__main__":
    print(open(write_environment_config()).read())
