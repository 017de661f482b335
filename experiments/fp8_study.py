"""fp8 wire accuracy study → default decision (round-2 review ask #5).

Trains the distributed stack on the non-saturating accuracy-tracking
task (hardness knobs per docs/SCALE_RUN.md) on the 8-device virtual mesh
with the exchange wire in bf16 vs fp8 (e4m3, per-row scale), plus the
fp8 host cold tier, and compares validation curves against bf16
run-to-run noise (two seeds). No VIP cache is created, so EVERY remote
row crosses the quantized wire — the maximum-exposure configuration
(production runs with a cache quantize strictly fewer rows).

Run:  python experiments/fp8_study.py   (writes docs/fp8_study.json)
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from salient_plusplus_tpu.config import RunConfig
from salient_plusplus_tpu.data import synthetic
from salient_plusplus_tpu.parallel import make_mesh
from salient_plusplus_tpu.partition import multiconstraint_partition
from salient_plusplus_tpu.train.dist_loop import DistributedTrainer

WORLD = 8
EPOCHS = 6


def run(g, labels, seed, wire_fp8=False, hbm_fraction=1.0,
        cold_fp8=False):
    cfg = RunConfig(
        train_batch_size=64, test_batch_size=128,
        train_fanouts=[10, 5], batchwise_test_fanouts=[12, 12],
        final_test_fanouts=[12, 12], hidden_features=64, num_layers=2,
        lr=0.01, num_workers=2, calibration_batches=4, seed=seed,
        load_balance_scheme="fully_random",  # max cross-partition traffic
        wire_fp8=wire_fp8, hbm_fraction=hbm_fraction, cold_fp8=cold_fp8,
        cold_mode="replicated",
    )
    t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
    curve = []
    for e in range(EPOCHS):
        m = t.train_epoch(e)
        assert m["overflow"] == 0, m
        curve.append(round(t.evaluate("valid"), 4))
    return curve


def main():
    g = synthetic.planted_partition(
        name="fp8study", num_nodes=60_000, num_classes=64, avg_degree=12,
        num_features=64, p_intra=0.4, feature_noise=12.0, normalize=True,
        seed=1)
    labels = multiconstraint_partition(g.rowptr, g.col, WORLD, seed=0)
    out = {}
    out["bf16_seed0"] = run(g, labels, seed=0)
    out["bf16_seed1"] = run(g, labels, seed=1)     # run-to-run noise
    out["fp8_seed0"] = run(g, labels, seed=0, wire_fp8=True)
    out["fp8_cold_seed0"] = run(g, labels, seed=0, wire_fp8=True,
                                hbm_fraction=0.75, cold_fp8=True)
    noise = max(abs(a - b) for a, b in
                zip(out["bf16_seed0"], out["bf16_seed1"]))
    gap = max(abs(a - b) for a, b in
              zip(out["bf16_seed0"], out["fp8_seed0"]))
    gap_cold = max(abs(a - b) for a, b in
                   zip(out["bf16_seed0"], out["fp8_cold_seed0"]))
    out["max_seed_noise"] = round(noise, 4)
    out["max_fp8_gap"] = round(gap, 4)
    out["max_fp8_cold_gap"] = round(gap_cold, 4)
    out["within_noise"] = bool(gap <= noise * 1.5 + 0.01)
    print(json.dumps(out, indent=2))
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "fp8_study.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
