"""Pod-scale feature-communication budget vs the north star.

North star (BASELINE.json / BASELINE.md): **<10% of step time spent in
feature communication** on TPU pods. This module turns the framework's
static exchange shape into a checkable budget statement:

    per step, each chip sends  world · r_cap  ids (4 B) and receives
    world · r_cap  rows (wire_row_bytes each)  —  parallel/exchange.py
    builds exactly these buffers, so the wire volume is not a statistic
    but a compiled shape. VIP caching shrinks it through the cache-aware
    r_cap recalibration (train/dist_loop.py::create_cache).

    comm_share = wire_bytes_per_step / link_rate / step_time

Link rates are published TPU numbers (conservative effective values, not
peaks): v5p ICI is 4800 Gbps/chip aggregate — we budget an EFFECTIVE
all_to_all rate of 100 GB/s/chip (~1/6 of peak, the right order for
all-to-all traffic patterns that can't use every link both ways); DCN is
budgeted at 12.5 GB/s/host (100 Gbps NIC). Step time defaults to the
measured single-chip v5e step (~16 ms at the products bench shape,
PERF_NOTES.md) — a conservative reference: faster chips raise the comm
share, and this module makes that arithmetic explicit instead of buried.

The CLI measures post-cache r_cap on a real (or synthetic) graph over
the virtual mesh and emits a JSON budget table; tests assert the
machinery at small scale and that the recorded products-scale artifact
satisfies the north star. Reference capability being matched:
ddp.py:417-570 (cache build) + transferers.py:488-531 (payload
accounting).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

# effective per-chip/host all_to_all bandwidths (bytes/s), conservative
LINK_RATES = {
    "v5p_ici": 100e9,   # of 600 GB/s peak aggregate (4800 Gbps/chip)
    "v4_ici": 50e9,     # of ~300 GB/s peak aggregate (2400 Gbps/chip)
    "dcn_100g": 12.5e9,  # 100 Gbps NIC per host
}


@dataclass
class BudgetRow:
    alpha: float            # replication factor (fraction of V/k cached)
    r_cap: int              # post-cache per-destination request budget
    wire_bytes_per_step: int
    comm_share_ici: float   # fraction of step time (v5p ICI)
    comm_share_dcn: float   # fraction of step time (100G DCN)
    sim_cross_per_batch: float  # simulator-predicted remote fetches/batch


def wire_bytes_per_step(world: int, r_cap: int, num_features: int,
                        row_bytes: Optional[int] = None,
                        wire_fp8: bool = False) -> int:
    """Static per-chip wire volume of one training step: the id request
    all_to_all ([world, r_cap] int32) plus the row response all_to_all
    ([world, r_cap, F])."""
    if row_bytes is None:
        row_bytes = (num_features + 4) if wire_fp8 else 2 * num_features
    return world * r_cap * (4 + row_bytes)


def comm_share(wire_bytes: int, step_time_s: float,
               link_bytes_per_s: float) -> float:
    """Fraction of the step spent moving the exchange payload, assuming
    zero overlap (worst case — XLA overlaps collectives with compute)."""
    return (wire_bytes / link_bytes_per_s) / step_time_s


def measure_budget(
    graph,
    partition_labels: np.ndarray,
    alphas: Sequence[float] = (0.0, 0.01, 0.05, 0.10),
    fanouts: Sequence[int] = (15, 10, 5),
    batch_size: int = 1024,
    step_time_s: float = 16e-3,
    seed: int = 0,
    scheme: str = "vip-analytical",
) -> List[BudgetRow]:
    """Measure post-cache r_cap at each replication factor WITHOUT
    devices: probe-sample batches, classify remote frontier ids against
    the α-sized VIP cache, take the worst per-destination count (the same
    calibration rule the trainer compiles, dist_loop._calibrate_r_cap),
    and cross-check against the comm-volume simulator."""
    from ..caching.simulate import (
        evaluate_communication_volume, simulate_vertex_accesses)
    from ..caching.vip import get_lambda_vip_cache, partitionwise_train_idx
    from ..data.reorder import reorder_graph
    from ..sampling.cpp import NativeSampler
    from ..train.loop import calibrate_spec

    world = int(partition_labels.max()) + 1
    pg, _, _ = reorder_graph(graph, partition_labels, equal_shards=True)
    native = NativeSampler(np.asarray(pg.rowptr, np.int64),
                           np.asarray(pg.col, np.int32))
    offs = np.asarray(pg.part_offsets, np.int64)
    pids = np.searchsorted(offs[1:], np.arange(pg.num_nodes),
                           side="right").astype(np.int32)
    train = pg.split_idx["train"]
    spec = calibrate_spec(native, train, batch_size, list(fanouts),
                          num_batches=8, seed=seed)
    lam = get_lambda_vip_cache(pg.rowptr, pg.col, pids, train,
                               list(fanouts), batch_size * world,
                               scheme=scheme)
    rng = np.random.default_rng(seed + 5)
    probes = []
    for i in range(8):
        take = min(spec.seed_cap, len(train))
        seeds = np.sort(rng.choice(train, take, replace=False))
        b = native.sample(spec, seeds, rng_seed=50 + i)
        probes.append(b.n_id[: int(b.level_sizes[-1])])

    # simulator cross-check: per-epoch vertex accesses are α-independent,
    # classified per α against the same cache the exchange would use
    tipp = partitionwise_train_idx(pids, train)
    accesses = simulate_vertex_accesses(pg.rowptr, pg.col, tipp,
                                        list(fanouts), batch_size,
                                        seed=seed)
    n_batches = sum(max(1, -(-len(t) // batch_size)) for t in tipp)

    rows = []
    # the response all_to_all ships lane-padded rows (trainers pad F to
    # 128; data/dataset.pad_feature_dim) — budget the real wire width
    F = int(-(-pg.num_features // 128) * 128)
    for alpha in alphas:
        cached = lam(alpha) if alpha > 0 else [
            np.zeros(0, np.int64) for _ in range(world)]
        num = min(len(c) for c in cached)
        cache_sets = [np.sort(np.asarray(c[:num], np.int64))
                      for c in cached]
        worst = 128
        for ids in probes:
            owner = np.searchsorted(offs[1:], ids, side="right")
            for d in range(world):
                remote = owner != d
                if num:
                    pos = np.searchsorted(cache_sets[d], ids)
                    pos = np.clip(pos, 0, num - 1)
                    remote &= cache_sets[d][pos] != ids
                cnt = np.bincount(owner[remote], minlength=world)
                cnt[d] = 0
                worst = max(worst, int(cnt.max()))
        r_cap = int(-(-int(worst * 1.3) // 128) * 128)
        wb = wire_bytes_per_step(world, r_cap, F)
        vol = evaluate_communication_volume(
            accesses, pids, cache_sets if num else None)
        rows.append(BudgetRow(
            alpha=float(alpha), r_cap=r_cap, wire_bytes_per_step=wb,
            comm_share_ici=round(comm_share(
                wb, step_time_s, LINK_RATES["v5p_ici"]), 6),
            comm_share_dcn=round(comm_share(
                wb, step_time_s, LINK_RATES["dcn_100g"]), 6),
            sim_cross_per_batch=round(vol["cross"] / n_batches, 1),
        ))
    return rows


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="feature-communication budget vs the <10% north star")
    ap.add_argument("dataset", help="synth:... spec or dataset dir name")
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--alphas", default="0,0.01,0.05,0.1")
    ap.add_argument("--fanouts", default="15,10,5")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--step_ms", type=float, default=16.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from ..config import RunConfig
    from ..driver import load_dataset
    from ..partition import multiconstraint_partition

    if args.dataset.startswith("powerlaw:"):
        from ..data import synthetic

        kv = dict(p.split("=") for p in args.dataset[9:].split(",") if p)
        g = synthetic.powerlaw_graph(
            name="powerlaw-budget", num_nodes=int(kv.get("V", 1_000_000)),
            avg_degree=int(kv.get("deg", 15)),
            num_features=int(kv.get("F", 100)),
            num_classes=int(kv.get("C", 47)), seed=int(kv.get("seed", 0)))
    else:
        g = load_dataset(RunConfig(), args.dataset)
    labels = multiconstraint_partition(g.rowptr, g.col, args.parts, seed=0)
    rows = measure_budget(
        g, labels,
        alphas=[float(a) for a in args.alphas.split(",")],
        fanouts=[int(f) for f in args.fanouts.split(",")],
        batch_size=args.batch, step_time_s=args.step_ms * 1e-3)
    out = {"dataset": args.dataset, "world": args.parts,
           "batch": args.batch, "step_ms": args.step_ms,
           "num_features": int(-(-g.num_features // 128) * 128),
           "num_nodes": int(g.num_nodes), "num_edges": int(g.num_edges),
           "rows": [asdict(r) for r in rows]}
    s = json.dumps(out, indent=2)
    print(s)
    if args.out:
        with open(args.out, "w") as f:
            f.write(s)
    return out


if __name__ == "__main__":
    main()
