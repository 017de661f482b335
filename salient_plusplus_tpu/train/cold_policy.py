"""H2D-credit-driven cold-cache policy (>HBM tier).

Round-4 finding (PERF_NOTES r4 findings 3-4; VERDICT r4 weak #4): the
device cold-row cache halves the >HBM wire but LOSES steady-state
throughput when the link is healthy (hbm=0.75: 36.4 -> 23.5M e/s), and
wins when the link is thin (hbm=0.5 min-window: 17.5 vs 15.9M; at a
~160 MB/s drained credit the no-cache demand collapses 4-5x vs 2.2x).
Which regime a run is in is decided by ONE measurable signal — the
link's H2D credit vs the run's projected H2D demand — that the stack
already measures (bench preflight burst, live h2d_required). A knob is
not a policy; this module computes the choice.

Model (every input measurable before the first training step):

- projected no-cache H2D demand at an assumed chip-bound rate T e/s:
      demand = T / edges_per_batch * bytes_per_batch
  where bytes_per_batch = base (indices, labels, mirrors) + cold
  payload (cold_cap rows x row bytes).
- the cache converts HIT rows to zero wire. Post-VIP cold access is
  near-uniform (measured: hit rate ~= slot fraction, PERF_NOTES r4
  finding 4 — the VIP-ordered hot prefix already absorbed the skew),
  so a slot fraction s cuts the cold payload by ~s.
- enable the cache iff demand exceeds the credit (the run would be
  wire-bound without it); size the slots so the residual demand fits
  inside the credit with margin. On a healthy link the plan is 0 slots
  and the cheaper no-cache path keeps its measured win.

Reference parity: the reference's feature cache exists precisely to
make repeated remote fetches cheap (range_partition_book.cpp:116-195);
it never needs a policy because PCIe is never its bottleneck — a
host-RAM cold tier behind a thin link is.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class ColdCachePlan:
    slots: int                      # 0 = cache off
    projected_demand_mbs: float     # no-cache H2D demand at assumed rate
    residual_demand_mbs: float      # projected demand with `slots` active
    credit_mbs: float               # the measured link credit used
    reason: str                     # one-line human-readable verdict


def plan_cold_cache(credit_mbs: float,
                    chip_rate_eps: float,
                    edges_per_batch: float,
                    base_bytes_per_batch: float,
                    cold_bytes_per_batch: float,
                    cold_tail_rows: int,
                    margin: float = 0.8,
                    align: int = 128) -> ColdCachePlan:
    """Decide cache slots from the measured link credit.

    ``margin`` discounts the credit (bursts decay to a lower sustained
    rate on the remote tunnel; on a PCIe host margin~1 is fine).
    ``cold_bytes_per_batch`` is the no-cache cold payload (cold_cap x
    wire row bytes); ``cold_tail_rows`` the total cold-tail size (the
    slot-count clamp and the hit-rate denominator)."""
    per_batch = base_bytes_per_batch + cold_bytes_per_batch
    batches_per_s = chip_rate_eps / max(edges_per_batch, 1.0)
    demand = batches_per_s * per_batch / 1e6
    budget = credit_mbs * margin
    if demand <= budget or cold_bytes_per_batch <= 0:
        return ColdCachePlan(
            0, round(demand, 1), round(demand, 1), credit_mbs,
            f"no-cache demand {demand:.0f} MB/s fits credit "
            f"{credit_mbs:.0f}x{margin} — cache would only add host cost "
            "(measured loss on healthy links, PERF_NOTES r4 finding 3)")
    # required cut of the cold payload so residual demand fits budget;
    # hit rate ~= slot fraction (near-uniform residual stream)
    cold_mbs = batches_per_s * cold_bytes_per_batch / 1e6
    base_mbs = demand - cold_mbs
    need_cut = (demand - budget) / max(cold_mbs, 1e-9)
    s = min(1.0, max(0.0, need_cut))
    slots = min(int(cold_tail_rows),
                int(-(-s * cold_tail_rows // align) * align))
    residual = base_mbs + cold_mbs * (1 - slots / max(cold_tail_rows, 1))
    return ColdCachePlan(
        slots, round(demand, 1), round(residual, 1), credit_mbs,
        f"no-cache demand {demand:.0f} MB/s exceeds credit "
        f"{credit_mbs:.0f}x{margin} — wire-bound regime; "
        f"{slots} slots (~{slots / max(cold_tail_rows, 1):.0%} of tail) "
        f"project residual {residual:.0f} MB/s")


def measure_h2d_credit(device=None, mb: int = 32,
                       seed: int = 7) -> Optional[float]:
    """Burst H2D rate to ``device`` (MB/s) with a fresh uncached buffer —
    the same probe bench.py's preflight uses. Returns None on CPU
    backends (no meaningful link)."""
    import time

    import jax
    import numpy as np

    device = device or jax.devices()[0]
    if device.platform == "cpu":
        return None
    rng = np.random.default_rng(seed)
    # handshake/alloc must not count against the credit
    jax.block_until_ready(jax.device_put(
        np.zeros((1024, 1024), np.uint8), device))
    a = rng.integers(0, 255, size=(mb, 1024, 1024), dtype=np.uint8)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(a, device))
    return float(mb) / max(time.perf_counter() - t0, 1e-9)


def estimate_batch_bytes(batch) -> int:
    """Wire bytes of one prepared batch: the H2D payload is exactly the
    padded-batch pytree's array bytes (what DeviceFeeder ships)."""
    import jax

    return sum(getattr(leaf, "nbytes", 0)
               for leaf in jax.tree_util.tree_leaves(batch))
