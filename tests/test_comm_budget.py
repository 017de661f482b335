"""Pod-scale feature-comm budget: machinery + recorded-artifact checks.

North star (BASELINE.md): <10% of step time in feature communication.
The exchange's wire volume is a compiled shape (world · r_cap rows), so
the budget is checkable arithmetic, not vibes: VIP caching must shrink
r_cap, the shrink must track the comm-volume simulator's prediction, and
the recorded products-scale artifact must satisfy the north star.
"""

import json
import os

import numpy as np
import pytest

from salient_plusplus_tpu.caching.comm_budget import (
    LINK_RATES, comm_share, measure_budget, wire_bytes_per_step)
from salient_plusplus_tpu.data import synthetic
from salient_plusplus_tpu.partition import multiconstraint_partition

ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "comm_budget_products.json")


def test_comm_share_arithmetic():
    # 8 dests x 1024 rows x (4 + 200) bytes = 1.67 MB/step
    wb = wire_bytes_per_step(world=8, r_cap=1024, num_features=100)
    assert wb == 8 * 1024 * (4 + 200)
    # at 100 GB/s and a 16 ms step that is ~0.1% of the step
    assert comm_share(wb, 16e-3, LINK_RATES["v5p_ici"]) < 0.002
    # fp8 wire: F+4 bytes/row
    assert wire_bytes_per_step(8, 1024, 100, wire_fp8=True) \
        == 8 * 1024 * (4 + 104)


def test_budget_tracks_simulator():
    """Post-cache r_cap must shrink with replication, and its shrink must
    track the simulator's cross-traffic prediction (within the safety/
    max-vs-mean slack)."""
    # powerlaw: skewed access distribution, the regime VIP caching is
    # built for (planted-partition's uniform degrees barely move the
    # 128-aligned cap at small α)
    g = synthetic.powerlaw_graph(
        name="budget", num_nodes=6000, num_classes=6, avg_degree=10,
        num_features=32, seed=5)
    labels = multiconstraint_partition(g.rowptr, g.col, 4, seed=0)
    rows = measure_budget(g, labels, alphas=(0.0, 0.05, 0.5),
                          fanouts=(5, 3), batch_size=256)
    assert [r.alpha for r in rows] == [0.0, 0.05, 0.5]
    r0, r5, r20 = rows
    # caching never increases the budget; a 50% cache must shrink it
    assert r5.r_cap <= r0.r_cap
    assert r20.r_cap < r0.r_cap
    # simulator agreement: the compiled-budget reduction is at least half
    # the simulator-predicted mean cross-traffic reduction (r_cap is a
    # 128-aligned worst-case x1.3 safety, so it lags the mean)
    sim_ratio = r20.sim_cross_per_batch / max(r0.sim_cross_per_batch, 1)
    cap_ratio = r20.r_cap / r0.r_cap
    assert sim_ratio < 1.0
    assert cap_ratio <= 1.0
    assert cap_ratio <= 0.5 + sim_ratio, (cap_ratio, sim_ratio)
    # wire bytes follow r_cap exactly (lane-padded row width)
    for r in rows:
        assert r.wire_bytes_per_step == wire_bytes_per_step(
            4, r.r_cap, -(-g.num_features // 128) * 128)


def test_products_scale_artifact_meets_north_star():
    """The recorded products-scale budget (docs/comm_budget_products.json,
    produced by `python -m salient_plusplus_tpu.caching.comm_budget`)
    must satisfy the <10% ICI north star at the default 10% replication,
    and the formula must reproduce the recorded numbers."""
    if not os.path.exists(ARTIFACT):
        pytest.skip("products-scale artifact not yet generated")
    with open(ARTIFACT) as f:
        art = json.load(f)
    rows = {r["alpha"]: r for r in art["rows"]}
    assert 0.1 in rows
    r = rows[0.1]
    assert r["comm_share_ici"] < 0.10, r
    # formula reproducibility
    assert r["wire_bytes_per_step"] == art["world"] * r["r_cap"] * (
        4 + 2 * art["num_features"])
    assert r["comm_share_ici"] == round(comm_share(
        r["wire_bytes_per_step"], art["step_ms"] * 1e-3,
        LINK_RATES["v5p_ici"]), 6)
    # caching reduced the compiled budget vs no cache
    assert r["r_cap"] < rows[0.0]["r_cap"]


@pytest.mark.serial
def test_host_overhead_marginal_bound(tmp_path):
    """Measured complement to the analytic ICI budget (the >=80% 1->2-host
    north star): the marginal HOST-side orchestration cost of a process
    boundary — per-step bucket-agreement psum, assembly, cold serve —
    must stay a small fraction of an epoch. Regression guard for the
    two-deep pipeline in dist_loop.train_epoch (a blocking per-step
    collective back on the critical path showed up as ~2 epochs' worth
    of marginal host time on this proxy; pipelined it is ~2%).

    serial (NOT under xdist): the harness runs 3 measurement processes
    (1 parent with 8 CPU devices + 2 cluster workers with 4 each) on a
    4-core host. Under `-n auto` three OTHER xdist workers compete for
    the same cores, so the blocking psum read measures PEER COMPUTE
    preemption, not orchestration — the round-4 red suite was exactly
    this (bucket_psum 0.20 s/epoch under load vs ~0.02x wall isolated).
    The 0.5x bound is sized for a quiet machine: isolated runs measure
    0.02-0.1x wall; a genuine return of the blocking-psum structure bug
    measured ~2.0x."""
    import subprocess
    import sys

    out = str(tmp_path / "scalh.json")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "SCALH_NODES": "4096", "SCALH_EPOCHS": "3",
                "PYTHONPATH": os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))})
    r = subprocess.run(
        [sys.executable, "-m", "experiments.scaling_harness", "--out", out],
        env=env, capture_output=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout.decode()[-2000:] + \
        r.stderr.decode()[-2000:]
    with open(out) as f:
        res = json.load(f)
    wall = res["one_process"]["epoch_wall_s"]
    # generous: the CPU proxy shares 4 cores between "devices" and hosts;
    # the pre-fix regression measured ~2.0x wall, the fixed loop ~0.02x
    assert res["marginal_host_s"] < 0.5 * wall, res
    # losses must agree across process counts (same math, same seeds)
    a = res["one_process"]["loss_final"]
    b = res["two_process"]["loss_final"]
    assert abs(a - b) < 1e-5, (a, b)
