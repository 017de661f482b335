"""H2D-credit cold-cache policy (train/cold_policy.py) + the folded
slack-update step (cold_fold_update): the round-4 review's "a knob is
not a policy" item. Pure-plan tests + CPU-mesh equivalence of the
folded step against the separate-updater golden."""

import numpy as np
import pytest

from salient_plusplus_tpu.config import RunConfig
from salient_plusplus_tpu.data import synthetic
from salient_plusplus_tpu.train.cold_policy import (
    ColdCachePlan, plan_cold_cache)


def test_healthy_link_disables_cache():
    # r4 measured regime: hbm=0.75 demand ~600 MB/s vs 1300 MB/s burst —
    # the cache lost throughput there (PERF_NOTES r4 finding 3)
    p = plan_cold_cache(credit_mbs=1300, chip_rate_eps=45e6,
                        edges_per_batch=650_000,
                        base_bytes_per_batch=2.3e6,
                        cold_bytes_per_batch=6.0e6,
                        cold_tail_rows=250_000)
    assert p.slots == 0
    assert p.projected_demand_mbs < 1300 * 0.8


def test_thin_link_enables_and_sizes_cache():
    # thin-credit regime: no-cache demand ~575 MB/s vs a 300 MB/s
    # credit → wire-bound; the plan must cut just enough cold payload
    # that the residual fits 0.8x credit (a partial cache, not all-on)
    p = plan_cold_cache(credit_mbs=300, chip_rate_eps=45e6,
                        edges_per_batch=650_000,
                        base_bytes_per_batch=2.3e6,
                        cold_bytes_per_batch=6.0e6,
                        cold_tail_rows=250_000)
    assert 0 < p.slots < 250_000
    assert p.slots % 128 == 0
    # hit ≈ slot fraction: the residual projection reflects the cut
    frac = p.slots / 250_000
    assert p.residual_demand_mbs == pytest.approx(
        p.projected_demand_mbs - (45e6 / 650_000) * 6.0e6 / 1e6 * frac,
        rel=0.05)
    # and the residual lands at (or just under) the discounted budget
    assert p.residual_demand_mbs <= 300 * 0.8 + 1


def test_drained_credit_caches_everything():
    # r3's drained regime (~160 MB/s): base demand alone exceeds the
    # budget, so even a full cache can't fit — clamp at the whole tail
    # (best achievable; the run stays wire-bound and the plan says so)
    p = plan_cold_cache(credit_mbs=160, chip_rate_eps=45e6,
                        edges_per_batch=650_000,
                        base_bytes_per_batch=2.3e6,
                        cold_bytes_per_batch=6.0e6,
                        cold_tail_rows=250_000)
    assert p.slots == 250_000
    assert p.residual_demand_mbs > 160 * 0.8  # still wire-bound, visibly


def test_credit_below_base_caches_whole_tail():
    # even a full cache can't fit the budget → clamp at the whole tail
    p = plan_cold_cache(credit_mbs=5, chip_rate_eps=45e6,
                        edges_per_batch=650_000,
                        base_bytes_per_batch=2.3e6,
                        cold_bytes_per_batch=6.0e6,
                        cold_tail_rows=10_000)
    assert p.slots == 10_000


def test_no_cold_payload_is_noop():
    p = plan_cold_cache(credit_mbs=10, chip_rate_eps=45e6,
                        edges_per_batch=650_000,
                        base_bytes_per_batch=2.3e6,
                        cold_bytes_per_batch=0,
                        cold_tail_rows=0)
    assert p.slots == 0


def _trainer(g, **kw):
    from salient_plusplus_tpu.train.loop import Trainer

    cfg = RunConfig(
        train_batch_size=128, train_fanouts=[5, 3],
        batchwise_test_fanouts=[6, 6], final_test_fanouts=[6, 6],
        hidden_features=32, num_layers=2, lr=0.01, num_workers=2,
        calibration_batches=3, seed=0, hbm_fraction=0.6, **kw)
    return Trainer(cfg, g)


@pytest.fixture(scope="module")
def cold_graph():
    from salient_plusplus_tpu.data.reorder import hot_order_graph

    g = synthetic.powerlaw_graph(
        name="foldg", num_nodes=4000, num_classes=5, avg_degree=8,
        num_features=24, seed=6)
    g, _ = hot_order_graph(g)
    return g


def test_fold_update_matches_separate_updater(cold_graph):
    """cold_fold_update folds the cache's slack scatter into the train
    step (donated feature table, top-rung-only miss buffers). Same
    seeds, same cache policy → the loss trajectory must match the
    separate-updater golden exactly (identical math, different program
    structure)."""
    losses = {}
    for fold in (False, True):
        t = _trainer(cold_graph, cold_cache_slots=1024,
                     cold_fold_update=fold)
        assert (t._fold_cold) == fold
        losses[fold] = [t.train_epoch(e) for e in range(2)]
        assert t._cold_cache is not None
        assert t._cold_cache.hits + t._cold_cache.misses >= 0
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_fold_update_nocache_matches_separate_updater(cold_graph):
    """The fold lever also applies to the PLAIN cold tier (no cache):
    _cold_update's per-batch dynamic_update_slice dispatch moves inside
    the step. Identical math → identical loss trajectory."""
    losses = {}
    for fold in (False, True):
        t = _trainer(cold_graph, cold_fold_update=fold)
        assert t._fold_cold == fold
        assert t._cold_cache is None
        losses[fold] = [t.train_epoch(e) for e in range(2)]
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_auto_policy_on_cpu_backend_disables(cold_graph):
    """CPU backend has no link: auto resolves to 0 slots and training
    runs the plain no-cache cold tier."""
    t = _trainer(cold_graph, cold_cache_slots=-1)
    assert t._cold_cache is None
    assert t.train_epoch(0) > 0


def test_auto_policy_with_simulated_credit(cold_graph):
    """A thin simulated credit (h2d_credit_mbs) must enable the cache
    with a plan recorded; a fat one must disable it."""
    thin = _trainer(cold_graph, cold_cache_slots=-1, h2d_credit_mbs=2.0)
    assert thin.cold_plan is not None and thin.cold_plan.slots > 0
    assert thin._cold_cache is not None
    l0 = thin.train_epoch(0)
    assert np.isfinite(l0)
    # the cache actually engaged (per-epoch hit/miss counters are
    # reset+logged at epoch end, so check the live slot map)
    assert (thin._cold_cache.id_at >= 0).any()

    fat = _trainer(cold_graph, cold_cache_slots=-1, h2d_credit_mbs=1e5)
    assert fat.cold_plan is not None and fat.cold_plan.slots == 0
    assert fat._cold_cache is None


def test_config_validation():
    with pytest.raises(ValueError, match="cold_fold_update"):
        RunConfig(cold_fold_update=True)
    with pytest.raises(ValueError, match="auto"):
        RunConfig(cold_cache_slots=-1)  # needs a cold tier
    with pytest.raises(ValueError):
        RunConfig(cold_cache_slots=-2)
