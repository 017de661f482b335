"""gsrc (layer-0 global-table aggregation) with the >HBM cold tier.

Round-3 review item #2: hbm_fraction<1 used to silently drop gsrc mode,
paying ~19-23% more gathered rows per >HBM step. Now the sampler remaps
cold frontier ids to slack slots (hot_cutoff + slot) and the trainer
writes each batch's cold rows into a slack region of the device feature
table before the step, so the single-gather gsrc path serves the cold
tier too. These tests pin the bit-equality contract:
  gsrc+cold == gsrc-off+cold == all-HBM gsrc (same values, same order).
"""

import jax
import numpy as np

from salient_plusplus_tpu.config import RunConfig
from salient_plusplus_tpu.train.loop import Trainer


def _run(graph, hbm_fraction, gsrc_mode, model="SAGE", cold_fp8=False,
         epochs=1):
    cfg = RunConfig(
        train_batch_size=256, test_batch_size=512,
        train_fanouts=[5, 3], batchwise_test_fanouts=[6, 6],
        final_test_fanouts=[6, 6], model_name=model,
        hidden_features=16, num_layers=2, lr=0.01, num_workers=2,
        calibration_batches=2, seed=4, hbm_fraction=hbm_fraction,
        gsrc_mode=gsrc_mode, cold_fp8=cold_fp8,
    )
    t = Trainer(cfg, graph)
    for e in range(epochs):
        t.train_epoch(e)
    acc = t.evaluate("valid")
    return t, jax.tree_util.tree_map(np.asarray, t.state.params), acc


def test_gsrc_cold_bit_equals_fallback(small_graph):
    """The gsrc slack-table path must bit-match the frontier-gather
    fallback (gsrc_mode=off) AND the all-HBM gsrc run: identical values
    aggregated in identical edge order."""
    t_on, p_on, acc_on = _run(small_graph, 0.5, "auto")
    t_off, p_off, acc_off = _run(small_graph, 0.5, "off")
    t_full, p_full, acc_full = _run(small_graph, 1.0, "auto")
    assert t_on.global_msg0 and t_on._gsrc_cold
    assert not t_off.global_msg0
    assert t_full.global_msg0 and not t_full._gsrc_cold
    for a, b in zip(jax.tree_util.tree_leaves(p_on),
                    jax.tree_util.tree_leaves(p_off)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree_util.tree_leaves(p_on),
                    jax.tree_util.tree_leaves(p_full)):
        np.testing.assert_array_equal(a, b)
    assert acc_on == acc_off == acc_full


def test_gsrc_cold_gin(small_graph):
    """GIN consumes raw features at layer 0 too — same contract."""
    _, p_on, acc_on = _run(small_graph, 0.5, "auto", model="GIN")
    _, p_off, acc_off = _run(small_graph, 0.5, "off", model="GIN")
    for a, b in zip(jax.tree_util.tree_leaves(p_on),
                    jax.tree_util.tree_leaves(p_off)):
        np.testing.assert_array_equal(a, b)
    assert acc_on == acc_off


def test_gsrc_cold_fp8(small_graph):
    """fp8 cold rows decode into the slack region; gsrc and fallback see
    the SAME decoded values → still bit-equal to each other."""
    t_on, p_on, acc_on = _run(small_graph, 0.5, "auto", cold_fp8=True,
                              epochs=2)
    _, p_off, acc_off = _run(small_graph, 0.5, "off", cold_fp8=True,
                             epochs=2)
    assert t_on._gsrc_cold
    for a, b in zip(jax.tree_util.tree_leaves(p_on),
                    jax.tree_util.tree_leaves(p_off)):
        np.testing.assert_array_equal(a, b)
    assert acc_on == acc_off


def test_gsrc_cold_slack_grows_with_cap(tiny_graph):
    """A sabotaged cold budget must grow AND extend the device table's
    slack region (else remapped slot ids would clamp into wrong rows)."""
    cfg = RunConfig(train_batch_size=64, train_fanouts=[5, 3],
                    batchwise_test_fanouts=[6, 6],
                    final_test_fanouts=[6, 6], hidden_features=16,
                    num_layers=2, lr=0.01, num_workers=1,
                    calibration_batches=2, seed=4, hbm_fraction=0.5)
    t = Trainer(cfg, tiny_graph)
    assert t._gsrc_cold
    H = t.hot_cutoff
    assert t.features.shape[0] == H + t._slack
    t.train_sampler.cfg.cold_cap = 128  # sabotage
    t.train_epoch(0)
    grown = t.train_sampler.cfg.cold_cap
    assert grown > 128
    assert t._slack >= grown
    assert t.features.shape[0] == H + t._slack
    # cap is clamped at the cold-tail size (cold rows are unique)
    assert grown <= t._cold_cap_max
    t.train_epoch(1)
    assert t.train_sampler.cfg.cold_cap == grown  # no more drops


def test_cold_cache_bit_equals_uncached(small_graph):
    """Device cold-row cache (cross-batch dedup): TRAINING through a
    small cache (constant evictions — the cold tail is ~2x the slots)
    must be bit-equal to the per-batch slack (cache off) and the all-HBM
    run. Eval on the small cache may legitimately drop over-capacity cold
    ids to the zero row (surfaced + self-correcting), so accuracy parity
    is asserted on the full-tail cache test below instead."""
    t_c, p_c, _ = _run_cached(small_graph, slots=512, epochs=2)
    _, p_u, _ = _run(small_graph, 0.5, "auto", epochs=2)
    _, p_f, _ = _run(small_graph, 1.0, "auto", epochs=2)
    cache = t_c._cold_cache
    assert cache is not None and cache.slots >= 512
    for a, b in zip(jax.tree_util.tree_leaves(p_c),
                    jax.tree_util.tree_leaves(p_u)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree_util.tree_leaves(p_c),
                    jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_array_equal(a, b)


def _run_cached(graph, slots, epochs=2, cold_fp8=False, seed=4):
    cfg = RunConfig(
        train_batch_size=256, test_batch_size=512,
        train_fanouts=[5, 3], batchwise_test_fanouts=[6, 6],
        final_test_fanouts=[6, 6], model_name="SAGE",
        hidden_features=16, num_layers=2, lr=0.01, num_workers=2,
        calibration_batches=2, seed=seed, hbm_fraction=0.5,
        cold_cache_slots=slots, cold_fp8=cold_fp8,
    )
    t = Trainer(cfg, graph)
    for e in range(epochs):
        t.train_epoch(e)
    acc = t.evaluate("valid")
    return t, jax.tree_util.tree_map(np.asarray, t.state.params), acc


def test_cold_cache_dedups_wire(small_graph):
    """The whole point: repeated cold rows must stop riding H2D. With
    slots covering the full cold tail, the steady-state hit rate
    approaches 1, misses collapse after warmup, and accuracy matches the
    uncached runs exactly (no drops)."""
    V = small_graph.num_nodes
    t, p_c, acc_c = _run_cached(small_graph, slots=V, epochs=2)
    cache = t._cold_cache
    total = cache.hits + cache.misses  # evaluate()'s epoch (post-reset)
    assert total > 0
    # eval epoch runs entirely against rows already inserted by training
    assert cache.hits / total > 0.95, (cache.hits, cache.misses)
    assert cache.dropped == 0
    _, p_u, acc_u = _run(small_graph, 0.5, "auto", epochs=2)
    for a, b in zip(jax.tree_util.tree_leaves(p_c),
                    jax.tree_util.tree_leaves(p_u)):
        np.testing.assert_array_equal(a, b)
    assert acc_c == acc_u


def test_cold_cache_fp8(small_graph):
    """fp8 miss rows decode into cache slots; same values as fp8 without
    the cache → bit-equal (full-tail slots: drop-free eval)."""
    _, p_c, acc_c = _run_cached(small_graph, slots=small_graph.num_nodes,
                                cold_fp8=True)
    t8 = Trainer(RunConfig(
        train_batch_size=256, test_batch_size=512,
        train_fanouts=[5, 3], batchwise_test_fanouts=[6, 6],
        final_test_fanouts=[6, 6], hidden_features=16, num_layers=2,
        lr=0.01, num_workers=2, calibration_batches=2, seed=4,
        hbm_fraction=0.5, cold_fp8=True), small_graph)
    for e in range(2):
        t8.train_epoch(e)
    acc_u = t8.evaluate("valid")
    p_u = jax.tree_util.tree_map(np.asarray, t8.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p_c),
                    jax.tree_util.tree_leaves(p_u)):
        np.testing.assert_array_equal(a, b)
    assert acc_c == acc_u


def test_cold_cache_unit_eviction():
    """HostColdCache invariants: hit protection, clock eviction, drops
    when over budget, id↔slot consistency."""
    from salient_plusplus_tpu.sampling.cold_cache import (
        HostColdCache, miss_rung)

    c = HostColdCache(num_cold_ids=100, slots=4)
    ids = np.array([10, 20, 30, 40])
    slot, miss = c.assign(ids, max_new=10)
    assert miss.all() and sorted(slot) == [0, 1, 2, 3]
    # all hits now
    slot2, miss2 = c.assign(ids, max_new=10)
    np.testing.assert_array_equal(slot2, slot)
    assert not miss2.any() and c.hits == 4
    # two hits + two new: eviction must skip the hit slots
    ids3 = np.array([10, 20, 50, 60])
    slot3, miss3 = c.assign(ids3, max_new=10)
    assert (slot3 >= 0).all()
    assert slot3[0] == slot[0] and slot3[1] == slot[1]
    assert set(slot3[2:]) == {slot[2], slot[3]}  # 30/40 evicted
    assert c.slot_of[30] == -1 and c.slot_of[40] == -1
    # over-budget: only max_new misses get slots
    ids4 = np.array([70, 80, 90])
    slot4, miss4 = c.assign(ids4, max_new=1)
    assert (slot4 >= 0).sum() == 1 and miss4.sum() == 1
    assert c.dropped == 2
    # id↔slot maps stay mutually consistent
    live = np.flatnonzero(c.id_at >= 0)
    for s in live:
        assert c.slot_of[c.id_at[s]] == s
    # miss_rung ladder
    assert miss_rung(0, 1024) == 128
    assert miss_rung(128, 1024) == 128
    assert miss_rung(129, 1024) == 256
    assert miss_rung(1000, 1024) == 1024
    assert miss_rung(5000, 1024) == 5000 or miss_rung(5000, 1024) >= 1024


def test_cold_cache_config_rejections():
    import pytest

    with pytest.raises(ValueError, match="cold tier"):
        RunConfig(cold_cache_slots=100, hbm_fraction=1.0)
    with pytest.raises(ValueError, match="FastSampler"):
        RunConfig(cold_cache_slots=100, hbm_fraction=0.5,
                  train_sampler="FastPreSampler")
    with pytest.raises(ValueError, match="gsrc"):
        RunConfig(cold_cache_slots=100, hbm_fraction=0.5, gsrc_mode="off")
