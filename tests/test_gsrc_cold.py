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
