"""Distributed trainer end-to-end on the virtual CPU mesh: learning,
cache installation cutting remote traffic, equal-iteration invariants."""

import numpy as np
import pytest

from salient_plusplus_tpu.config import RunConfig
from salient_plusplus_tpu.data import synthetic
from salient_plusplus_tpu.parallel import make_mesh
from salient_plusplus_tpu.partition import multiconstraint_partition
from salient_plusplus_tpu.train.dist_loop import DistributedTrainer

WORLD = 4


@pytest.fixture(scope="module")
def dist_trainer():
    g = synthetic.planted_partition(
        name="dist", num_nodes=4000, num_classes=8, avg_degree=10,
        num_features=32, seed=11)
    # flat partition on purpose: the cache-cuts-wire-bytes test needs
    # enough CROSS-partition traffic that VIP caching shrinks the
    # request budget by a whole 128-row bucket; the multilevel
    # partitioner cuts this small graph so well that little remains
    labels = multiconstraint_partition(g.rowptr, g.col, WORLD, seed=0,
                                       multilevel=False)
    cfg = RunConfig(
        train_batch_size=128, test_batch_size=256,
        train_fanouts=[6, 4], batchwise_test_fanouts=[8, 8],
        final_test_fanouts=[8, 8], hidden_features=32, num_layers=2,
        lr=0.01, num_workers=2, calibration_batches=3, seed=0,
        load_balance_scheme="federated", cache_size=0.3,
    )
    return DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))


def test_distributed_training_learns(dist_trainer):
    t = dist_trainer
    m0 = t.train_epoch(0)
    m1 = t.train_epoch(1)
    m2 = t.train_epoch(2)
    assert m2["loss"] < m0["loss"]
    assert m0["overflow"] == 0
    assert m0["remote"] > 0  # cross-partition traffic exists
    assert m0["iters"] == t.iters_per_epoch
    acc = t.evaluate("valid")
    assert acc > 0.4, acc  # 8 classes → chance 0.125


def test_cache_cuts_remote_traffic(dist_trainer):
    t = dist_trainer
    before = t.train_epoch(3)
    t.create_cache()
    after = t.train_epoch(4)
    assert after["cache_hits"] > 0
    assert after["remote"] < before["remote"]
    assert after["sent_bytes"] < before["sent_bytes"]
    # cache-aware r_cap recalibration must shrink the REAL all_to_all
    # payload, not just the useful-rows statistic (reference parity:
    # transferers.py:507-531 — wire payloads genuinely shrink), and
    # roughly in line with the measured remote-traffic reduction
    assert after["r_cap"] < before["r_cap"], (before["r_cap"],
                                              after["r_cap"])
    assert after["wire_bytes"] < before["wire_bytes"]
    assert after["overflow"] == 0
    # identity: every valid frontier vertex classified exactly once
    assert (after["remote"] + after["cache_hits"] + after["local"]) > 0
    # training still learns with the cache installed
    m = t.train_epoch(5)
    assert np.isfinite(m["loss"])
    acc = t.evaluate("valid")
    assert acc > 0.4, acc


def test_cache_rows_are_correct(dist_trainer):
    """Cached feature rows fetched through the exchange must equal the
    true rows of those vertices."""
    t = dist_trainer
    cache = t.cache if t.cache is not None else t.create_cache()
    ids = np.asarray(cache.vertices)
    rows = np.asarray(cache.features, np.float32)
    # reconstruct global features from the sharded array
    xs = np.asarray(t.features, np.float32)
    for d in range(WORLD):
        np.testing.assert_allclose(rows[d], xs[ids[d]], rtol=1e-2, atol=1e-2)
        # cache contains only remote vertices for its device
        owner = np.searchsorted(t.part_offsets[1:], ids[d], side="right")
        assert np.all(owner != d)


def test_fully_random_scheme(dist_trainer):
    """fully_random load balance: same global permutation sliced per rank."""
    g = synthetic.planted_partition(
        name="dist2", num_nodes=2000, num_classes=4, avg_degree=8,
        num_features=16, seed=2)
    from salient_plusplus_tpu.partition import contiguous_partition

    labels = contiguous_partition(g.num_nodes, WORLD)
    cfg = RunConfig(
        train_batch_size=64, train_fanouts=[4, 3],
        hidden_features=16, num_layers=2, lr=0.01, num_workers=1,
        calibration_batches=2, seed=1, load_balance_scheme="fully_random",
    )
    t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
    m = t.train_epoch(0)
    assert np.isfinite(m["loss"])
    assert m["overflow"] == 0


def test_from_partitioned_on_disk(tmp_path):
    """Disk path: reorder_and_save then from_partitioned must train."""
    from salient_plusplus_tpu.data.reorder import reorder_and_save
    from salient_plusplus_tpu.partition import contiguous_partition

    g = synthetic.planted_partition(
        name="diskd", num_nodes=2000, num_classes=4, avg_degree=8,
        num_features=16, seed=9)
    labels = contiguous_partition(g.num_nodes, WORLD)
    reorder_and_save(g, labels, str(tmp_path))
    cfg = RunConfig(
        train_batch_size=64, train_fanouts=[4, 3],
        batchwise_test_fanouts=[5, 5], final_test_fanouts=[5, 5],
        hidden_features=16, num_layers=2, lr=0.01, num_workers=1,
        calibration_batches=2, seed=1,
    )
    from salient_plusplus_tpu.parallel import make_mesh as mk

    t = DistributedTrainer.from_partitioned(
        cfg, str(tmp_path), f"diskd-reordered-k{WORLD}", mesh=mk(WORLD))
    m = t.train_epoch(0)
    assert np.isfinite(m["loss"]) and m["overflow"] == 0
    acc = t.evaluate("valid")
    assert 0 <= acc <= 1


def test_distributed_cold_tier_equivalent():
    """hbm_fraction<1 in distributed mode must bit-match the all-HBM run —
    both with host-replicated cold tails and with the owner-served tier
    (per-host storage O(V/k); reference N7, fast_sampler.cpp:716-776)."""
    import jax

    g = synthetic.planted_partition(
        name="coldd", num_nodes=3000, num_classes=4, avg_degree=8,
        num_features=16, seed=4)
    from salient_plusplus_tpu.partition import contiguous_partition

    labels = contiguous_partition(g.num_nodes, WORLD)

    def run(frac, mode="replicated"):
        cfg = RunConfig(
            train_batch_size=64, train_fanouts=[4, 3],
            batchwise_test_fanouts=[5, 5], final_test_fanouts=[5, 5],
            hidden_features=16, num_layers=2, lr=0.01, num_workers=2,
            calibration_batches=2, seed=6, hbm_fraction=frac,
            cold_mode=mode,
            # exact bf16 wire: this test asserts BIT-equality between the
            # tiers; the fp8 default quantizes exchange rows in the full-
            # HBM run that the cold runs serve exactly from host RAM
            wire_fp8=False,
        )
        t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
        m = t.train_epoch(0)
        acc = t.evaluate("valid")
        return (jax.tree_util.tree_map(np.asarray, t.state.params),
                m, acc, t)

    p_full, m_full, acc_full, _ = run(1.0)
    p_half, m_half, acc_half, _ = run(0.5)
    p_own, m_own, acc_own, t_own = run(0.5, mode="owner")
    assert m_half["overflow"] == 0 and m_own["overflow"] == 0
    # cold rows exist and remote traffic shrank (cold rows skip the
    # exchange entirely)
    assert m_half["remote"] < m_full["remote"]
    assert m_own["remote"] == m_half["remote"]
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_half)):
        np.testing.assert_array_equal(a, b)
    # owner-served tier: same math, O(V/k) host storage
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_own)):
        np.testing.assert_array_equal(a, b)
    assert acc_full == acc_half == acc_own
    # per-device cold storage is exactly its own partition's tail
    S = t_own.part_size
    H = t_own.hot_size
    assert t_own.x_cold is None
    assert len(t_own.x_cold_own) == WORLD
    for tail in t_own.x_cold_own:
        assert tail.shape[0] == S - H


def test_distributed_gat(dist_trainer, monkeypatch):
    """Non-SAGE model through the full SPMD path. With the custom-VJP
    attention opted in (SPTPU_GAT_CUSTOM_VJP — default off since the r5
    on-chip A/B measured it slower than autodiff), the distributed specs
    must carry mirror_all and the production batches an OUTER-hop mirror
    (round-4 gap: only the single-chip Trainer set mirror_all, so
    multichip runs silently lost the mirror plumbing)."""
    monkeypatch.setenv("SPTPU_GAT_CUSTOM_VJP", "1")
    g = synthetic.planted_partition(
        name="gatd", num_nodes=2000, num_classes=4, avg_degree=8,
        num_features=16, seed=12)
    from salient_plusplus_tpu.partition import contiguous_partition

    labels = contiguous_partition(g.num_nodes, WORLD)
    cfg = RunConfig(
        train_batch_size=64, train_fanouts=[4, 3],
        batchwise_test_fanouts=[5, 5], final_test_fanouts=[5, 5],
        model_name="GAT", hidden_features=16, num_layers=2, lr=0.01,
        num_workers=1, calibration_batches=2, seed=2,
    )
    t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
    assert t.train_spec.mirror_all
    if t.train_tight is not None:
        assert t.train_tight.mirror_all
    # a batch off the production sampler pipeline carries the outermost
    # hop's src-sorted mirror (edges[0] = outer hop, processing order)
    its, _ = t._epoch_iterators(0)
    b = next(its[0])
    pb = b.to_padded_batch(b.bucket)
    e0 = pb.edges[0]
    assert e0.msrc is not None or e0.msrc_lo is not None
    its[0].recycle(b)
    for it in its:
        it.close()
    m0 = t.train_epoch(0)
    m1 = t.train_epoch(1)
    assert np.isfinite(m1["loss"]) and m1["loss"] < m0["loss"]
    assert 0 <= t.evaluate("valid") <= 1


@pytest.mark.parametrize("model", ["GAT", "GCN"])
def test_dist_mirror_backward_matches_scatter_add(model, monkeypatch):
    """SPMD training with mirror_all specs (production for GCN/ARMA;
    env-opt-in for GAT) must match the mirror-free golden: two
    identically-seeded distributed runs — mirrors on vs forcibly off —
    produce the same loss trajectory. Same sampled batches (mirror
    emission never changes the sampled edges), so any divergence is the
    mirror plumbing (emission, wire packing, stacking, backward gate)."""
    monkeypatch.setenv("SPTPU_GAT_CUSTOM_VJP", "1")
    import salient_plusplus_tpu.train.dist_loop as dl
    from salient_plusplus_tpu.partition import contiguous_partition

    g = synthetic.planted_partition(
        name=f"mirr-{model}", num_nodes=1500, num_classes=4, avg_degree=8,
        num_features=16, seed=9)
    labels = contiguous_partition(g.num_nodes, WORLD)
    cfg = RunConfig(
        train_batch_size=64, train_fanouts=[4, 3],
        batchwise_test_fanouts=[5, 5], final_test_fanouts=[5, 5],
        model_name=model, hidden_features=16, num_layers=2, lr=0.05,
        num_workers=1, calibration_batches=2, seed=4,
    )
    losses = {}
    for mirrored in (True, False):
        orig = dl.mirror_all_specs
        if not mirrored:
            dl.mirror_all_specs = lambda name, spec, tight=None: (spec,
                                                                  tight)
        try:
            t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
        finally:
            dl.mirror_all_specs = orig
        assert t.train_spec.mirror_all == mirrored
        losses[mirrored] = [t.train_epoch(e)["loss"] for e in range(2)]
    # epoch-0 losses are pre-update-dominated; epoch 1 runs on weights
    # produced by epoch-0 GRADIENTS — match there proves the backward
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4)


def test_overflow_grows_r_cap():
    """A too-small request budget must not silently drop rows forever:
    the trainer grows r_cap after an overflowing epoch (VERDICT round-1
    calibration-hardening item; the reference never drops data, N9/N10)."""
    g = synthetic.planted_partition(
        name="ovf", num_nodes=4000, num_classes=8, avg_degree=10,
        num_features=32, seed=12)
    labels = multiconstraint_partition(g.rowptr, g.col, WORLD, seed=0)
    cfg = RunConfig(
        train_batch_size=128, test_batch_size=256,
        train_fanouts=[6, 4], batchwise_test_fanouts=[8, 8],
        final_test_fanouts=[8, 8], hidden_features=32, num_layers=2,
        lr=0.01, num_workers=2, calibration_batches=3, seed=0,
        load_balance_scheme="federated",
    )
    t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
    assert t.r_cap > 128  # calibrated budget is comfortably larger
    t.r_cap = 128         # sabotage: force a drop-inducing budget
    t._build_steps(with_cache=False)
    caps = [t.r_cap]
    overflows = []
    for epoch in range(4):
        m = t.train_epoch(epoch)
        overflows.append(m["overflow"])
        caps.append(t.r_cap)
        if m["overflow"] == 0:
            break
    assert overflows[0] > 0, "sabotaged budget should overflow"
    assert caps[-1] > 128, "r_cap must grow after overflow"
    assert overflows[-1] == 0, (
        f"growth must reach a non-dropping budget: {overflows} {caps}")


def test_cold_r_cap_grows_after_drops():
    """Owner-served tier: a short per-owner cold budget self-corrects."""
    g = synthetic.planted_partition(
        name="ovfc", num_nodes=4000, num_classes=8, avg_degree=10,
        num_features=32, seed=13)
    labels = multiconstraint_partition(g.rowptr, g.col, WORLD, seed=0)
    cfg = RunConfig(
        train_batch_size=96, test_batch_size=128,
        train_fanouts=[6, 4], batchwise_test_fanouts=[8, 8],
        final_test_fanouts=[8, 8], hidden_features=32, num_layers=2,
        lr=0.01, num_workers=2, calibration_batches=3, seed=0,
        load_balance_scheme="federated", hbm_fraction=0.75,
        cold_mode="owner",
    )
    t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
    assert t.cold_r_cap > 16
    t.cold_r_cap = 16  # sabotage: both the exchange cap and pool sizing
    for smp in t.samplers:
        smp.cfg.cold_r_cap = 16
    t.train_epoch(0)
    grown = t.cold_r_cap
    assert grown > 16, "cold_r_cap must grow after drops"
    assert all(smp.cfg.cold_r_cap == grown for smp in t.samplers)
    t.train_epoch(1)
    assert t.cold_r_cap == grown, "regrown budget must stop dropping"


def test_dist_spec_grows_after_cap_overflow():
    """Distributed cap overflow self-corrects via globally-agreed drop
    counts (every process must grow to identical compiled shapes)."""
    from salient_plusplus_tpu.sampling.batch import BatchSpec

    g = synthetic.planted_partition(
        name="ovfs", num_nodes=4000, num_classes=8, avg_degree=10,
        num_features=32, seed=14)
    labels = multiconstraint_partition(g.rowptr, g.col, WORLD, seed=0)
    cfg = RunConfig(
        train_batch_size=96, test_batch_size=128,
        train_fanouts=[6, 4], batchwise_test_fanouts=[8, 8],
        final_test_fanouts=[8, 8], hidden_features=32, num_layers=2,
        lr=0.01, num_workers=2, calibration_batches=3, seed=0,
        load_balance_scheme="federated",
    )
    t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
    spec = t.train_spec
    node_caps = [spec.node_caps[0]]
    for v in spec.node_caps[1:]:
        node_caps.append(max(node_caps[-1],
                             (max(128, int(v * 0.5)) // 128) * 128))
    sab = BatchSpec(spec.fanouts, spec.seed_cap, tuple(node_caps),
                    tuple((max(512, int(v * 0.5)) // 512) * 512
                          for v in spec.edge_caps))
    assert sab != spec
    t.train_spec = sab
    t.train_tight = None
    for smp in t.samplers:
        smp.cfg.spec = sab
        smp.cfg.tight_spec = None

    def overflow_events():
        return sum(1 for e in t.logger.events
                   if isinstance(e, tuple)
                   and e[0] == "WARNING_TRAIN_DROPPED")

    t.train_epoch(0)
    assert overflow_events() > 0, "sabotaged spec must truncate"
    assert t.train_spec != sab, "spec must grow after overflow"
    for epoch in range(1, 5):
        before = overflow_events()
        t.train_epoch(epoch)
        if overflow_events() == before:
            break
    else:
        raise AssertionError("growth never reached a non-truncating spec")


def test_eval_exchange_overflow_self_corrects(dist_trainer):
    """An eval request budget proven too small must be surfaced (the
    accuracy ran on zero-filled rows) and the split's cached eval entry
    rebuilt with a grown r_cap, so the next evaluate() stops overflowing."""
    t = dist_trainer
    orig = t._calibrate_r_cap

    def tiny(*a, **k):
        return 128  # deliberately short budget

    t._calibrate_r_cap = tiny
    try:
        t.evaluate("valid")
        key = next(k for k in t.eval_specs if k[0] == "valid")
        _, _, _, e_rcap, _ = t.eval_specs[key]
        # overflow must have been detected and the budget grown past the
        # probe's 128 (>= 1.25x growth, 128-aligned)
        assert e_rcap >= 256, e_rcap
    finally:
        t._calibrate_r_cap = orig
        t.eval_specs.clear()
    # clean run after recalibration: entry rebuilt with the honest probe
    acc = t.evaluate("valid")
    assert 0.0 <= acc <= 1.0


def test_wire_fp8_trains_and_shrinks_payload():
    """wire_fp8=True: training still learns (fp8 noise is below SGD noise),
    overflow stays 0, and the true wire payload drops to (F+8)/(2F+4) of
    the bf16 formula per row."""
    g = synthetic.planted_partition(
        name="dist-fp8", num_nodes=3000, num_classes=8, avg_degree=10,
        num_features=32, seed=13)
    labels = multiconstraint_partition(g.rowptr, g.col, WORLD, seed=0,
                                       multilevel=False)
    cfg = RunConfig(
        train_batch_size=128, test_batch_size=256,
        train_fanouts=[6, 4], batchwise_test_fanouts=[8, 8],
        final_test_fanouts=[8, 8], hidden_features=32, num_layers=2,
        lr=0.01, num_workers=2, calibration_batches=3, seed=0,
        load_balance_scheme="federated", wire_fp8=True,
    )
    t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
    m0 = t.train_epoch(0)
    m1 = t.train_epoch(1)
    m2 = t.train_epoch(2)
    assert np.isfinite(m0["loss"]) and m2["loss"] < m0["loss"]
    assert m0["overflow"] == 0 and m0["remote"] > 0
    F = int(t.features.shape[1])
    assert m0["wire_bytes"] == m0["iters"] * WORLD * t.r_cap * (F + 4 + 4)
    acc = t.evaluate("valid")
    assert acc > 0.4, acc


def test_distributed_cold_fp8():
    """cold_fp8 in distributed replicated mode: the tail is a uint8 fp8
    payload, training converges, accuracy close to the exact tier."""
    import jax

    g = synthetic.planted_partition(
        name="coldf8", num_nodes=3000, num_classes=4, avg_degree=8,
        num_features=16, seed=4)
    from salient_plusplus_tpu.partition import contiguous_partition

    labels = contiguous_partition(g.num_nodes, WORLD)

    def run(fp8):
        cfg = RunConfig(
            train_batch_size=64, train_fanouts=[4, 3],
            batchwise_test_fanouts=[5, 5], final_test_fanouts=[5, 5],
            hidden_features=16, num_layers=2, lr=0.01, num_workers=2,
            calibration_batches=2, seed=6, hbm_fraction=0.5,
            cold_mode="replicated", cold_fp8=fp8,
        )
        t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
        m = t.train_epoch(0)
        assert m["overflow"] == 0
        return t, t.evaluate("valid")

    t8, acc8 = run(True)
    assert t8.x_cold.dtype == np.uint8 and t8.x_cold_scale is not None
    _, acc = run(False)
    assert acc8 > 0.8 * acc, (acc8, acc)


def test_distributed_cold_fp8_owner_matches_replicated():
    """cold_fp8 with cold_mode='owner' (round-3 review: the flag was
    silently ignored there). Owner-served fp8 rows cross the pre-step
    all_to_all as F+4-byte payloads (one fused collective) and must decode
    to EXACTLY the replicated-mode fp8 tier's values — both tiers encode
    the same rows with the same per-row scheme, so training is bit-equal."""
    import jax

    g = synthetic.planted_partition(
        name="coldf8o", num_nodes=3000, num_classes=4, avg_degree=8,
        num_features=16, seed=4)
    from salient_plusplus_tpu.partition import contiguous_partition

    labels = contiguous_partition(g.num_nodes, WORLD)

    def run(mode):
        cfg = RunConfig(
            train_batch_size=64, train_fanouts=[4, 3],
            batchwise_test_fanouts=[5, 5], final_test_fanouts=[5, 5],
            hidden_features=16, num_layers=2, lr=0.01, num_workers=2,
            calibration_batches=2, seed=6, hbm_fraction=0.5,
            cold_mode=mode, cold_fp8=True, wire_fp8=False,
        )
        t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(WORLD))
        m = t.train_epoch(0)
        assert m["overflow"] == 0
        return t, m, t.evaluate("valid")

    t_o, m_o, acc_o = run("owner")
    t_r, m_r, acc_r = run("replicated")
    # owner tails are pre-encoded once: uint8 payload + f32 scales
    assert t_o.x_cold_own[0].dtype == np.uint8
    assert t_o.x_cold_own_scale is not None
    # the cold wire receipt reflects the fp8 row format (F+4 row + 4B id)
    F = int(t_o.features.shape[1])
    assert m_o["cold_wire_bytes"] == (
        m_o["iters"] * WORLD * t_o.cold_r_cap * (F + 4 + 4))
    for a, b in zip(
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, t_o.state.params)),
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, t_r.state.params))):
        np.testing.assert_array_equal(a, b)
    assert acc_o == acc_r


def test_cold_fp8_without_cold_tier_rejected():
    """cold_fp8 with hbm_fraction=1 has nothing to encode — fail fast at
    config construction (round-3 review: no silently-ignored combos)."""
    import pytest

    with pytest.raises(ValueError, match="cold_fp8"):
        RunConfig(cold_fp8=True, hbm_fraction=1.0)
