"""2-bucket BatchSpec padding recovery (SURVEY §7 "hard parts").

Typical batches ship as prefix VIEWS under a tight, quantile-calibrated
spec so they stop paying the big bucket's worst-case row padding on
device; the views must be semantics-preserving (pad conventions carried
from the big layout self-drop under the tight caps) and deterministic
(bucket choice depends only on the batch's measured sizes, never on pool
timing).
"""

import jax
import numpy as np
import pytest

from salient_plusplus_tpu.config import RunConfig
from salient_plusplus_tpu.sampling.batch import BatchSpec
from salient_plusplus_tpu.sampling.cpp import BatchBuffers, NativeSampler
from salient_plusplus_tpu.train.loop import Trainer, calibrate_spec


def test_calibrate_tight_bucket(small_graph):
    g = small_graph
    native = NativeSampler(np.asarray(g.rowptr), np.asarray(g.col))
    spec, tight = calibrate_spec(native, g.split_idx["train"], 256, [8, 5],
                                 num_batches=6, tight_quantile=0.5)
    assert isinstance(spec, BatchSpec)
    if tight is not None:
        assert tight.seed_cap == spec.seed_cap
        assert tight.fanouts == spec.fanouts
        assert all(a <= b for a, b in zip(tight.node_caps, spec.node_caps))
        assert all(a <= b for a, b in zip(tight.edge_caps, spec.edge_caps))


def test_bucket_view_preserves_batch(small_graph):
    """A tight-bucket view over big-spec buffers must expose exactly the
    same real data as a batch sampled directly into tight-spec buffers,
    and its pads (carried from the big layout) must still self-drop."""
    g = small_graph
    native = NativeSampler(np.asarray(g.rowptr), np.asarray(g.col))
    spec, tight = calibrate_spec(native, g.split_idx["train"], 256, [8, 5],
                                 num_batches=6, tight_quantile=0.9,
                                 safety=1.5)
    assert tight is not None
    seeds = np.sort(np.random.default_rng(0).choice(
        g.split_idx["train"], 256, replace=False))

    big = BatchBuffers(spec)
    big.attach_ddeg()
    native.sample_into(big, seeds, rng_seed=11,
                       y_global=np.asarray(g.y, np.int32))
    big.fill_ddeg()
    assert big.fits(tight), "pick a higher quantile"

    direct = BatchBuffers(tight)
    direct.attach_ddeg()
    native.sample_into(direct, seeds, rng_seed=11,
                       y_global=np.asarray(g.y, np.int32))
    direct.fill_ddeg()
    assert direct.overflow.tolist() == [0, 0]

    view = big.to_padded_batch(tight)
    ref = direct.to_padded_batch()
    assert view.spec == ref.spec == tight

    np.testing.assert_array_equal(view.level_sizes, ref.level_sizes)
    n = int(ref.level_sizes[-1])
    np.testing.assert_array_equal(view.n_id[:n], ref.n_id[:n])
    assert view.n_id.shape == ref.n_id.shape
    np.testing.assert_array_equal(view.y, ref.y)
    for eb_v, eb_r, h in zip(view.edges, ref.edges,
                             reversed(range(tight.num_hops))):
        c = int(eb_r.count)
        assert int(eb_v.count) == c
        assert eb_v.src.shape == eb_r.src.shape
        np.testing.assert_array_equal(eb_v.src[:c], eb_r.src[:c])
        t = int(ref.level_sizes[h])
        np.testing.assert_array_equal(eb_v.ddeg[:t], eb_r.ddeg[:t])
        if eb_v.msrc is not None:
            np.testing.assert_array_equal(eb_v.msrc[:c], eb_r.msrc[:c])
            np.testing.assert_array_equal(eb_v.mdst[:c], eb_r.mdst[:c])
            # pads carried from the big layout still self-drop under the
            # tight num_segments (big pad value = big in-cap >= tight cap)
            cap = eb_v.msrc.shape[0]
            if c < cap:
                assert eb_v.msrc[c:].min() >= tight.node_caps[h + 1]


def test_unfit_batch_keeps_big_bucket(small_graph):
    g = small_graph
    native = NativeSampler(np.asarray(g.rowptr), np.asarray(g.col))
    spec = calibrate_spec(native, g.split_idx["train"], 256, [8, 5],
                          num_batches=4, safety=1.5)
    seeds = np.sort(np.random.default_rng(1).choice(
        g.split_idx["train"], 256, replace=False))
    big = BatchBuffers(spec)
    native.sample_into(big, seeds, rng_seed=3)
    caps = list(spec.node_caps)
    caps[-1] = int(big.level_sizes[-1]) - 1
    too_small = BatchSpec(spec.fanouts, spec.seed_cap, tuple(caps),
                          spec.edge_caps)
    assert not big.fits(too_small)
    assert big.fits(spec)


@pytest.mark.parametrize("hbm_fraction", [1.0, 0.5])
def test_two_bucket_training_equivalent(small_graph, hbm_fraction):
    """spec_buckets=2 must produce the same training trajectory as
    spec_buckets=1 up to fp reassociation (tight shapes tile reductions
    differently, so results differ at ~1e-6 after an epoch — the batch
    CONTENT is identical, verified exactly in
    test_bucket_view_preserves_batch)."""
    def run(buckets):
        cfg = RunConfig(
            train_batch_size=256, train_fanouts=[5, 3], hidden_features=16,
            num_layers=2, lr=0.01, num_workers=3, calibration_batches=6,
            seed=9, spec_buckets=buckets, tight_quantile=0.6,
            spec_safety=1.4, hbm_fraction=hbm_fraction,
        )
        t = Trainer(cfg, small_graph)
        if buckets > 1:
            assert t.train_tight is not None
        t.train_epoch(0)
        return t

    t2 = run(2)
    t1 = run(1)
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_two_bucket_determinism(small_graph):
    """Bucket assignment is a function of batch sizes only: two identical
    runs must route the same batches to the tight bucket and produce
    bit-identical parameters."""
    def run():
        cfg = RunConfig(
            train_batch_size=256, train_fanouts=[5, 3], hidden_features=16,
            num_layers=2, lr=0.01, num_workers=4, calibration_batches=6,
            seed=5, spec_buckets=2, tight_quantile=0.7, spec_safety=1.4,
        )
        t = Trainer(cfg, small_graph)
        t.train_sampler.set_epoch(t.shuffler.get_idx(0), 0)
        it = iter(t.train_sampler)
        from salient_plusplus_tpu.train.pipeline import DeviceFeeder

        feeder = DeviceFeeder(it, sharding=t.device, depth=3)
        for batch in feeder:
            t.state, _ = t.train_step(t.state, t.features, batch)
        jax.block_until_ready(t.state.params)
        return (it.stats.tight_batches, it.stats.batches,
                jax.tree_util.tree_map(np.asarray, t.state.params))

    tight1, total1, p1 = run()
    tight2, total2, p2 = run()
    assert (tight1, total1) == (tight2, total2)
    assert 0 < tight1 <= total1, "tight bucket never used — check quantile"
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_distributed_two_bucket(small_graph):
    """Single-process SPMD: the tight bucket applies all-or-nothing across
    ranks and training stays healthy (loss decreases, no overflow)."""
    from salient_plusplus_tpu.parallel import make_mesh
    from salient_plusplus_tpu.partition import multiconstraint_partition
    from salient_plusplus_tpu.train.dist_loop import DistributedTrainer

    g = small_graph
    cfg = RunConfig(
        train_batch_size=32, train_fanouts=[4, 3], hidden_features=16,
        num_layers=2, lr=0.01, num_workers=2, calibration_batches=6,
        seed=2, spec_buckets=2, tight_quantile=0.9, spec_safety=1.4,
    )
    parts = multiconstraint_partition(g.rowptr, g.col, 4, seed=0)
    tr = DistributedTrainer(cfg, g, parts, mesh=make_mesh(4))
    assert tr.train_tight is not None
    r0 = tr.train_epoch(0)
    r1 = tr.train_epoch(1)
    assert r1["loss"] < r0["loss"]
    assert r0["overflow"] == 0 and r1["overflow"] == 0
