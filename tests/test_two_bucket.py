"""2-bucket BatchSpec padding recovery (SURVEY §7 "hard parts").

Typical batches are repacked into a tight, quantile-calibrated spec so
they stop paying the big bucket's worst-case row padding on device; the
repack must be semantics-preserving (prefix copies + pad conventions that
self-drop under the tight caps) and deterministic (bucket choice depends
only on the batch's measured sizes, never on pool timing).
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


def test_repack_preserves_batch(small_graph):
    """A repacked batch must expose exactly the same real data as one
    sampled directly into tight-spec buffers."""
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

    direct = BatchBuffers(tight)
    direct.attach_ddeg()
    native.sample_into(direct, seeds, rng_seed=11,
                       y_global=np.asarray(g.y, np.int32))
    direct.fill_ddeg()
    assert direct.overflow.tolist() == [0, 0], "pick a higher quantile"

    repacked = BatchBuffers(tight)
    repacked.attach_ddeg()
    assert repacked.try_repack_from(big)

    np.testing.assert_array_equal(repacked.level_sizes, direct.level_sizes)
    np.testing.assert_array_equal(repacked.edge_counts, direct.edge_counts)
    n = int(direct.level_sizes[-1])
    np.testing.assert_array_equal(repacked.n_id[:n], direct.n_id[:n])
    np.testing.assert_array_equal(repacked.y, direct.y)
    for h in range(tight.num_hops):
        o = int(direct.edge_offsets[h])
        c = int(direct.edge_counts[h])
        np.testing.assert_array_equal(repacked.edge_src[o:o + c],
                                      direct.edge_src[o:o + c])
        np.testing.assert_array_equal(repacked.edge_dst[o:o + c],
                                      direct.edge_dst[o:o + c])
        do = int(direct.ddeg_offsets[h])
        t = int(direct.level_sizes[h])
        np.testing.assert_array_equal(
            repacked.ddeg[do:do + t], direct.ddeg[do:do + t])
        # pad dst values carried over from the big spec still self-drop
        # under the tight num_segments (they are >= the tight out-cap)
        cap = int(tight.edge_caps[h])
        if c < cap:
            assert repacked.edge_dst[o + c:o + cap].min() \
                >= tight.node_caps[h]
    # mirrors (hops 0..L-2): same real prefix, pads >= tight in-cap
    for h in range(tight.num_hops - 1):
        o = int(direct.edge_offsets[h])
        c = int(direct.edge_counts[h])
        np.testing.assert_array_equal(repacked.mirror_src[o:o + c],
                                      direct.mirror_src[o:o + c])
        np.testing.assert_array_equal(repacked.mirror_dst[o:o + c],
                                      direct.mirror_dst[o:o + c])
        cap = int(tight.edge_caps[h])
        if c < cap:
            assert repacked.mirror_src[o + c:o + cap].min() \
                >= tight.node_caps[h + 1]


def test_unfit_batch_stays_big(small_graph):
    g = small_graph
    native = NativeSampler(np.asarray(g.rowptr), np.asarray(g.col))
    spec = calibrate_spec(native, g.split_idx["train"], 256, [8, 5],
                          num_batches=4, safety=1.5)
    seeds = np.sort(np.random.default_rng(1).choice(
        g.split_idx["train"], 256, replace=False))
    big = BatchBuffers(spec)
    native.sample_into(big, seeds, rng_seed=3)
    # a spec strictly too small on the frontier level must refuse
    caps = list(spec.node_caps)
    caps[-1] = int(big.level_sizes[-1]) - 1
    too_small = BatchSpec(spec.fanouts, spec.seed_cap, tuple(caps),
                          spec.edge_caps)
    tb = BatchBuffers(too_small)
    assert not tb.try_repack_from(big)


@pytest.mark.parametrize("hbm_fraction", [1.0, 0.5])
def test_two_bucket_training_equivalent(small_graph, hbm_fraction):
    """spec_buckets=2 must produce the same training trajectory as
    spec_buckets=1 up to fp reassociation (tight shapes tile reductions
    differently, so results differ at ~1e-6 after an epoch — the batch
    CONTENT is identical, verified exactly in test_repack_preserves_batch).
    """
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
