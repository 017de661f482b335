import numpy as np

from salient_plusplus_tpu.sampling import BatchSpec
from salient_plusplus_tpu.sampling.sampler import (
    FastSampler, FastSamplerConfig, batch_seed, split_seeds,
)
from salient_plusplus_tpu.sampling.shufflers import (
    DistributedShuffler, FederatedDistributedShuffler, Shuffler,
)


def _mk_sampler(g, num_workers=3, exact=None):
    spec = BatchSpec.worst_case(64, [5, 3])
    cfg = FastSamplerConfig(spec=spec, batch_size=64, base_seed=42,
                            num_workers=num_workers, max_batches_in_flight=4,
                            exact_num_batches=exact)
    return FastSampler(g.rowptr, g.col, g.y, cfg)


def test_split_seeds_exact():
    idx = np.arange(1000)
    chunks = split_seeds(idx, 64, exact_num_batches=7)
    assert len(chunks) == 7
    sizes = [len(c) for c in chunks]
    assert max(sizes) - min(sizes) <= 1
    assert np.array_equal(np.concatenate(chunks), idx)


def test_epoch_in_order_and_complete(small_graph):
    g = small_graph
    s = _mk_sampler(g)
    idx = g.split_idx["train"][:500]
    s.set_epoch(idx, epoch=0)
    seen = []
    it = iter(s)
    assert len(it) == 8  # ceil(500/64)
    for bufs in it:
        b = bufs.to_padded_batch()
        n = int(b.seed_count)
        seen.append(b.n_id[:n].copy())
        it.recycle(bufs)
    assert sum(len(x) for x in seen) == 500
    np.testing.assert_array_equal(np.concatenate(seen), idx)
    assert it.stats.batches == 8


def test_determinism_across_runs(small_graph):
    g = small_graph
    idx = g.split_idx["train"][:300]

    def run(num_workers):
        s = _mk_sampler(g, num_workers=num_workers)
        s.set_epoch(idx, epoch=3)
        out = []
        it = iter(s)
        for bufs in it:
            b = bufs.to_padded_batch()
            out.append((b.n_id.copy(),
                        tuple(e.src.copy() for e in b.edges)))
            it.recycle(bufs)
        return out

    r1, r2, r3 = run(1), (run(3)), run(4)
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a[0], b[0])
        for ea, eb in zip(a[1], b[1]):
            np.testing.assert_array_equal(ea, eb)
    for a, b in zip(r1, r3):
        np.testing.assert_array_equal(a[0], b[0])


def test_batch_seed_mixing():
    seeds = {batch_seed(0, e, b) for e in range(10) for b in range(100)}
    assert len(seeds) == 1000


def test_distributed_shuffler_consistency():
    idx = np.arange(997)
    shufs = [DistributedShuffler(idx, world_size=4, rank=r) for r in range(4)]
    parts = [s.get_idx(epoch=5) for s in shufs]
    merged = np.concatenate(parts)
    assert len(merged) == 997
    assert np.array_equal(np.sort(merged), idx)
    # same epoch → same global perm; different epoch differs
    again = [s.get_idx(epoch=5) for s in shufs]
    for a, b in zip(parts, again):
        np.testing.assert_array_equal(a, b)
    assert not np.array_equal(shufs[0].get_idx(6), parts[0])


def test_federated_shuffler():
    local = np.arange(100, 200)
    s = FederatedDistributedShuffler(local)
    out = s.get_idx(0)
    assert np.array_equal(np.sort(out), local)


def test_presampler_matches_streaming(small_graph):
    from salient_plusplus_tpu.sampling.sampler import FastPreSampler

    g = small_graph
    s = _mk_sampler(g, num_workers=2)
    idx = g.split_idx["train"][:300]
    s.set_epoch(idx, epoch=1)
    streamed = []
    it = iter(s)
    for bufs in it:
        b = bufs.to_padded_batch()
        streamed.append((b.n_id.copy(), b.level_sizes.copy()))
        it.recycle(bufs)
    pre = FastPreSampler(s)
    for (nid, ls), bufs in zip(streamed, pre):
        b = bufs.to_padded_batch()
        np.testing.assert_array_equal(b.n_id, nid)
        np.testing.assert_array_equal(b.level_sizes, ls)


import pytest


def test_duplicate_seeds_raise(small_graph):
    g = small_graph
    s = _mk_sampler(g, num_workers=2)
    idx = np.concatenate([g.split_idx["train"][:32],
                          g.split_idx["train"][:32]])
    s.set_epoch(idx, epoch=0)
    it = iter(s)
    with pytest.raises(RuntimeError, match="duplicate"):
        for bufs in it:
            it.recycle(bufs)


def test_compressed_dst_decodes_exactly(small_graph):
    """EdgeBlock.ddeg (uint8 per-target degrees) must reconstruct the
    exact sorted dst array including the pad convention."""
    import jax
    from salient_plusplus_tpu.sampling.batch import BatchSpec
    from salient_plusplus_tpu.sampling.sampler import (FastSampler,
                                                       FastSamplerConfig)

    g = small_graph
    spec = BatchSpec.worst_case(64, [5, 3])
    for compress in (False, True):
        s = FastSampler(
            np.asarray(g.rowptr, np.int64), np.asarray(g.col, np.int32),
            np.asarray(g.y, np.int32),
            FastSamplerConfig(spec=spec, batch_size=64, base_seed=3,
                              num_workers=1, compress_dst=compress),
            idx=np.arange(64) * 7)
        s.set_epoch(np.arange(64) * 7, 0)
        it = iter(s)
        b = next(it).to_padded_batch()
        if compress:
            comp = b
        else:
            ref = b
            # keep iterating not needed; close below
        it.close()
    for e_ref, e_comp in zip(ref.edges, comp.edges):
        assert e_comp.dst is None and e_comp.ddeg is not None
        assert e_comp.ddeg.dtype == np.uint8
        dec = jax.device_put(e_comp).decoded(e_comp.src.shape[0])
        np.testing.assert_array_equal(np.asarray(dec.dst), e_ref.dst)


class _JitterNative:
    """Delegating wrapper whose sample_into sleeps a pseudo-random beat —
    forces worker leapfrog (one worker stalls mid-claim while its peers
    race ahead through the free-buffer pool)."""

    def __init__(self, inner, seed=0):
        self._inner = inner
        self._rng = np.random.default_rng(seed)
        self._lock = __import__("threading").Lock()

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def sample_into(self, *a, **kw):
        import time
        with self._lock:
            dt = float(self._rng.uniform(0, 0.02))
        time.sleep(dt)
        return self._inner.sample_into(*a, **kw)


def test_pool_starved_liveness(small_graph):
    """Regression: worker claim-order deadlock under contention.

    Workers must acquire a buffer BEFORE claiming a batch number —
    the reverse order let peers leapfrog the claimant of the consumer's
    next-expected batch through every free buffer, parking results in the
    reorder map while a feeder-like consumer (holds `depth` buffers,
    recycles only on pop) starves the claimant forever. Found via
    faulthandler on an oversubscribed full-suite run. This stress drives
    the smallest legal pool (max_batches_in_flight=1 + 4 workers) with
    jittered sample times and a depth-2 holding consumer for several
    epochs; with the old claim order it deadlocks (caught by the
    consumer's stall fail-fast), with the fix it completes."""
    import collections

    g = small_graph
    spec = BatchSpec.worst_case(32, [4, 3])
    cfg = FastSamplerConfig(spec=spec, batch_size=32, base_seed=1,
                            num_workers=4, max_batches_in_flight=1)
    s = FastSampler(g.rowptr, g.col, g.y, cfg)
    s.native = _JitterNative(s.native, seed=7)
    idx = g.split_idx["train"][:640]  # 20 batches/epoch
    for epoch in range(3):
        s.set_epoch(idx, epoch)
        it = iter(s)
        it.STALL_TIMEOUT_S = 60.0  # fail fast if the deadlock regresses
        held = collections.deque()
        n = 0
        for bufs in it:
            held.append(bufs)
            if len(held) >= 2:  # feeder-like: recycle only on "pop"
                it.recycle(held.popleft())
            n += 1
        while held:
            it.recycle(held.popleft())
        assert n == 20


def test_consumer_stall_failfast(small_graph):
    """A batch that never arrives must raise (with queue-state
    diagnostics), not hang the trainer — the framework's fail-fast
    contract (cf. tests/test_failfast.py for the distributed analog)."""
    import threading

    import pytest

    g = small_graph
    spec = BatchSpec.worst_case(32, [4, 3])
    cfg = FastSamplerConfig(spec=spec, batch_size=32, base_seed=1,
                            num_workers=1, max_batches_in_flight=2)
    s = FastSampler(g.rowptr, g.col, g.y, cfg)
    gate = threading.Event()
    inner = s.native

    class _Blocking:
        def __getattr__(self, name):
            return getattr(inner, name)

        def sample_into(self, bufs, seeds, *a, **kw):
            if not gate.is_set() and getattr(self, "_n", 0) >= 1:
                gate.wait(30)  # simulate a wedged worker
            self._n = getattr(self, "_n", 0) + 1
            return inner.sample_into(bufs, seeds, *a, **kw)

    blocker = _Blocking()
    s.native = blocker
    s.set_epoch(g.split_idx["train"][:96], 0)  # 3 batches
    it = iter(s)
    it.STALL_TIMEOUT_S = 1.0
    got = next(it)  # batch 0 flows
    it.recycle(got)
    with pytest.raises(RuntimeError, match="sampler stalled"):
        while True:
            it.recycle(next(it))
    gate.set()  # release the wedged worker thread
