"""SPMD correctness on the 8-device virtual CPU mesh.

Exercises the all_to_all feature exchange and data-parallel step without
hardware — the "fake backend" test layer SURVEY.md §4 calls for.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from salient_plusplus_tpu.data.partition_book import RangePartitionBook
from salient_plusplus_tpu.models import make_model
from salient_plusplus_tpu.parallel import (
    make_mesh, make_spmd_eval_step, make_spmd_train_step, stack_batches,
)
from salient_plusplus_tpu.parallel.exchange import DeviceCache, assemble_features
from salient_plusplus_tpu.sampling import BatchSpec, multilayer_sample_np, pad_sample
from salient_plusplus_tpu.train.state import create_train_state

WORLD = 4


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(WORLD)


def _partitioned_features(rng, world=WORLD, v_per=64, f=8):
    """Equal contiguous partitions: global x [world*v_per, f]."""
    x = rng.normal(size=(world * v_per, f)).astype(np.float32)
    part_offsets = np.arange(world + 1, dtype=np.int32) * v_per
    return x, part_offsets


def test_assemble_features_matches_gather(mesh, rng):
    """The exchange must equal a plain global gather x[n_id]."""
    x, part_offsets = _partitioned_features(rng)
    V, F = x.shape
    N_cap, r_cap = 96, 32
    n_ids, counts = [], []
    for d in range(WORLD):
        n = int(rng.integers(40, N_cap))
        ids = rng.choice(V, size=n, replace=False).astype(np.int32)
        pad = np.zeros(N_cap, np.int32)
        pad[:n] = ids
        n_ids.append(pad)
        counts.append(n)
    n_id_st = jnp.asarray(np.stack(n_ids))
    count_st = jnp.asarray(np.asarray(counts, np.int32))
    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P("data")))

    def f(local_shard, n_id, count):
        out, stats = assemble_features(
            local_shard, n_id[0], count[0], jnp.asarray(part_offsets),
            "data", r_cap)
        return out[None], jax.tree_util.tree_map(lambda v: v[None], stats)

    out, stats = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data")), check_vma=False))(
        xs, n_id_st, count_st)
    out = np.asarray(out)
    for d in range(WORLD):
        n = counts[d]
        np.testing.assert_allclose(out[d, :n], x[n_ids[d][:n]], rtol=1e-6)
        assert np.all(out[d, n:] == 0)
    st = jax.tree_util.tree_map(np.asarray, stats)
    assert int(st.num_overflow.sum()) == 0
    assert int((st.num_local + st.num_remote).sum()) == sum(counts)


def test_assemble_features_with_cache(mesh, rng):
    x, part_offsets = _partitioned_features(rng)
    V, F = x.shape
    N_cap, r_cap, C = 64, 16, 32
    # each device caches a sorted set of remote vertices
    caches_v, caches_f = [], []
    for d in range(WORLD):
        remote = np.setdiff1d(np.arange(V),
                              np.arange(part_offsets[d], part_offsets[d + 1]))
        ids = np.sort(rng.choice(remote, size=C, replace=False)).astype(np.int32)
        caches_v.append(ids)
        caches_f.append(x[ids])
    cache = DeviceCache(jnp.asarray(np.stack(caches_v)),
                        jnp.asarray(np.stack(caches_f)))
    n_ids, counts = [], []
    for d in range(WORLD):
        # mix: local + cached + other-remote
        local = rng.choice(np.arange(part_offsets[d], part_offsets[d + 1]),
                           8, replace=False)
        cached = rng.choice(caches_v[d], 8, replace=False)
        rest = rng.choice(V, 16, replace=False)
        ids = np.unique(np.concatenate([local, cached, rest])).astype(np.int32)
        rng.shuffle(ids)
        pad = np.zeros(N_cap, np.int32)
        pad[: len(ids)] = ids
        n_ids.append(pad)
        counts.append(len(ids))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))

    def f(local_shard, n_id, count, cv, cf):
        out, stats = assemble_features(
            local_shard, n_id[0], count[0], jnp.asarray(part_offsets),
            "data", r_cap, DeviceCache(cv[0], cf[0]))
        return out[None], jax.tree_util.tree_map(lambda v: v[None], stats)

    out, stats = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data")), check_vma=False))(
        xs, jnp.asarray(np.stack(n_ids)),
        jnp.asarray(np.asarray(counts, np.int32)),
        cache.vertices, cache.features)
    out = np.asarray(out)
    st = jax.tree_util.tree_map(np.asarray, stats)
    for d in range(WORLD):
        n = counts[d]
        np.testing.assert_allclose(out[d, :n], x[n_ids[d][:n]], rtol=1e-6)
        assert st.num_cached[d] >= 8  # cache hits actually served locally
    # cache hits reduce remote traffic: remote + cached + local == total
    assert int((st.num_local + st.num_cached + st.num_remote).sum()) \
        == sum(counts)


def _make_stacked_batch(g, spec, seeds_per_dev, rng):
    batches = []
    for d in range(WORLD):
        s = multilayer_sample_np(g.rowptr, g.col, seeds_per_dev[d],
                                 spec.fanouts, rng)
        batches.append(pad_sample(s, spec, g.y))
    return stack_batches(batches)


def test_spmd_train_step_replicated(mesh, small_graph, rng):
    g = small_graph
    spec = BatchSpec.worst_case(32, (4, 3))
    seeds = [g.split_idx["train"][d * 32:(d + 1) * 32] for d in range(WORLD)]
    stacked = _make_stacked_batch(g, spec, seeds, rng)
    model = make_model("SAGE", g.num_features, 16, g.num_classes, 2)
    feats = jnp.asarray(np.asarray(g.x, np.float32))
    ex = jax.tree_util.tree_map(lambda v: v[0], stacked)
    state = create_train_state(model, feats[ex.n_id], ex, lr=1e-2)
    step = make_spmd_train_step(mesh, "replicated", donate_state=False)
    state2, loss, _ = step(state, feats, stacked, jnp.zeros(1), None)
    assert np.isfinite(float(loss))
    # params actually changed and are replicated-consistent
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))

    # equivalence with single-device accumulation: grads are pmean over
    # devices == mean over the 4 microbatches
    from salient_plusplus_tpu.train.step import masked_nll

    def loss_one(params, batch):
        x = feats[batch.n_id]
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats}, x, batch,
            training=True, rngs={"dropout": jax.random.key(9)},
            mutable=["batch_stats"])
        return masked_nll(out, batch.y, batch.seed_count)

    losses = [float(loss_one(state.params,
                             jax.tree_util.tree_map(lambda v: v[d], stacked)))
              for d in range(WORLD)]
    # dropout keys differ per device so exact loss match is not expected;
    # but the reported pmean loss must lie within the per-device range
    assert min(losses) - 0.5 <= float(loss) <= max(losses) + 0.5


def test_spmd_train_step_partitioned(mesh, rng):
    """Partitioned-feature SPMD step must match the replicated-feature step
    bit-for-bit (same batches, same init, same dropout keys)."""
    # synthetic graph over the padded id space: V = WORLD * 64
    from salient_plusplus_tpu.data import synthetic

    g = synthetic.planted_partition(num_nodes=WORLD * 64, num_classes=4,
                                    avg_degree=6, num_features=8, seed=5)
    part_offsets = np.arange(WORLD + 1, dtype=np.int32) * 64
    spec = BatchSpec.worst_case(16, (3, 2))
    seeds = []
    for d in range(WORLD):
        pool = np.arange(part_offsets[d], part_offsets[d + 1])
        seeds.append(np.sort(rng.choice(pool, 16, replace=False)))
    stacked = _make_stacked_batch(g, spec, seeds, rng)

    model = make_model("SAGE", g.num_features, 16, g.num_classes, 2)
    feats = jnp.asarray(np.asarray(g.x, np.float32))
    ex = jax.tree_util.tree_map(lambda v: v[0], stacked)
    state = create_train_state(model, feats[ex.n_id], ex, lr=1e-2)

    step_r = make_spmd_train_step(mesh, "replicated", donate_state=False)
    s_r, loss_r, _ = step_r(state, feats, stacked, jnp.zeros(1), None)

    xs = jax.device_put(feats, NamedSharding(mesh, P("data")))
    step_p = make_spmd_train_step(mesh, "partitioned", r_cap=128,
                                  donate_state=False)
    s_p, loss_p, ex_stats = step_p(state, xs, stacked,
                                   jnp.asarray(part_offsets), None)
    np.testing.assert_allclose(float(loss_r), float(loss_p), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_r.params),
                    jax.tree_util.tree_leaves(s_p.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-5)
    st = jax.tree_util.tree_map(np.asarray, ex_stats)
    assert int(st.num_overflow) == 0
    assert int(st.num_remote) > 0  # cross-partition traffic existed


def test_spmd_eval_step(mesh, small_graph, rng):
    g = small_graph
    spec = BatchSpec.worst_case(32, (4, 3))
    seeds = [g.split_idx["valid"][d * 32:(d + 1) * 32] for d in range(WORLD)]
    stacked = _make_stacked_batch(g, spec, seeds, rng)
    model = make_model("SAGE", g.num_features, 16, g.num_classes, 2)
    feats = jnp.asarray(np.asarray(g.x, np.float32))
    ex = jax.tree_util.tree_map(lambda v: v[0], stacked)
    state = create_train_state(model, feats[ex.n_id], ex, lr=1e-2)
    ev = make_spmd_eval_step(mesh, "replicated")
    correct, total, overflow = ev(state, feats, stacked, jnp.zeros(1), None)
    assert int(total) == WORLD * 32
    assert 0 <= int(correct) <= int(total)
    assert int(overflow) == 0  # replicated mode has no exchange


def test_assemble_features_overflow_counted(mesh, rng):
    """Requests beyond r_cap are dropped (zeros) and counted, never
    corrupting other rows."""
    x, part_offsets = _partitioned_features(rng)
    V, F = x.shape
    N_cap, r_cap = 96, 4  # tiny per-destination budget
    n_ids, counts = [], []
    for d in range(WORLD):
        ids = rng.choice(V, size=80, replace=False).astype(np.int32)
        pad = np.zeros(N_cap, np.int32)
        pad[:80] = ids
        n_ids.append(pad)
        counts.append(80)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))

    def f(local_shard, n_id, count):
        out, stats = assemble_features(
            local_shard, n_id[0], count[0], jnp.asarray(part_offsets),
            "data", r_cap)
        return out[None], jax.tree_util.tree_map(lambda v: v[None], stats)

    out, stats = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data")), check_vma=False))(
        xs, jnp.asarray(np.stack(n_ids)),
        jnp.asarray(np.asarray(counts, np.int32)))
    out = np.asarray(out)
    st = jax.tree_util.tree_map(np.asarray, stats)
    assert int(st.num_overflow.sum()) > 0
    for d in range(WORLD):
        ids = n_ids[d][:80]
        got = out[d, :80]
        want = x[ids]
        # every row is either exact or dropped-to-zero; local rows always
        # exact
        owner = np.searchsorted(part_offsets[1:], ids, side="right")
        for i in range(80):
            row_ok = np.allclose(got[i], want[i], rtol=1e-6)
            zeroed = np.all(got[i] == 0)
            assert row_ok or zeroed
            if owner[i] == d:
                assert row_ok


def test_assemble_features_hot_size(mesh, rng):
    """hot_size classification: cold rows (local offset >= hot_size) come
    out zero from the exchange; hot rows exact."""
    x, part_offsets = _partitioned_features(rng)  # v_per=64
    V, F = x.shape
    H = 32  # hot prefix per partition
    N_cap, r_cap = 64, 32
    n_ids, counts = [], []
    for d in range(WORLD):
        ids = rng.choice(V, size=48, replace=False).astype(np.int32)
        pad = np.zeros(N_cap, np.int32)
        pad[:48] = ids
        n_ids.append(pad)
        counts.append(48)
    xs_hot = np.concatenate([x[p * 64:p * 64 + H] for p in range(WORLD)])
    xs = jax.device_put(jnp.asarray(xs_hot), NamedSharding(mesh, P("data")))

    def f(local_shard, n_id, count):
        out, stats = assemble_features(
            local_shard, n_id[0], count[0], jnp.asarray(part_offsets),
            "data", r_cap, hot_size=H)
        return out[None], jax.tree_util.tree_map(lambda v: v[None], stats)

    out, stats = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data")), check_vma=False))(
        xs, jnp.asarray(np.stack(n_ids)),
        jnp.asarray(np.asarray(counts, np.int32)))
    out = np.asarray(out)
    for d in range(WORLD):
        ids = n_ids[d][:48]
        cold = (ids % 64) >= H
        np.testing.assert_allclose(out[d, :48][~cold], x[ids][~cold],
                                   rtol=1e-6)
        assert np.all(out[d, :48][cold] == 0)
    st = jax.tree_util.tree_map(np.asarray, stats)
    # cold rows never entered the exchange accounting
    hot_total = sum(int((~((n_ids[d][:48] % 64) >= H)).sum())
                    for d in range(WORLD))
    assert int((st.num_local + st.num_remote).sum()) == hot_total


def test_assemble_features_fp8_wire(mesh, rng):
    """wire_fp8: remote rows round-trip through e4m3 + per-row scale —
    every element within 2^-4 of the row's amax; local rows stay exact;
    classification stats unchanged; sent_bytes reflects the fp8 payload."""
    x, part_offsets = _partitioned_features(rng)
    V, F = x.shape
    N_cap, r_cap = 96, 32
    n_ids, counts = [], []
    for d in range(WORLD):
        n = int(rng.integers(40, N_cap))
        ids = rng.choice(V, size=n, replace=False).astype(np.int32)
        pad = np.zeros(N_cap, np.int32)
        pad[:n] = ids
        n_ids.append(pad)
        counts.append(n)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))

    def f(fp8, local_shard, n_id, count):
        out, stats = assemble_features(
            local_shard, n_id[0], count[0], jnp.asarray(part_offsets),
            "data", r_cap, wire_fp8=fp8)
        return out[None], jax.tree_util.tree_map(lambda v: v[None], stats)

    outs, statss = {}, {}
    for fp8 in (False, True):
        out, stats = jax.jit(jax.shard_map(
            lambda a, b, c, fp8=fp8: f(fp8, a, b, c), mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data")), check_vma=False))(
            xs, jnp.asarray(np.stack(n_ids)),
            jnp.asarray(np.asarray(counts, np.int32)))
        outs[fp8] = np.asarray(out)
        statss[fp8] = jax.tree_util.tree_map(np.asarray, stats)
    for d in range(WORLD):
        n = counts[d]
        ids = n_ids[d][:n]
        exact = x[ids]
        got = outs[True][d, :n]
        # e4m3 with per-row dynamic-range scaling: RTNE error <= 2^-4 of
        # the quantization bin, bounded by amax/2^3 per element
        bound = np.abs(exact).max(axis=1, keepdims=True) / 8 + 1e-6
        assert np.all(np.abs(got - exact) <= bound)
        # local rows never touch the wire
        owner = np.searchsorted(part_offsets[1:], ids, side="right")
        np.testing.assert_array_equal(got[owner == d], exact[owner == d])
        assert np.all(outs[True][d, n:] == 0)
    # classification identical; payload accounting shrinks per row
    for name in ("num_local", "num_remote", "num_cached", "num_overflow"):
        np.testing.assert_array_equal(getattr(statss[True], name),
                                      getattr(statss[False], name))
    served = statss[False].sent_bytes.sum() / (F * x.dtype.itemsize)
    assert statss[True].sent_bytes.sum() == pytest.approx(
        served * (F + 4), rel=1e-6)
