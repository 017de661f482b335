"""MXU one-hot-matmul segment kernel + scatter-free spmm_agg.

Oracle: numpy scatter-add / XLA segment ops. The Pallas kernel runs in
interpret mode on the CPU test backend; on TPU the same code path is the
production hot loop (ops/mxu_segment.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from salient_plusplus_tpu.ops import mxu_segment as M
from salient_plusplus_tpu.ops.segment import (
    gather_rows, masked_segment_mean, masked_segment_sum)
from salient_plusplus_tpu.sampling.batch import BatchSpec, EdgeBlock
from salient_plusplus_tpu.sampling.cpp import NativeSampler
from salient_plusplus_tpu.data import synthetic


@pytest.fixture(autouse=True)
def _interpret_mode():
    M.use_mxu_spmm(True, interpret=True)
    yield
    M.use_mxu_spmm(None, interpret=False)


def _sorted_case(rng, E, F, T, n_real):
    ids = np.sort(rng.integers(0, T, n_real)).astype(np.int32)
    ids = np.concatenate([ids, np.full(E - n_real, T, np.int32)])
    vals = rng.standard_normal((E, F)).astype(np.float32)
    vals[n_real:] = 333.0  # garbage in pads must not leak
    ref = np.zeros((T, F), np.float32)
    np.add.at(ref, ids[:n_real], vals[:n_real])
    return ids, vals, ref


def test_sorted_segment_sum_matches_oracle():
    rng = np.random.default_rng(0)
    for E, F, T, n_real in [(1024, 64, 128, 900), (2048, 100, 384, 1737),
                            (512, 8, 128, 0)]:
        ids, vals, ref = _sorted_case(rng, E, F, T, n_real)
        out = M.sorted_segment_sum_mxu(jnp.asarray(vals), jnp.asarray(ids),
                                       T, interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_sorted_segment_sum_empty_segments_and_hubs():
    # one hub target owning most edges + many empty segments
    E, F, T = 1024, 16, 256
    ids = np.concatenate([np.zeros(700, np.int32),
                          np.full(200, 200, np.int32),
                          np.full(E - 900, T, np.int32)])
    vals = np.random.default_rng(1).standard_normal((E, F)).astype(np.float32)
    ref = np.zeros((T, F), np.float32)
    np.add.at(ref, ids[:900], vals[:900])
    out = M.sorted_segment_sum_mxu(jnp.asarray(vals), jnp.asarray(ids), T,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)


def _sample_batch(L=2):
    g = synthetic.planted_partition("mxu-t", num_nodes=600, num_classes=4,
                                    avg_degree=6, num_features=12, seed=3)
    native = NativeSampler(np.asarray(g.rowptr, np.int64),
                           np.asarray(g.col, np.int32))
    spec = BatchSpec.worst_case(64, [4, 3][:L])
    seeds = np.arange(0, 576, 9)[:64]   # 64 distinct seeds < 600 nodes
    return native.sample(spec, seeds, rng_seed=5), g


def test_native_mirror_is_src_sorted_permutation():
    batch, _ = _sample_batch()
    # processing order: edges[0] = outermost hop (no mirror), edges[1..]
    assert batch.edges[0].msrc is None
    e = batch.edges[1]
    cnt = int(e.count)
    assert cnt > 0
    msrc, mdst = e.msrc, e.mdst
    assert (np.diff(msrc[:cnt]) >= 0).all()
    in_cap = batch.spec.node_caps[-2 + 0]  # input level cap of hop 0
    # hop h=0 (processing index L-1): in level cap = node_caps[1]
    in_cap = batch.spec.node_caps[1]
    assert (msrc[cnt:] == in_cap).all()
    ref = sorted(zip(e.src[:cnt].tolist(), e.dst[:cnt].tolist()))
    got = sorted(zip(msrc[:cnt].tolist(), mdst[:cnt].tolist()))
    assert ref == got


@pytest.mark.parametrize("mean", [True, False])
def test_spmm_agg_forward_and_grad_match_xla(mean):
    batch, g = _sample_batch()
    e = batch.edges[1]            # hop with mirror
    in_cap = batch.spec.node_caps[1]
    out_cap = batch.spec.node_caps[0]
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((in_cap, 12)), jnp.float32)
    e_dev = jax.tree_util.tree_map(jnp.asarray, e)

    def xla_ref(x):
        msg = gather_rows(x, e_dev.src)
        if mean:
            out = masked_segment_mean(msg, e_dev.dst, e_dev.count, out_cap,
                                      sorted_dst=True)
        else:
            out = masked_segment_sum(msg, e_dev.dst, e_dev.count, out_cap,
                                     sorted_dst=True)
        return out

    out = M.spmm_agg(x, e_dev, out_cap, mean=mean)
    ref = xla_ref(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    # gradients through a scalar loss with a nontrivial cotangent
    w = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    g_mxu = jax.grad(lambda x: (M.spmm_agg(x, e_dev, out_cap, mean=mean)
                                * w).sum())(x)
    g_ref = jax.grad(lambda x: (xla_ref(x) * w).sum())(x)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-3)


def test_spmm_agg_nomirror_grad_fallback():
    batch, _ = _sample_batch()
    e = batch.edges[0]            # outermost hop: no mirror
    assert e.msrc is None
    in_cap = batch.spec.node_caps[-1]
    out_cap = batch.spec.node_caps[1]
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((in_cap, 12)), jnp.float32)
    e_dev = jax.tree_util.tree_map(jnp.asarray, e)
    w = jnp.asarray(rng.standard_normal((out_cap, 12)), jnp.float32)
    g_mxu = jax.grad(lambda x: (M.spmm_agg(x, e_dev, out_cap, mean=True)
                                * w).sum())(x)
    msg_f = lambda x: masked_segment_mean(gather_rows(x, e_dev.src),
                                          e_dev.dst, e_dev.count, out_cap,
                                          sorted_dst=True)
    g_ref = jax.grad(lambda x: (msg_f(x) * w).sum())(x)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-3)


def test_sage_model_grads_match_xla_path():
    """End-to-end: a 2-layer SAGE loss gradient is identical between the
    XLA path and the MXU kernel path on the same batch."""
    from salient_plusplus_tpu.models import make_model
    from salient_plusplus_tpu.train.state import create_train_state
    from salient_plusplus_tpu.train.step import make_train_step

    batch, g = _sample_batch()
    feats = jnp.asarray(np.asarray(g.x), jnp.float32)
    model = make_model("SAGE", g.num_features, 16, g.num_classes, 2, 0.0)
    batch_dev = jax.device_put(batch)

    losses = {}
    for use in (False, True):
        M.use_mxu_spmm(use, interpret=use)
        ex_x = feats[batch_dev.n_id]
        state = create_train_state(model, ex_x, batch_dev, 0.01, seed=0)
        step = make_train_step()
        state2, loss = step(state, feats, batch_dev)
        losses[use] = (float(loss),
                       jax.tree_util.tree_map(np.asarray, state2.params))
    assert abs(losses[False][0] - losses[True][0]) < 1e-3
    flat_a = jax.tree_util.tree_leaves(losses[False][1])
    flat_b = jax.tree_util.tree_leaves(losses[True][1])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-3)


def test_kernel_composes_with_shard_map():
    """The segment kernel must run inside shard_map (the distributed
    trainer's step engages it automatically on TPU pods)."""
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), ("d",))
    E, F, T = 1024, 16, 256
    rng = np.random.default_rng(0)
    ids = np.stack([np.sort(rng.integers(0, T, E)).astype(np.int32)
                    for _ in range(4)])
    vals = rng.standard_normal((4, E, F)).astype(np.float32)

    def f(v, i):
        return M.sorted_segment_sum_mxu(v[0], i[0], T, interpret=True)[None]

    sm = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=(P("d"), P("d")),
                               out_specs=P("d"), check_vma=False))
    out = np.asarray(sm(jnp.asarray(vals), jnp.asarray(ids)))
    ref = np.zeros((4, T, F), np.float32)
    for d in range(4):
        np.add.at(ref[d], ids[d], vals[d])
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_gat_grads_match_xla_path():
    """GAT's attention-weighted aggregation through the kernel forward +
    masked-gather backward must match the XLA path."""
    from salient_plusplus_tpu.models import make_model
    from salient_plusplus_tpu.train.state import create_train_state
    from salient_plusplus_tpu.train.step import make_train_step

    batch, g = _sample_batch()
    feats = jnp.asarray(np.asarray(g.x), jnp.float32)
    model = make_model("GAT", g.num_features, 16, g.num_classes, 2, 0.0)
    batch_dev = jax.device_put(batch)

    results = {}
    for use in (False, True):
        M.use_mxu_spmm(use, interpret=use)
        ex_x = feats[batch_dev.n_id]
        state = create_train_state(model, ex_x, batch_dev, 0.01, seed=0)
        state2, loss = make_train_step()(state, feats, batch_dev)
        results[use] = (float(loss),
                        jax.tree_util.tree_map(np.asarray, state2.params))
    assert abs(results[False][0] - results[True][0]) < 2e-3
    for a, b in zip(jax.tree_util.tree_leaves(results[False][1]),
                    jax.tree_util.tree_leaves(results[True][1])):
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=5e-3)
