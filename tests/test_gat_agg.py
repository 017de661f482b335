"""Scatter-free GAT attention VJP (ops/gat_agg.py) vs the autodiff oracle.

Oracle: the exact fallback formulation GATConv uses without a mirror
(segment_softmax_self + attention-weighted sorted segment sum), in f32,
differentiated by JAX. The custom path must match forward AND all four
gradients (xs, xt, alpha_src, alpha_dst) — including the self-loop leg
and padded-edge masking. Kernels run in interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from salient_plusplus_tpu.ops import mxu_segment as M
from salient_plusplus_tpu.ops.gat_agg import gat_attention_agg
from salient_plusplus_tpu.ops.segment import segment_softmax_self


@pytest.fixture(autouse=True)
def _interpret_mode():
    M.use_mxu_spmm(True, interpret=True)
    yield
    M.use_mxu_spmm(None, interpret=False)


def _hop(rng, E, T, N, n_real):
    dst = np.sort(rng.integers(0, T, n_real)).astype(np.int32)
    src = rng.integers(0, N, n_real).astype(np.int32)
    dst_p = np.concatenate([dst, np.full(E - n_real, T, np.int32)])
    src_p = np.concatenate([src, rng.integers(0, N, E - n_real).astype(np.int32)])
    order = np.argsort(src, kind="stable")
    msrc = np.concatenate([src[order], np.full(E - n_real, N, np.int32)])
    mdst = np.concatenate([dst[order], np.zeros(E - n_real, np.int32)])
    return src_p, dst_p, msrc, mdst


def _oracle(ns, xs, xt, a_src, a_dst, src, dst, count, T):
    z = jnp.where(a_src[src] + a_dst[jnp.minimum(dst, T - 1)] > 0,
                  a_src[src] + a_dst[jnp.minimum(dst, T - 1)],
                  ns * (a_src[src] + a_dst[jnp.minimum(dst, T - 1)]))
    rs = a_src[:T] + a_dst
    z_self = jnp.where(rs > 0, rs, ns * rs)
    att, self_att = segment_softmax_self(z, dst, count, T, z_self,
                                         sorted_dst=True)
    E = src.shape[0]
    mask = (jnp.arange(E) < count)[:, None, None]
    msg = jnp.where(mask, xs[src] * att[:, :, None], 0.0)
    seg = jax.ops.segment_sum(
        msg, jnp.where(mask[:, 0, 0], dst, T), num_segments=T + 1)[:T]
    return seg + self_att[:, :, None] * xt


@pytest.mark.parametrize("E,T,N,n_real,H,C", [
    (512, 128, 256, 450, 2, 8),
    (1024, 256, 384, 1024, 4, 4),   # no pads
    (512, 128, 256, 0, 1, 16),      # all pads (self-loops only)
])
def test_gat_agg_forward_and_grads_match_autodiff(E, T, N, n_real, H, C):
    rng = np.random.default_rng(E + n_real)
    src, dst, msrc, mdst = _hop(rng, E, T, N, n_real)
    xs = rng.standard_normal((N, H, C)).astype(np.float32)
    xt = rng.standard_normal((T, H, C)).astype(np.float32)
    a_s = rng.standard_normal((N, H)).astype(np.float32)
    a_d = rng.standard_normal((T, H)).astype(np.float32)
    g = rng.standard_normal((T, H, C)).astype(np.float32)
    count = jnp.int32(n_real)
    ns = 0.2

    def f_new(xs, xt, a_s, a_d):
        out = gat_attention_agg(T, ns, xs, xt, a_s, a_d,
                                jnp.asarray(src), jnp.asarray(dst), count,
                                jnp.asarray(msrc), jnp.asarray(mdst))
        return (out.astype(jnp.float32) * g).sum()

    def f_ref(xs, xt, a_s, a_d):
        out = _oracle(ns, xs, xt, a_s, a_d, jnp.asarray(src),
                      jnp.asarray(dst), count, T)
        return (out * g).sum()

    args = tuple(map(jnp.asarray, (xs, xt, a_s, a_d)))
    out_new = gat_attention_agg(T, ns, *args, jnp.asarray(src),
                                jnp.asarray(dst), count,
                                jnp.asarray(msrc), jnp.asarray(mdst))
    out_ref = _oracle(ns, *args, jnp.asarray(src), jnp.asarray(dst),
                      count, T)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref),
                               atol=2e-3, rtol=2e-3)

    g_new = jax.grad(f_new, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_new, g_ref, ["xs", "xt", "a_src", "a_dst"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3, rtol=3e-3, err_msg=name)


def test_gat_agg_bf16_inputs_run():
    rng = np.random.default_rng(7)
    E, T, N, H, C = 512, 128, 256, 2, 8
    src, dst, msrc, mdst = _hop(rng, E, T, N, 400)
    xs = jnp.asarray(rng.standard_normal((N, H, C)), jnp.bfloat16)
    xt = jnp.asarray(rng.standard_normal((T, H, C)), jnp.bfloat16)
    a_s = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)

    def loss(xs, xt, a_s, a_d):
        out = gat_attention_agg(T, 0.2, xs, xt, a_s, a_d,
                                jnp.asarray(src), jnp.asarray(dst),
                                jnp.int32(400), jnp.asarray(msrc),
                                jnp.asarray(mdst))
        return out.astype(jnp.float32).sum()

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
        xs, xt, a_s, a_d)
    assert np.isfinite(float(val))
    assert grads[0].dtype == jnp.bfloat16
    for gr in grads:
        assert np.isfinite(np.asarray(gr, np.float32)).all()


def test_mirror_all_emits_outermost_hop_mirror():
    """spec.mirror_all=True → the sampler emits a src-sorted mirror for
    EVERY hop, including the outermost (GAT/GCN layer-0 backward)."""
    import dataclasses
    from salient_plusplus_tpu.sampling.batch import BatchSpec
    from salient_plusplus_tpu.sampling.cpp import NativeSampler
    from salient_plusplus_tpu.data import synthetic

    g = synthetic.planted_partition("mall-t", num_nodes=600, num_classes=4,
                                    avg_degree=6, num_features=12, seed=3)
    native = NativeSampler(np.asarray(g.rowptr, np.int64),
                           np.asarray(g.col, np.int32))
    spec = dataclasses.replace(BatchSpec.worst_case(64, [4, 3]),
                               mirror_all=True)
    seeds = np.arange(0, 576, 9)[:64]
    batch = native.sample(spec, seeds, rng_seed=5)
    for li, e in enumerate(batch.edges):    # edges[0] = outermost hop
        assert e.msrc is not None, li
        cnt = int(e.count)
        assert cnt > 0
        assert (np.diff(e.msrc[:cnt]) >= 0).all()
        in_cap = spec.node_caps[len(batch.edges) - li]
        assert (e.msrc[cnt:] == in_cap).all()
        assert (sorted(zip(e.src[:cnt].tolist(), e.dst[:cnt].tolist()))
                == sorted(zip(e.msrc[:cnt].tolist(),
                              e.mdst[:cnt].tolist())))
