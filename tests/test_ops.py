import jax.numpy as jnp
import numpy as np

from salient_plusplus_tpu.ops import (
    masked_segment_max, masked_segment_mean, masked_segment_softmax,
    masked_segment_sum, valid_mask,
)


def test_valid_mask():
    m = np.asarray(valid_mask(6, jnp.int32(4)))
    assert m.tolist() == [True, True, True, True, False, False]


def test_masked_segment_sum():
    vals = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    dst = jnp.asarray([0, 0, 2, 1, 0, 0], jnp.int32)  # last two are padding
    out = np.asarray(masked_segment_sum(vals, dst, jnp.int32(4), 3))
    expect = np.zeros((3, 2), np.float32)
    expect[0] = [0 + 2, 1 + 3]
    expect[2] = [4, 5]
    expect[1] = [6, 7]
    np.testing.assert_allclose(out, expect)


def test_masked_segment_mean_empty_target():
    vals = jnp.asarray([[2.0], [4.0], [100.0]])
    dst = jnp.asarray([1, 1, 0], jnp.int32)
    out = np.asarray(masked_segment_mean(vals, dst, jnp.int32(2), 3))
    np.testing.assert_allclose(out, [[0.0], [3.0], [0.0]])


def test_masked_segment_max():
    vals = jnp.asarray([1.0, -5.0, 3.0, 99.0])
    dst = jnp.asarray([0, 0, 1, 1], jnp.int32)
    out = np.asarray(masked_segment_max(vals, dst, jnp.int32(3), 2))
    np.testing.assert_allclose(out, [1.0, 3.0])


def test_masked_segment_softmax():
    logits = jnp.asarray([1.0, 2.0, 3.0, 50.0])
    dst = jnp.asarray([0, 0, 1, 0], jnp.int32)  # edge 3 padded
    att = np.asarray(masked_segment_softmax(logits, dst, jnp.int32(3), 3))
    e = np.exp([1.0, 2.0])
    np.testing.assert_allclose(att[:2], e / e.sum(), rtol=1e-6)
    np.testing.assert_allclose(att[2], 1.0, rtol=1e-6)
    assert att[3] == 0.0
    # empty segment (target 2) produced no NaNs anywhere
    assert np.isfinite(att).all()


def test_segment_softmax_multihead():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(8, 2)),
                         jnp.float32)
    dst = jnp.asarray([0, 1, 0, 1, 2, 2, 0, 0], jnp.int32)
    att = np.asarray(masked_segment_softmax(logits, dst, jnp.int32(6), 3))
    # per-(target, head) sums = 1 for targets with real edges
    sums = np.zeros((3, 2))
    for e in range(6):
        sums[dst[e]] += att[e]
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)
    assert np.all(att[6:] == 0)


def test_segment_degrees_sorted():
    from salient_plusplus_tpu.ops.segment import segment_degrees_sorted

    dst = jnp.asarray([0, 0, 1, 3, 3, 3, 5, 5], jnp.int32)  # sorted, T=6
    deg = np.asarray(segment_degrees_sorted(dst, jnp.int32(8), 6))
    assert deg.tolist() == [2, 1, 0, 3, 0, 2]
    # padding beyond count excluded
    deg2 = np.asarray(segment_degrees_sorted(dst, jnp.int32(5), 6))
    assert deg2.tolist() == [2, 1, 0, 2, 0, 0]


def test_sorted_mean_equals_unsorted():
    rng = np.random.default_rng(3)
    E, T, F = 200, 17, 5
    dst = np.sort(rng.integers(0, T, E)).astype(np.int32)
    vals = rng.normal(size=(E, F)).astype(np.float32)
    count = jnp.int32(150)
    a = np.asarray(masked_segment_mean(jnp.asarray(vals), jnp.asarray(dst),
                                       count, T, sorted_dst=True))
    b = np.asarray(masked_segment_mean(jnp.asarray(vals), jnp.asarray(dst),
                                       count, T, sorted_dst=False))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_scan_segment_sum_matches_scatter():
    from salient_plusplus_tpu.ops.segment import sorted_segment_sum_scan

    rng = np.random.default_rng(7)
    E, T, F = 300, 29, 6
    dst = np.sort(rng.integers(0, T, E)).astype(np.int32)
    vals = rng.normal(size=(E, F)).astype(np.float32)
    count = jnp.int32(250)
    a = np.asarray(sorted_segment_sum_scan(jnp.asarray(vals),
                                           jnp.asarray(dst), count, T))
    b = np.asarray(masked_segment_sum(jnp.asarray(vals), jnp.asarray(dst),
                                      count, T))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_sorted_segment_softmax_matches_scatter_version():
    """Scan-based softmax (sorted layout) must equal the XLA
    segment_max/sum formulation, including padding and empty segments."""
    import jax.numpy as jnp

    from salient_plusplus_tpu.ops.segment import (masked_segment_softmax,
                                                  sorted_segment_softmax)

    rng = np.random.default_rng(3)
    E, T = 512, 96
    n_real = 430
    dst = np.sort(rng.integers(0, T, n_real)).astype(np.int32)
    dst = np.concatenate([dst, np.full(E - n_real, T, np.int32)])
    for shape in ((E,), (E, 4)):
        logits = rng.standard_normal(shape).astype(np.float32)
        a = sorted_segment_softmax(jnp.asarray(logits), jnp.asarray(dst),
                                   jnp.int32(n_real), T)
        b = masked_segment_softmax(jnp.asarray(logits), jnp.asarray(dst),
                                   jnp.int32(n_real), T, sorted_dst=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
        # rows sum to 1 per nonempty segment
        att = np.asarray(a)
        sums = np.zeros((T,) + shape[1:])
        np.add.at(sums, dst[:n_real], att[:n_real])
        nonempty = np.bincount(dst[:n_real], minlength=T)[:T] > 0
        np.testing.assert_allclose(sums[nonempty], 1.0, atol=1e-5)


def test_segment_softmax_self_matches_dense():
    """segment_softmax_self (GAT add_self_loops parity primitive): per
    target, softmax over incident edges + one self logit — checked against
    a dense numpy softmax, both layouts, incl. empty targets."""
    import numpy as np

    from salient_plusplus_tpu.ops.segment import segment_softmax_self

    rng = np.random.default_rng(0)
    T, E, H, count = 6, 20, 2, 17
    dst = np.sort(rng.integers(0, T, count))
    dst = np.concatenate([dst, np.full(E - count, T)]).astype(np.int32)
    logits = (rng.standard_normal((E, H)) * 3).astype(np.float32)
    self_logit = (rng.standard_normal((T, H)) * 3).astype(np.float32)
    for sorted_dst in (True, False):
        att, satt = segment_softmax_self(
            jnp.asarray(logits), jnp.asarray(dst), jnp.int32(count), T,
            jnp.asarray(self_logit), sorted_dst)
        att, satt = np.asarray(att), np.asarray(satt)
        for t in range(T):
            es = [e for e in range(count) if dst[e] == t]
            for h in range(H):
                ls = np.array([logits[e, h] for e in es]
                              + [self_logit[t, h]])
                sm = np.exp(ls - ls.max())
                sm /= sm.sum()
                for i, e in enumerate(es):
                    np.testing.assert_allclose(att[e, h], sm[i], atol=1e-5)
                np.testing.assert_allclose(satt[t, h], sm[-1], atol=1e-5)
        assert np.all(att[count:] == 0)
    # empty targets: self attention gets everything
    dst2 = np.concatenate([np.zeros(3), np.full(E - 3, T)]).astype(np.int32)
    _, satt2 = segment_softmax_self(
        jnp.asarray(logits), jnp.asarray(dst2), jnp.int32(3), T,
        jnp.asarray(self_logit), True)
    np.testing.assert_allclose(np.asarray(satt2)[1:], 1.0)
    # gradients flow finite through both outputs
    import jax

    def loss(lg, sl):
        a, s = segment_softmax_self(lg, jnp.asarray(dst), jnp.int32(count),
                                    T, sl, True)
        return a.sum() + s.sum()

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(logits),
                                       jnp.asarray(self_logit))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
