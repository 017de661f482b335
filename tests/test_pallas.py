"""Pallas kernel correctness in interpret mode (CPU)."""

import jax.numpy as jnp
import numpy as np

from salient_plusplus_tpu.ops.pallas_gather import pallas_gather_rows


def test_pallas_gather_interpret():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(1000, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1000, size=512).astype(np.int32))
    out = pallas_gather_rows(table, idx, block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(table)[np.asarray(idx)])


def test_pallas_gather_bf16_interpret():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(300, 256)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 300, size=128).astype(np.int32))
    out = pallas_gather_rows(table, idx, block=128, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32),
        np.asarray(table, np.float32)[np.asarray(idx)])


def test_fused_gather_segment_sum_interpret():
    import jax
    from salient_plusplus_tpu.ops.pallas_aggregate import (
        fused_gather_segment_sum, make_tile_starts)

    rng = np.random.default_rng(0)
    N, F, T, E_real = 500, 128, 128, 900
    chunk = 128
    E_pad = ((E_real + chunk - 1) // chunk + 1) * chunk
    emb = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    dst_r = np.sort(rng.integers(0, T, E_real)).astype(np.int32)
    src_r = rng.integers(0, N, E_real).astype(np.int32)
    src = np.zeros(E_pad, np.int32)
    dst = np.full(E_pad, T, np.int32)
    src[:E_real] = src_r
    dst[:E_real] = dst_r
    ts = make_tile_starts(jnp.asarray(dst), jnp.int32(E_real), T, t_tile=32)
    out = fused_gather_segment_sum(
        emb, jnp.asarray(src), jnp.asarray(dst), ts, T,
        t_tile=32, chunk=chunk, r=4, interpret=True)
    expect = np.zeros((T, F), np.float32)
    np.add.at(expect, dst_r, np.asarray(emb)[src_r])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_fused_empty_tiles_interpret():
    from salient_plusplus_tpu.ops.pallas_aggregate import (
        fused_gather_segment_sum, make_tile_starts)

    rng = np.random.default_rng(1)
    N, F, T = 64, 128, 64
    chunk = 64
    # all edges in one tile; other tiles empty
    E_real = 40
    E_pad = 2 * chunk
    dst_r = np.sort(rng.integers(0, 16, E_real)).astype(np.int32)
    src_r = rng.integers(0, N, E_real).astype(np.int32)
    src = np.zeros(E_pad, np.int32); src[:E_real] = src_r
    dst = np.full(E_pad, T, np.int32); dst[:E_real] = dst_r
    emb = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    ts = make_tile_starts(jnp.asarray(dst), jnp.int32(E_real), T, t_tile=16)
    out = fused_gather_segment_sum(emb, jnp.asarray(src), jnp.asarray(dst),
                                   ts, T, t_tile=16, chunk=chunk, r=4,
                                   interpret=True)
    expect = np.zeros((T, F), np.float32)
    np.add.at(expect, dst_r, np.asarray(emb)[src_r])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_fused_op_grad_traces_and_bwd_correct():
    """Regression: the custom_vjp residuals must be JAX-typed leaves (a raw
    np.dtype residual crashed grad tracing); the backward itself is the XLA
    scatter transpose, checked against numpy."""
    import jax
    import jax.numpy as jnp
    from salient_plusplus_tpu.ops.pallas_aggregate import (
        _fused_bwd, fused_segment_sum_op)

    rng = np.random.default_rng(3)
    N, F, T, E = 96, 8, 64, 200
    src = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    dst = jnp.asarray(np.sort(rng.integers(0, T, E)).astype(np.int32))
    count = jnp.int32(E)

    def loss(emb):
        return fused_segment_sum_op(emb, src, dst, count, T, 64).sum()

    # trace-only (the Pallas forward needs a TPU; the dtype-residual bug
    # crashed at TRACE time, before any kernel ran)
    g_shape = jax.eval_shape(jax.grad(loss),
                             jax.ShapeDtypeStruct((N, F), jnp.float32))
    assert g_shape.shape == (N, F) and g_shape.dtype == jnp.float32

    # backward math vs numpy
    g = jnp.asarray(rng.normal(size=(T, F)).astype(np.float32))
    proto = jnp.zeros((N, 0), jnp.float32)
    (d_emb, _, _, _) = _fused_bwd(T, 64, (proto, src, dst, count), g)
    expect = np.zeros((N, F), np.float32)
    np.add.at(expect, np.asarray(src), np.asarray(g)[np.asarray(dst)])
    np.testing.assert_allclose(np.asarray(d_emb), expect, rtol=1e-5)
