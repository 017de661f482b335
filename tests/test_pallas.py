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
