"""Host-RAM feature tier (gpu_percent analog): hot/cold split must be
training-equivalent to all-HBM features."""

import jax
import numpy as np

from salient_plusplus_tpu.config import RunConfig
from salient_plusplus_tpu.train.loop import Trainer


def _run(small_graph, hbm_fraction):
    cfg = RunConfig(
        train_batch_size=256, test_batch_size=512,
        train_fanouts=[5, 3], batchwise_test_fanouts=[6, 6],
        final_test_fanouts=[6, 6],
        hidden_features=16, num_layers=2, lr=0.01, num_workers=2,
        calibration_batches=2, seed=4, hbm_fraction=hbm_fraction,
    )
    t = Trainer(cfg, small_graph)
    t.train_epoch(0)
    acc = t.evaluate("valid")
    return jax.tree_util.tree_map(np.asarray, t.state.params), acc


def test_host_tier_equivalent(small_graph):
    p_full, acc_full = _run(small_graph, 1.0)
    p_half, acc_half = _run(small_graph, 0.5)
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_half)):
        np.testing.assert_array_equal(a, b)
    assert acc_full == acc_half


def test_host_tier_tiny_fraction(small_graph):
    """Even 5% HBM residency must stay exact (nearly everything cold)."""
    p_full, acc_full = _run(small_graph, 1.0)
    p_tiny, acc_tiny = _run(small_graph, 0.05)
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_tiny)):
        np.testing.assert_array_equal(a, b)
    assert acc_full == acc_tiny


def test_cold_overlay_kernel_matches_scatter(tiny_graph):
    """The MXU-kernel cold overlay (sorted placement + presence column)
    must equal the scatter overlay exactly on the same batch."""
    import jax
    import numpy as np

    from salient_plusplus_tpu.config import RunConfig
    from salient_plusplus_tpu.ops import mxu_segment as M
    from salient_plusplus_tpu.train.loop import Trainer
    from salient_plusplus_tpu.train.step import decode_batch, gather_features

    cfg = RunConfig(train_batch_size=64, train_fanouts=[5, 3],
                    batchwise_test_fanouts=[6, 6],
                    final_test_fanouts=[6, 6], hidden_features=16,
                    num_layers=2, lr=0.01, num_workers=1,
                    calibration_batches=2, seed=2, hbm_fraction=0.5)
    t = Trainer(cfg, tiny_graph)
    t.train_sampler.set_epoch(t.shuffler.get_idx(0), 0)
    it = iter(t.train_sampler)
    b = jax.device_put(jax.tree_util.tree_map(np.array,
                                              next(it).to_padded_batch()))
    it.close()
    b = decode_batch(b)  # gather_features consumes post-decode batches
    assert b.cold_rows is not None and int(b.cold_count) > 0

    M.use_mxu_spmm(True, interpret=True)
    x_kernel = np.asarray(gather_features(t.features, b), np.float32)
    M.use_mxu_spmm(False)
    x_scatter = np.asarray(gather_features(t.features, b), np.float32)
    M.use_mxu_spmm(None, interpret=False)
    np.testing.assert_array_equal(x_kernel, x_scatter)


def test_cold_cap_grows_after_drops(tiny_graph):
    """Over-budget cold rows must be self-correcting: the trainer grows
    the cold buffer after a dropping epoch (single-host tier)."""
    from salient_plusplus_tpu.config import RunConfig
    from salient_plusplus_tpu.train.loop import Trainer

    cfg = RunConfig(train_batch_size=64, train_fanouts=[5, 3],
                    batchwise_test_fanouts=[6, 6],
                    final_test_fanouts=[6, 6], hidden_features=16,
                    num_layers=2, lr=0.01, num_workers=1,
                    calibration_batches=2, seed=4, hbm_fraction=0.5)
    t = Trainer(cfg, tiny_graph)
    assert t.train_sampler.cfg.cold_cap > 128
    t.train_sampler.cfg.cold_cap = 128  # sabotage
    t.train_epoch(0)
    grown = t.train_sampler.cfg.cold_cap
    assert grown > 128, "cap must grow after cold drops"
    t.train_epoch(1)
    # second epoch under the regrown cap must not drop
    assert t.train_sampler.cfg.cold_cap == grown


def test_fp8_encode_decode_roundtrip():
    """fp8 e4m3 cold encoding: relative error per element ≤ 2^-3 (3
    mantissa bits), zero rows exact."""
    import jax.numpy as jnp

    from salient_plusplus_tpu.parallel.exchange import (
        fp8_decode_rows, fp8_encode_rows_np)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((64, 32)) * 10).astype(np.float32)
    x[3] = 0.0
    payload, scale = fp8_encode_rows_np(x)
    assert payload.dtype == np.uint8 and payload.shape == x.shape
    dec = np.asarray(fp8_decode_rows(jnp.asarray(payload),
                                     jnp.asarray(scale),
                                     jnp.float32))
    amax = np.abs(x).max(axis=1, keepdims=True)
    np.testing.assert_allclose(dec, x, atol=float(amax.max()) * 2**-3)
    np.testing.assert_array_equal(dec[3], 0.0)


def test_cold_fp8_trains_and_scores(small_graph):
    """cold_fp8 halves the >HBM wire; training through it must stay close
    to the exact cold tier (inputs quantized at ≤2^-3 relative error)."""
    cfg = RunConfig(
        train_batch_size=256, test_batch_size=512,
        train_fanouts=[5, 3], batchwise_test_fanouts=[6, 6],
        final_test_fanouts=[6, 6],
        hidden_features=16, num_layers=2, lr=0.01, num_workers=2,
        calibration_batches=2, seed=4, hbm_fraction=0.5, cold_fp8=True,
    )
    t = Trainer(cfg, small_graph)
    assert t.x_cold.dtype == np.uint8
    assert t.x_cold_scale is not None
    losses = [t.train_epoch(e) for e in range(2)]
    assert losses[-1] < losses[0]
    _, acc_exact = _run(small_graph, 0.5)
    acc_fp8 = t.evaluate("valid")
    assert acc_fp8 > 0.8 * acc_exact, (acc_fp8, acc_exact)
