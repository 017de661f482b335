"""Mesh-sharded layerwise inference vs the single-host oracle.

The distributed engine (train/dist_inference.py) must produce the same
full-graph embeddings as the single-device layerwise path
(models/inference.py) — same relabeled graph, same params, different
propagation machinery (chunked exchange all_to_alls vs local gathers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salient_plusplus_tpu.config import RunConfig
from salient_plusplus_tpu.data.dataset import pad_feature_dim
from salient_plusplus_tpu.data.reorder import reorder_graph
from salient_plusplus_tpu.models.inference import layerwise_inference
from salient_plusplus_tpu.partition import multiconstraint_partition
from salient_plusplus_tpu.parallel import make_mesh
from salient_plusplus_tpu.train.dist_loop import DistributedTrainer


def _cfg(model_name):
    return RunConfig(
        train_batch_size=16, test_batch_size=32,
        train_fanouts=[4, 3], batchwise_test_fanouts=[5, 5],
        final_test_fanouts=[5, 5], hidden_features=16, num_layers=2,
        lr=0.01, num_workers=1, calibration_batches=2, seed=0,
        model_name=model_name, inference_chunk=96,
        final_test_mode="layerwise",
    )


@pytest.mark.parametrize("model_name", ["SAGE", "GIN"])
def test_sharded_layerwise_matches_single_host(tiny_graph, model_name):
    g = tiny_graph
    world = 8
    labels = multiconstraint_partition(g.rowptr, g.col, world, seed=0)
    cfg = _cfg(model_name)
    mesh = make_mesh(world)
    trainer = DistributedTrainer(cfg, g, labels, mesh=mesh)
    trainer.train_epoch(0)  # non-trivial params + batch_stats

    accs = trainer.evaluate_layerwise(("valid", "test"))
    assert 0.0 <= accs["valid"] <= 1.0

    # single-host oracle on the SAME relabeled graph with the SAME params
    pg, x_shards, _ = reorder_graph(g, labels)
    x_full = np.concatenate([pad_feature_dim(np.asarray(s))
                             for s in x_shards]).astype(jnp.bfloat16)
    params = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    bs = (jax.tree_util.tree_map(np.asarray, trainer.state.batch_stats)
          or None)
    emb_s = layerwise_inference(
        model_name, params, pg.rowptr, pg.col,
        jnp.asarray(x_full), cfg.num_layers, chunk=cfg.inference_chunk,
        batch_stats=bs)

    from salient_plusplus_tpu.train.dist_inference import (
        layerwise_inference_spmd)

    emb_d = layerwise_inference_spmd(trainer, chunk=cfg.inference_chunk)
    emb_d = np.asarray(jax.jit(
        lambda e: e, out_shardings=trainer.repl_sharding)(emb_d))
    emb_s = np.asarray(emb_s)
    assert emb_d.shape == emb_s.shape
    # identical math modulo bf16 accumulation grouping
    pred_agree = (emb_d.argmax(-1) == emb_s.argmax(-1)).mean()
    assert pred_agree > 0.995, pred_agree
    np.testing.assert_allclose(emb_d, emb_s, atol=5e-2, rtol=5e-2)


def test_layerwise_falls_back_without_full_hbm():
    from salient_plusplus_tpu.data import synthetic

    # big enough that the 8-way padded partitions have room for a hot
    # prefix strictly smaller than the 128-aligned partition size
    g = synthetic.planted_partition(
        name="lwfb", num_nodes=3000, num_classes=4, avg_degree=8,
        num_features=16, seed=4)
    world = 8
    labels = multiconstraint_partition(g.rowptr, g.col, world, seed=0)
    cfg = _cfg("SAGE").replace(hbm_fraction=0.75)
    trainer = DistributedTrainer(cfg, g, labels, mesh=make_mesh(world))
    trainer.train_epoch(0)
    accs = trainer.evaluate_layerwise(("valid",))
    assert 0.0 <= accs["valid"] <= 1.0
    assert any("LAYERWISE_NEEDS_FULL_HBM_FALLBACK" in str(e)
               for e in trainer.logger.events)
