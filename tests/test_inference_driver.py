import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salient_plusplus_tpu.models import make_model
from salient_plusplus_tpu.models.inference import layerwise_inference
from salient_plusplus_tpu.sampling import BatchSpec, multilayer_sample_np, pad_sample


@pytest.mark.parametrize(
    "name", ["SAGE", "SAGEClassic", "GAT", "GIN", "GCN", "JKNet",
             "SAGEResInception"])
def test_layerwise_inference_matches_full_sampling(tiny_graph, name):
    """Layer-wise full-graph inference must equal a full-expansion sampled
    forward for any seed set (both see all edges). The reference only
    supports SAGE/SAGEClassic/GAT (driver/models.py); this covers the whole
    zoo (BN models run off init-time running stats in both paths)."""
    g = tiny_graph
    model = make_model(name, g.num_features, 16, g.num_classes, 2,
                       dtype=jnp.float32)
    # init with a full-expansion batch
    seeds = g.split_idx["valid"][:16]
    s = multilayer_sample_np(g.rowptr, g.col, seeds, [-1, -1])
    spec = BatchSpec((-1, -1), 16,
                     (16, s.level_sizes[1] + 8, s.level_sizes[2] + 8),
                     (len(s.hops[0][0]) + 8, len(s.hops[1][0]) + 8))
    b = pad_sample(s, spec, g.y)
    x_feats = jnp.asarray(np.asarray(g.x, np.float32))
    xb = x_feats[np.asarray(b.n_id)]
    variables = model.init(jax.random.key(0), xb, b, training=False)
    out_sampled = np.asarray(model.apply(variables, xb, b, training=False))

    emb = layerwise_inference(
        name, variables["params"], g.rowptr, g.col, x_feats, num_layers=2,
        chunk=128, dtype=jnp.float32,
        batch_stats=variables.get("batch_stats"))
    out_layerwise = np.asarray(emb)[seeds]
    np.testing.assert_allclose(out_sampled[:16], out_layerwise,
                               rtol=2e-3, atol=2e-3)


def test_layerwise_inference_unsupported():
    with pytest.raises(NotImplementedError):
        layerwise_inference("ARMA", {}, np.zeros(2, np.int64),
                            np.zeros(0, np.int32), None, 2)


def test_driver_cli_computation(tmp_path):
    from salient_plusplus_tpu import driver

    out = driver.main([
        "synth:V=2000,C=5,deg=8,F=16", "cli_test",
        "--epochs", "2", "--train_batch_size", "128",
        "--train_fanouts", "5,3", "--batchwise_test_fanouts", "6,6",
        "--final_test_fanouts", "6,6", "--num_layers", "2",
        "--hidden_features", "16", "--num_workers", "1",
        "--calibration_batches", "2", "--lr", "0.01",
        "--output_root", str(tmp_path),
    ])
    assert len(out) == 1
    assert out[0]["final_valid"] > 0.3
    job_dir = os.path.join(str(tmp_path), "cli_test")
    assert os.path.exists(os.path.join(job_dir, "args.json"))
    assert os.path.exists(os.path.join(job_dir, "results.json"))
    assert os.path.exists(os.path.join(job_dir, "metadata.txt"))


def test_driver_cli_comm_simulation(tmp_path):
    from salient_plusplus_tpu import driver

    out = driver.main([
        "synth:V=2000,C=5,deg=8,F=16", "sim_test",
        "--execution_mode", "communication_simulation",
        "--train_batch_size", "128", "--train_fanouts", "5,3",
        "--cache_creation_epochs", "1",
        "--output_root", str(tmp_path),
    ])
    assert "vip-analytical" in out
    for alpha, d in out["vip-analytical"].items():
        assert d["total"] == d["internal"] + d["cross"] + d["cache_hits"]


def test_driver_distributed_path(tmp_path):
    """--distribute_data on the 8-device virtual mesh: cache creation +
    training + eval end-to-end through the CLI."""
    from salient_plusplus_tpu import driver

    out = driver.main([
        "synth:V=4096,C=4,deg=8,F=16", "dist_cli",
        "--distribute_data", "true", "--epochs", "2",
        "--train_batch_size", "32", "--train_fanouts", "4,3",
        "--batchwise_test_fanouts", "5,5", "--final_test_fanouts", "5,5",
        "--num_layers", "2", "--hidden_features", "16",
        "--num_workers", "1", "--calibration_batches", "2",
        "--cache_size", "0.2", "--lr", "0.01",
        "--output_root", str(tmp_path),
    ])
    assert len(out) == 1
    assert 0 <= out[0]["final_test"] <= 1
    assert out[0]["final_valid"] > 0.3  # learnable planted graph


def test_presampler_training_path(small_graph):
    from salient_plusplus_tpu.config import RunConfig
    from salient_plusplus_tpu.train.loop import Trainer

    cfg = RunConfig(
        train_batch_size=256, train_fanouts=[5, 3], hidden_features=16,
        num_layers=2, lr=0.01, num_workers=2, calibration_batches=2,
        seed=8, train_sampler="FastPreSampler",
    )
    t = Trainer(cfg, small_graph)
    l0 = t.train_epoch(0)
    l1 = t.train_epoch(1)
    assert np.isfinite(l1) and l1 < l0


def test_driver_multi_trial_and_resume(tmp_path):
    """Two trials reset state independently; RESUME=1 restarts the
    distributed path from the latest checkpoint."""
    from salient_plusplus_tpu import driver

    out = driver.main([
        "synth:V=1500,C=4,deg=8,F=8", "mt",
        "--trials", "2", "--epochs", "1", "--train_batch_size", "128",
        "--train_fanouts", "4,3", "--batchwise_test_fanouts", "4,4",
        "--final_test_fanouts", "4,4", "--num_layers", "2",
        "--hidden_features", "8", "--num_workers", "1",
        "--calibration_batches", "2", "--lr", "0.01", "--use_lrs", "true",
        "--patience", "3",
        "--output_root", str(tmp_path),
    ])
    assert len(out) == 2
    assert out[0]["final_valid"] != 0 and out[1]["final_valid"] != 0


def test_driver_distributed_resume(tmp_path, monkeypatch):
    """RESUME=1 restarts the distributed driver path from the latest
    checkpoint (SURVEY §5.3/5.4: restart-from-checkpoint), continuing at
    start_epoch = resume+1 instead of epoch 0."""
    from salient_plusplus_tpu import driver

    args = [
        "synth:V=2000,C=4,deg=8,F=8", "dres",
        "--distribute_data", "true",
        "--trials", "1", "--epochs", "2", "--train_batch_size", "32",
        "--train_fanouts", "4,3", "--batchwise_test_fanouts", "4,4",
        "--final_test_fanouts", "4,4", "--num_layers", "2",
        "--hidden_features", "8", "--num_workers", "1",
        "--calibration_batches", "2", "--lr", "0.01",
        "--test_epoch_frequency", "1",
        "--output_root", str(tmp_path),
    ]
    out1 = driver.main(args)
    assert len(out1) == 1 and out1[0]["best_epoch"] >= 0

    monkeypatch.setenv("RESUME", "1")
    out2 = driver.main(args[:6] + ["--epochs", "3"] + args[8:])
    assert len(out2) == 1
    # resumed run logged the resume event and trained only the new epochs
    log = (tmp_path / "dres" / "host0_logs.txt").read_text()
    assert "'resumed'" in log
    # epoch 0/1 epoch_time lines appear once (first run), epoch 2 from
    # the resumed run
    assert "('epoch_time', 0, 2," in log


def test_trainer_layerwise_final_test(tiny_graph, tmp_path):
    """final_test_mode=layerwise: the trial's final accuracies come from
    exact full-graph inference and agree with batchwise eval."""
    from salient_plusplus_tpu.config import RunConfig
    from salient_plusplus_tpu.train.loop import Trainer

    g = tiny_graph
    cfg = RunConfig(
        train_batch_size=64, test_batch_size=128,
        train_fanouts=[5, 3], batchwise_test_fanouts=[8, 8],
        final_test_fanouts=[8, 8], num_layers=2, hidden_features=16,
        num_workers=1, calibration_batches=2, lr=0.01, epochs=2,
        final_test_mode="layerwise", inference_chunk=128)
    t = Trainer(cfg, g)
    res = t.run_trial(0)
    batchwise = t.evaluate("test")
    assert res.final_test_acc > 0.7
    assert abs(res.final_test_acc - batchwise) < 0.15
