import os
import subprocess

import numpy as np


def test_partition_reorder_cli(tmp_path):
    from salient_plusplus_tpu.partition import cli
    from salient_plusplus_tpu.data.dataset import PartitionedGraphData

    path = cli.main([
        "synth:V=3000,C=4,deg=8,F=16", "--parts", "2",
        "--out_root", str(tmp_path), "--fanouts", "5,3",
        "--minibatch", "128", "--save_labels",
        "--dataset_root", str(tmp_path),
    ])
    assert os.path.exists(os.path.join(path, "meta.json"))
    assert os.path.exists(os.path.join(path, "partition_quality.json"))
    name = os.path.basename(path)
    pg = PartitionedGraphData.load_partitioned(str(tmp_path), name, 0)
    assert pg.num_parts == 2
    # VIP ordering: hot prefix should carry higher average probability mass
    # (weakly verified: x shard rows exist and are zero only in the ghost
    # tail which has no labels)
    ghost = pg.y[pg.part_offsets[0]:pg.part_offsets[1]] == -1
    assert ghost.sum() < (pg.part_offsets[1] - pg.part_offsets[0])


def test_native_sanitizer_script_exists():
    """The sanitizer harness is part of the build (SURVEY §5.2 gap)."""
    import salient_plusplus_tpu.native as n

    d = os.path.dirname(n.__file__)
    assert os.path.exists(os.path.join(d, "run_sanitizers.sh"))
    assert os.path.exists(os.path.join(d, "sampler_test.cpp"))


def test_driver_resume(tmp_path, monkeypatch):
    """RESUME=1 restarts from the latest checkpoint epoch."""
    from salient_plusplus_tpu.train import checkpoint as ckpt

    assert ckpt.latest_epoch(str(tmp_path)) is None
    # fabricate checkpoint dirs
    os.makedirs(os.path.join(str(tmp_path), "model_0_3"))
    os.makedirs(os.path.join(str(tmp_path), "model_0_7"))
    assert ckpt.latest_epoch(str(tmp_path), 0) == 7


def test_driver_consumes_prepartitioned_dataset(tmp_path):
    """End-to-end: partition CLI output → driver trains distributed via
    from_partitioned (no in-memory re-partitioning) — the reference's
    download → per-rank-load flow (dataset.py:191-215)."""
    from salient_plusplus_tpu.driver import main as driver_main
    from salient_plusplus_tpu.partition.cli import main as cli_main

    cli_main(["synth:V=4096,C=4,deg=7,F=16", "--parts", "8",
              "--out_root", str(tmp_path), "--fanouts", "4,3",
              "--minibatch", "128"])
    name = [d for d in os.listdir(tmp_path) if "reordered-k8" in d][0]
    out = driver_main([name, "prepart_job",
                       "--dataset_root", str(tmp_path),
                       "--output_root", str(tmp_path / "jobs"),
                       "--distribute_data", "true",
                       "--epochs", "2", "--train_batch_size", "32",
                       "--train_fanouts", "4,3",
                       "--batchwise_test_fanouts", "5,5",
                       "--final_test_fanouts", "5,5",
                       "--hidden_features", "16", "--num_layers", "2",
                       "--num_workers", "1",
                       "--calibration_batches", "2"])
    assert out[0]["final_valid"] > 0.5
    # single-host path materializes the full graph from the shards
    out2 = driver_main([name, "prepart_single",
                        "--dataset_root", str(tmp_path),
                        "--output_root", str(tmp_path / "jobs2"),
                        "--epochs", "1", "--train_batch_size", "64",
                        "--train_fanouts", "4,3",
                        "--batchwise_test_fanouts", "5,5",
                        "--final_test_fanouts", "5,5",
                        "--hidden_features", "16", "--num_layers", "2",
                        "--num_workers", "1",
                        "--calibration_batches", "2"])
    assert out2[0]["final_valid"] > 0.4


def test_readiness_drill_small(tmp_path):
    """The products readiness drill at toy scale: generate → save →
    partition/reorder CLI → train CLI, peak RSS recorded per stage."""
    from salient_plusplus_tpu.utils.readiness_drill import run_drill

    rep = run_drill(nodes=3000, parts=2, epochs=1,
                    root=str(tmp_path), feature_dim=16,
                    fanouts="4,3", batch=64, workers=1)
    assert set(rep["stages"]) == {"generate_save", "partition_reorder",
                                  "train_cli"}
    for st in rep["stages"].values():
        assert st["peak_rss_gb"] > 0
    assert os.path.isdir(rep["reordered_path"])
    assert rep["results"][0]["final_test"] >= 0.0
