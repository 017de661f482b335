"""Real multi-process distributed execution (2 processes x 4 devices).

Launches two OS processes that form a jax.distributed CPU cluster and run
the full DistributedTrainer stack (partitioned exchange, VIP cache build
through the cross-process all_to_all, owner-served cold tier), then
checks the result against the identical single-process 8-device run.
This exercises the process_count>1 branches (make_array_from_process_
local_data, addressable-shard cold serving) that a virtual mesh cannot.
Reference: ddp.py:245-309 (the reference's actual multi-node path).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_two_process(tmp_path, model="SAGE", extra_env=None):
    port = _free_port()
    out = str(tmp_path / "mp_result.json")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PALLAS_AXON_POOL_IPS": "",
        "MP_MODEL": model,
        "PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    })
    env.update(extra_env or {})
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", str(pid), "2",
             out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, text[-3000:]
    with open(out) as f:
        return json.load(f)


def test_two_process_cluster_matches_single_process(tmp_path):
    mp = _launch_two_process(tmp_path)
    assert mp["process_count"] == 2
    assert mp["local_ranks"] == [0, 1, 2, 3]  # process 0's devices
    assert mp["overflow"] == 0
    assert mp["cache_hits1"] > 0
    assert mp["remote1"] < mp["remote0"]  # VIP cache cut remote traffic
    # 2-bucket padding recovery ran ACROSS processes (per-step psum
    # agreement): the tight program must have executed
    assert mp["has_tight"]
    assert 0 < mp["tight_steps1"] <= mp["iters"]

    # identical single-process run (the conftest 8-device mesh)
    from salient_plusplus_tpu.config import RunConfig
    from salient_plusplus_tpu.data import synthetic
    from salient_plusplus_tpu.parallel import make_mesh
    from salient_plusplus_tpu.partition import contiguous_partition
    from salient_plusplus_tpu.train.dist_loop import DistributedTrainer

    g = synthetic.planted_partition(
        name="mp", num_nodes=4096, num_classes=4, avg_degree=8,
        num_features=16, seed=21)
    labels = contiguous_partition(g.num_nodes, 8)
    cfg = RunConfig(
        train_batch_size=32, train_fanouts=[4, 3],
        batchwise_test_fanouts=[5, 5], final_test_fanouts=[5, 5],
        hidden_features=16, num_layers=2, lr=0.01, num_workers=1,
        calibration_batches=2, seed=3, cache_size=0.2,
        hbm_fraction=0.75, cold_mode="owner",
    )
    t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(8))
    m0 = t.train_epoch(0)
    t.create_cache()
    m1 = t.train_epoch(1)
    acc = t.evaluate("valid")
    assert t.r_cap == mp["r_cap"]
    # the 2-process psum-agreed bucket choices match the single-process
    # all-local decision (same global all-fit predicate)
    assert m1["tight_steps"] == mp["tight_steps1"]
    np.testing.assert_allclose(mp["loss0"], m0["loss"], rtol=1e-5)
    np.testing.assert_allclose(mp["loss1"], m1["loss"], rtol=1e-5)
    np.testing.assert_allclose(mp["acc"], acc, atol=1e-6)


def test_two_process_gat_mirror_matches_single_process(
        tmp_path, monkeypatch):
    """GAT across a REAL process boundary with mirror_all specs
    (env-opt-in custom-VJP mode; round-4 gap: DistributedTrainer never
    set mirror_all, so multichip runs silently lost the mirror
    plumbing): the 2-process loss trajectory must match the identical
    single-process 8-device run — same gradients through psum — and the
    distributed specs must carry mirror_all."""
    monkeypatch.setenv("SPTPU_GAT_CUSTOM_VJP", "1")
    mp = _launch_two_process(tmp_path, model="GAT",
                             extra_env={"SPTPU_GAT_CUSTOM_VJP": "1"})
    assert mp["process_count"] == 2
    assert mp["mirror_all"]
    assert mp["overflow"] == 0

    from salient_plusplus_tpu.config import RunConfig
    from salient_plusplus_tpu.data import synthetic
    from salient_plusplus_tpu.parallel import make_mesh
    from salient_plusplus_tpu.partition import contiguous_partition
    from salient_plusplus_tpu.train.dist_loop import DistributedTrainer

    g = synthetic.planted_partition(
        name="mp", num_nodes=4096, num_classes=4, avg_degree=8,
        num_features=16, seed=21)
    labels = contiguous_partition(g.num_nodes, 8)
    cfg = RunConfig(
        train_batch_size=32, train_fanouts=[4, 3],
        batchwise_test_fanouts=[5, 5], final_test_fanouts=[5, 5],
        model_name="GAT", hidden_features=16, num_layers=2, lr=0.01,
        num_workers=1, calibration_batches=2, seed=3, cache_size=0.2,
    )
    t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(8))
    m0 = t.train_epoch(0)
    t.create_cache()
    m1 = t.train_epoch(1)
    acc = t.evaluate("valid")
    assert t.train_spec.mirror_all
    np.testing.assert_allclose(mp["loss0"], m0["loss"], rtol=1e-5)
    # epoch-1 loss runs on epoch-0-gradient-updated weights: agreement
    # proves the mirror backward produced the same gradients across the
    # process boundary as in-process SPMD
    np.testing.assert_allclose(mp["loss1"], m1["loss"], rtol=1e-5)
    np.testing.assert_allclose(mp["acc"], acc, atol=1e-6)


def test_multiprocess_intended_heuristic():
    """Auto-detectable multi-host launchers (SLURM/MPI/multi-host TPU
    worker lists) must trip the bootstrap, while single-process and
    single-host-TPU (TPU_WORKER_HOSTNAMES=localhost) runs must not."""
    from salient_plusplus_tpu.parallel.mesh import multiprocess_intended

    assert not multiprocess_intended({})
    assert not multiprocess_intended({"TPU_WORKER_HOSTNAMES": "localhost"})
    assert multiprocess_intended({"TPU_WORKER_HOSTNAMES": "h1,h2"})
    assert multiprocess_intended({"SLURM_NTASKS": "4"})
    assert not multiprocess_intended({"SLURM_NTASKS": "1"})
    assert not multiprocess_intended({"SLURM_NTASKS": "garbage"})
    assert multiprocess_intended({"OMPI_COMM_WORLD_SIZE": "2"})
    assert multiprocess_intended({"JAX_COORDINATOR_ADDRESS": "10.0.0.1:1"})
    assert multiprocess_intended({"JAX_PROCESS_ID": "0"})
