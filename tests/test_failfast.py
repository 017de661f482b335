"""Rank-death fail-fast: a crashed process must NOT hang the cluster.

The reference's distributed runtime has no failure detection — its
rendezvous polls forever (ddp.py:269-276) and a dead rank deadlocks the
NCCL collectives of every survivor (SURVEY.md §5.3). This framework's
recovery story is fail-fast + RESUME-from-checkpoint: here we prove the
fail-fast half on a real 2-process jax.distributed cluster by killing
one rank mid-job and requiring the survivor to terminate with an error
within the heartbeat window (RESUME itself is covered by
tests/test_inference_driver.py::test_driver_distributed_resume).
"""

import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_rank_death_fails_fast_not_hangs():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    })
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_mp_chaos_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", str(pid), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            # generous bound: epoch 0 + 10 s heartbeat window + teardown.
            # A hang here IS the failure being tested for.
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(
                "survivor hung after rank death — fail-fast broken")
        outputs.append(stdout.decode(errors="replace"))

    # rank 1 died as scripted
    assert procs[1].returncode == 42, outputs[1][-2000:]
    assert "EPOCH0_DONE" in outputs[1]
    # rank 0 terminated abnormally (exception or runtime abort), and did
    # NOT complete the epoch as if nothing happened
    assert procs[0].returncode != 0, outputs[0][-2000:]
    assert "EPOCH0_DONE" in outputs[0]
    assert "EPOCH1_DONE_UNEXPECTED" not in outputs[0]
