"""Worker for the rank-death fail-fast test (not a test module).

Launched twice by tests/test_failfast.py. Both processes form a real
jax.distributed cluster with a short heartbeat timeout and train one
epoch; process 1 then dies abruptly (os._exit — the kill -9 analog).
Process 0 keeps training and MUST terminate with an error within the
heartbeat window instead of blocking forever in a collective.

Reference gap being exceeded: SALIENT++'s rendezvous waits forever and a
crashed rank hangs the whole job (ddp.py:269-276; SURVEY.md §5.3) — the
failure mode this framework is required NOT to have.
"""

import os
import sys


def main():
    coord, pid, nprocs = sys.argv[1:4]
    import jax

    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nprocs),
                               process_id=int(pid),
                               heartbeat_timeout_seconds=10)

    from salient_plusplus_tpu.config import RunConfig
    from salient_plusplus_tpu.data import synthetic
    from salient_plusplus_tpu.parallel import make_mesh
    from salient_plusplus_tpu.partition import contiguous_partition
    from salient_plusplus_tpu.train.dist_loop import DistributedTrainer

    g = synthetic.planted_partition(
        name="chaos", num_nodes=1024, num_classes=4, avg_degree=6,
        num_features=8, seed=11)
    labels = contiguous_partition(g.num_nodes, 4)
    cfg = RunConfig(
        train_batch_size=16, train_fanouts=[3, 2],
        batchwise_test_fanouts=[3, 3], final_test_fanouts=[3, 3],
        hidden_features=8, num_layers=2, lr=0.01, num_workers=1,
        calibration_batches=1, seed=5)
    t = DistributedTrainer(cfg, g, labels, mesh=make_mesh(4))
    t.train_epoch(0)
    print("EPOCH0_DONE", flush=True)

    if int(pid) == 1:
        os._exit(42)  # simulated rank death mid-job

    # Survivor: the next epoch's collectives must fail fast, not hang.
    try:
        t.train_epoch(1)
    except BaseException as e:  # noqa: BLE001 — any error is fail-fast
        print("FAILFAST", type(e).__name__, str(e)[:300], flush=True)
        sys.exit(7)
    print("EPOCH1_DONE_UNEXPECTED", flush=True)
    sys.exit(0)


if __name__ == "__main__":
    main()
