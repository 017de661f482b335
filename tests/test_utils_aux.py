import os

import numpy as np

from salient_plusplus_tpu.utils.data_collector import DataCollector
from salient_plusplus_tpu.utils.exp_launcher import ExpLauncher
from salient_plusplus_tpu.utils.timing import RuntimeStats, Timer
from salient_plusplus_tpu.utils.logging import RunLogger


def test_data_collector(tmp_path):
    dc = DataCollector(str(tmp_path), rank=1, enabled=True, tag="t")
    dc.set_epoch(3)
    dc.collect("stats", a=np.arange(5), b=[1, 2])
    f = os.path.join(str(tmp_path), "collected_data_t", "epoch3",
                     "rank1_stats.npz")
    assert os.path.exists(f)
    z = np.load(f)
    assert z["a"].tolist() == [0, 1, 2, 3, 4]
    # disabled is a no-op
    dc2 = DataCollector(str(tmp_path), enabled=False)
    dc2.set_epoch(0)
    dc2.collect("x", a=[1])


def test_exp_launcher_script(tmp_path):
    l = ExpLauncher(job_root=str(tmp_path), repo_root=".",
                    env={"OMP_NUM_THREADS": "1"})
    job_dir = l.prepare("synth:V=1000", "jobx",
                        flags={"epochs": 2, "train_fanouts": [5, 3]})
    script = open(os.path.join(job_dir, "run.sh")).read()
    assert "salient_plusplus_tpu.driver synth:V=1000 jobx" in script
    assert "--train_fanouts 5,3" in script
    assert "--load_balance_scheme federated" in script  # recommended default
    assert "export OMP_NUM_THREADS=1" in script
    assert os.access(os.path.join(job_dir, "run.sh"), os.X_OK)
    # slurm variant
    job_dir2 = l.prepare("synth:V=1000", "joby", slurm_nodes=2)
    script2 = open(os.path.join(job_dir2, "run.sh")).read()
    assert "#SBATCH --nodes=2" in script2


def test_runtime_stats_skips_first_epoch():
    rs = RuntimeStats()
    for e, v in enumerate([10.0, 1.0, 2.0]):
        rs.add("train", v)
        rs.end_epoch()
    s = rs.summary()
    assert abs(s["train"]["mean"] - 1.5) < 1e-9  # first epoch excluded
    assert "train" in rs.report()


def test_logger_flush(tmp_path):
    lg = RunLogger(str(tmp_path), host="h1")
    lg.log("a", 1)
    lg.log(("b", 2))
    lg.flush()
    lines = open(os.path.join(str(tmp_path), "h1_logs.txt")).read().splitlines()
    assert len(lines) == 2 and "('a', 1)" in lines[0]


def test_configure_env(tmp_path, monkeypatch):
    from salient_plusplus_tpu.utils import configure_env

    monkeypatch.chdir(tmp_path)
    path = configure_env.write_environment_config(str(tmp_path / "cfgs"))
    import json

    cfg = json.load(open(path))
    assert cfg["num_workers"] >= 1
    assert "ogbn-arxiv" in cfg["feasible_datasets"]


def test_comm_experiment_cli(tmp_path):
    from salient_plusplus_tpu.caching import experiment

    out = str(tmp_path / "res.json")
    res = experiment.main([
        "synth:V=2000,C=4,deg=8,F=8", "--parts", "2",
        "--fanouts", "4,3", "--minibatch", "128",
        "--schemes", "vip-analytical", "--replication", "0,0.2",
        "--out", out,
    ])
    assert 0.2 in res["vip-analytical"]
    res2 = experiment.main(["--parse", out])
    assert res2["vip-analytical"][0.2]["total"] > 0


def test_reduce_lr_on_plateau():
    import jax.numpy as jnp
    from salient_plusplus_tpu.train.state import (
        ReduceLROnPlateau, get_learning_rate, set_learning_rate)
    import optax
    from salient_plusplus_tpu.train.state import TrainState

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=0.1)
    params = {"w": jnp.ones(3)}
    state = TrainState(step=jnp.int32(0), epoch=jnp.int32(0), params=params,
                       batch_stats={}, opt_state=tx.init(params),
                       dropout_key=jnp.zeros(2, jnp.uint32), tx=tx,
                       apply_fn=lambda *a, **k: None)
    sched = ReduceLROnPlateau(factor=0.5, patience=1)
    state = sched.step(state, 1.0)   # best
    state = sched.step(state, 1.0)   # bad 1
    assert abs(get_learning_rate(state) - 0.1) < 1e-6
    state = sched.step(state, 1.0)   # bad 2 > patience → reduce
    assert abs(get_learning_rate(state) - 0.05) < 1e-6
    # optimizer still steps with the new lr
    g = {"w": jnp.ones(3)}
    state2 = state.apply_gradients(g)
    assert not np.allclose(np.asarray(state2.params["w"]),
                           np.asarray(state.params["w"]))


def test_async_checkpoint(tmp_path):
    import jax.numpy as jnp
    import optax
    from salient_plusplus_tpu.train import checkpoint as ckpt
    from salient_plusplus_tpu.train.state import TrainState

    tx = optax.adam(0.1)
    params = {"w": jnp.arange(4.0)}
    import jax
    state = TrainState(step=jnp.int32(3), epoch=jnp.int32(1), params=params,
                       batch_stats={}, opt_state=tx.init(params),
                       dropout_key=jax.random.key(0), tx=tx,
                       apply_fn=lambda *a, **k: None)
    d = str(tmp_path / "ck")
    ckpt.save(d, state, trial=0, epoch=5, acc=0.5, use_async=True)
    ckpt.wait_for_async_saves()
    zero = state.replace(params={"w": jnp.zeros(4)})
    back = ckpt.restore(d, zero, 0, 5)
    np.testing.assert_array_equal(np.asarray(back.params["w"]),
                                  np.arange(4.0))


def test_collect_data_wiring(tmp_path, monkeypatch):
    from salient_plusplus_tpu.config import RunConfig
    from salient_plusplus_tpu.data import synthetic
    from salient_plusplus_tpu.train.loop import Trainer

    g = synthetic.planted_partition(num_nodes=1500, num_classes=4,
                                    avg_degree=8, num_features=8, seed=2)
    cfg = RunConfig(train_batch_size=128, train_fanouts=[4, 3],
                    hidden_features=8, num_layers=2, num_workers=1,
                    calibration_batches=2, collect_data=True,
                    output_root=str(tmp_path))
    t = Trainer(cfg, g)
    t.train_epoch(0)
    import glob

    files = glob.glob(str(tmp_path) + "/collected_data_*/epoch0/*.npz")
    assert files, "collector produced no dumps"
    z = np.load(files[0])
    assert "level_sizes" in z


def test_downloader_fails_fast_without_egress(tmp_path):
    """No-egress environments must get an actionable error, not a hang
    (reference parity: utils/download_datasets_fast.py)."""
    import pytest

    from salient_plusplus_tpu.utils.download_datasets import (
        archive_url, download_partitioned)

    assert archive_url("ogbn-products", 8).endswith("ogbn-products-8.tar.gz")
    with pytest.raises(RuntimeError, match="egress|download"):
        download_partitioned("ogbn-products", 8, str(tmp_path), timeout=2.0)
    with pytest.raises(ValueError):
        download_partitioned("not-a-dataset", 2, str(tmp_path))


def test_slurm_wait_polls_until_done():
    """Launcher job polling (reference exp_driver.py:209-221): wait_slurm
    polls the queue until the job id disappears."""
    l = ExpLauncher()
    state = {"left": 3}

    def fake_poll(jid):
        assert jid == "4242"
        state["left"] -= 1
        return state["left"] > 0

    assert l.wait_slurm("Submitted batch job 4242", poll_s=0.0,
                        _poll_cmd=fake_poll)
    assert state["left"] == 0
    # timeout path
    assert not l.wait_slurm("Submitted batch job 1", poll_s=0.0,
                            timeout_s=-1.0, _poll_cmd=lambda j: True)
