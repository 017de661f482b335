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
