import os, glob, numpy as np, jax
from salient_plusplus_tpu.config import RunConfig
from salient_plusplus_tpu.data import synthetic
from salient_plusplus_tpu.train.loop import Trainer

g = synthetic.powerlaw_graph(name="bench-products", num_nodes=1_000_000,
                             avg_degree=15, num_features=100, num_classes=47, seed=0)
cfg = RunConfig(train_batch_size=1024, train_fanouts=[15, 10, 5],
                hidden_features=256, num_layers=3, lr=0.003,
                num_workers=3, max_batches_in_flight=8, calibration_batches=6,
                spec_safety=1.15, calibrate_worst_case=False,
                profile_dir="/tmp/prof_r2")
t = Trainer(cfg, g)
idx = t.shuffler.get_idx(0)
t.train_sampler.set_epoch(idx[: 40 * 1024], 0)
# warm epoch 0 (compile+warmup), profile epoch 1
t.train_sampler.set_epoch(idx[: 40 * 1024], 0); t.train_epoch(0)
t.train_sampler.set_epoch(idx[40 * 1024 : 60 * 1024], 1); t.train_epoch(1)
print("done")
