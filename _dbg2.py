import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import salient_plusplus_tpu.ops.mxu_segment as M
M.use_mxu_spmm(True, interpret=True)
rng = np.random.default_rng(0)
ids = np.sort(rng.integers(0, 128, 900)).astype(np.int32)
ids = np.concatenate([ids, np.full(124, 128, np.int32)])
vals = rng.standard_normal((1024, 64)).astype(np.float32)
out = M.sorted_segment_sum_mxu(jnp.asarray(vals), jnp.asarray(ids), 128, interpret=True)
from salient_plusplus_tpu.sampling.batch import BatchSpec
from salient_plusplus_tpu.sampling.cpp import NativeSampler
from salient_plusplus_tpu.data import synthetic
g = synthetic.planted_partition("mxu-t", num_nodes=600, num_classes=4, avg_degree=6, num_features=12, seed=3)
native = NativeSampler(np.asarray(g.rowptr, np.int64), np.asarray(g.col, np.int32))
spec = BatchSpec.worst_case(64, [4, 3])
seeds = np.arange(0, 640, 10)[:64]
b = native.sample(spec, seeds, rng_seed=5)
print("sample ok", flush=True)
