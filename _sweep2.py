import sys, time, numpy as np, jax, jax.numpy as jnp
import salient_plusplus_tpu.ops.mxu_segment as M
rng = np.random.default_rng(0)
E, F, T = 655360, 128, 144128
n_real = int(E*0.92)
ids = np.sort(rng.integers(0, T, n_real)).astype(np.int32)
ids = np.concatenate([ids, np.full(E-n_real, T, np.int32)])
v = jnp.asarray(rng.standard_normal((E, F)), jnp.bfloat16); i = jnp.asarray(ids)
ref = None
g, nbuf, ahead = (int(x) for x in sys.argv[1:4])
M.G, M.NBUF, M.AHEAD = g, nbuf, ahead
M.sorted_segment_sum_mxu.clear_cache()
out = M.sorted_segment_sum_mxu(v, i, T); jax.block_until_ready(out)
refn = np.zeros((T, F), np.float32); np.add.at(refn, ids[:n_real], np.asarray(v, np.float32)[:n_real])
err = np.abs(np.asarray(out, np.float32)-refn).max()
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10): out = M.sorted_segment_sum_mxu(v, i, T)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter()-t0)/10*1e3)
print(f"G={g} NBUF={nbuf} AHEAD={ahead}: {best:.3f} ms ({E/(best*1e-3)/1e6:.0f}M e/s) err={err}")
