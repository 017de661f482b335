import time, numpy as np, jax, jax.numpy as jnp
from salient_plusplus_tpu.ops.mxu_segment import sorted_segment_sum_mxu

def timeit(fn, args_list, iters=12):
    for a in args_list[:2]: jax.block_until_ready(fn(*a))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for k in range(iters): r = fn(*args_list[k % len(args_list)])
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter()-t0)/iters)
    return best

rng = np.random.default_rng(0)
# bandwidth
xs = [jnp.asarray(rng.standard_normal((656*1024, 128)), jnp.bfloat16) for _ in range(4)]
f = jax.jit(lambda x: x + 1)
dt = timeit(f, [(x,) for x in xs])
print(f"elementwise: {dt*1e3:.3f} ms -> {2*168e6/dt/1e9:.0f} GB/s")
# matmul
ams = [jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16) for _ in range(4)]
g = jax.jit(lambda a: a @ a)
dt = timeit(g, [(a,) for a in ams])
print(f"4096^3 bf16: {dt*1e3:.3f} ms -> {2*4096**3/dt/1e12:.1f} TFLOP/s")
# kernel with varying inputs
E, F, T = 655360, 128, 147456
pairs = []
for s in range(4):
    r2 = np.random.default_rng(s)
    n_real = int(E*0.92)
    ids = np.sort(r2.integers(0, T, n_real)).astype(np.int32)
    ids = np.concatenate([ids, np.full(E-n_real, T, np.int32)])
    pairs.append((jnp.asarray(r2.standard_normal((E, F)), jnp.bfloat16), jnp.asarray(ids)))
dt = timeit(lambda v,i: sorted_segment_sum_mxu(v, i, T), pairs)
print(f"mxu kernel: {dt*1e3:.3f} ms ({E/dt/1e6:.0f}M e/s)")
# XLA scatter-add segment_sum (jitted once)
seg = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=T+1, indices_are_sorted=True)[:T])
dt = timeit(seg, pairs)
print(f"xla segment_sum: {dt*1e3:.3f} ms ({E/dt/1e6:.0f}M e/s)")
# XLA gather at same scale
tbl = jnp.asarray(rng.standard_normal((1048576, 128)), jnp.bfloat16)
idxs = [jnp.asarray(np.random.default_rng(s).integers(0, 1048576, 458752).astype(np.int32)) for s in range(4)]
gat = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
dt = timeit(gat, [(tbl, i) for i in idxs])
print(f"xla gather 448k rows: {dt*1e3:.3f} ms ({458752/dt/1e6:.0f}M rows/s, {dt/458752*1e9:.1f} ns/row)")
