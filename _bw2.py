import time, numpy as np, jax, jax.numpy as jnp
from salient_plusplus_tpu.ops.mxu_segment import sorted_segment_sum_mxu

def chain_time(step, state0, iters):
    # warmup chain
    s = state0
    for _ in range(5): s = step(s)
    _ = float(jnp.asarray(s[1] if isinstance(s, tuple) else s).ravel()[0])
    out = []
    for K in (iters, 2*iters):
        s = state0
        t0 = time.perf_counter()
        for _ in range(K): s = step(s)
        _ = float(jnp.asarray(s[1] if isinstance(s, tuple) else s).ravel()[0])
        out.append(time.perf_counter() - t0)
    per = (out[1] - out[0]) / iters  # slope removes fixed read cost
    return per

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((656*1024, 128)), jnp.bfloat16)
f = jax.jit(lambda x: x + 1)
per = chain_time(f, x, 20)
print(f"elementwise: {per*1e3:.3f} ms -> {2*168e6/per/1e9:.0f} GB/s")

a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
g = jax.jit(lambda a: (a @ a) * 1e-3)
per = chain_time(g, a, 20)
print(f"4096^3 bf16: {per*1e3:.3f} ms -> {2*4096**3/per/1e12:.1f} TFLOP/s")

E, F, T = 655360, 128, 147456
n_real = int(E*0.92)
ids = np.sort(rng.integers(0, T, n_real)).astype(np.int32)
ids = np.concatenate([ids, np.full(E-n_real, T, np.int32)])
v = jnp.asarray(rng.standard_normal((E, F)), jnp.bfloat16)
i0 = jnp.asarray(ids)

@jax.jit
def kstep(st):
    i, out, vv = st
    out = sorted_segment_sum_mxu(vv, i, T)
    i = i + (out[0, 0] * 0).astype(jnp.int32)   # chain dependency
    return (i, out, vv)
per = chain_time(kstep, (i0, jnp.zeros((T, F)), v), 20)
print(f"mxu kernel: {per*1e3:.3f} ms ({E/per/1e6:.0f}M e/s)")

@jax.jit
def sstep(st):
    i, out, vv = st
    out = jax.ops.segment_sum(vv, i, num_segments=T+1, indices_are_sorted=True)[:T]
    i = i + (out[0, 0] * 0).astype(jnp.int32)
    return (i, out, vv)
per = chain_time(sstep, (i0, jnp.zeros((T+0, F), jnp.bfloat16), v), 8)
print(f"xla segment_sum: {per*1e3:.3f} ms ({E/per/1e6:.0f}M e/s)")

tbl = jnp.asarray(rng.standard_normal((1048576, 128)), jnp.bfloat16)
gi0 = jnp.asarray(rng.integers(0, 1048576, 458752).astype(np.int32))
@jax.jit
def gstep(st):
    i, out, tt = st
    out = jnp.take(tt, i, axis=0)
    i = i + (out[0, 0] * 0).astype(jnp.int32)
    return (i, out, tt)
per = chain_time(gstep, (gi0, jnp.zeros((458752, F), jnp.bfloat16), tbl), 8)
print(f"xla gather 448k: {per*1e3:.3f} ms ({per/458752*1e9:.1f} ns/row)")
