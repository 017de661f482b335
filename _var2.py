import sys, time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import os
TT, G, NBUF, AHEAD = int(os.environ.get("TT","128")), 512, 6, 4

def make_k(variant):
  def _k(tile_ptr_ref, ids_hbm, vals_hbm, out_ref, ids_buf, vals_buf, state, sems):
    t = pl.program_id(0); nt = pl.num_programs(0)
    e0 = tile_ptr_ref[t]; e1 = tile_ptr_ref[t + 1]
    c0 = jax.lax.div(e0, G)
    nchunks = jax.lax.div(e1 + (G - 1), G) - c0
    last_chunk = jax.lax.div(tile_ptr_ref[nt] + (G - 1), G) - 1
    def copies(c, slot):
        sc8 = pl.multiple_of((c // 8) * 8, 8)
        return (pltpu.make_async_copy(ids_hbm.at[pl.ds(sc8, 8), :], ids_buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(vals_hbm.at[pl.ds(pl.multiple_of(c * G, G), G), :], vals_buf.at[slot], sems.at[slot, 1]))
    @pl.when(t == 0)
    def _():
        state[0] = 0; state[1] = 0
        if variant == "cond_issue":
            def body(p):
                for cp in copies(p, jax.lax.rem(p, NBUF)): cp.start()
                return p + 1
            state[0] = jax.lax.while_loop(lambda p: p <= jnp.minimum(AHEAD - 1, last_chunk), body, 0)
    out_ref[...] = jnp.zeros_like(out_ref)
    base = t * TT
    def body(i, carry):
        c = c0 + i
        slot = jax.lax.rem(c, NBUF)
        if variant in ("cond_issue", "arith_onehot"):
            x = jnp.minimum(c + AHEAD, last_chunk)
            @pl.when(state[0] <= x)
            def _():
                p = state[0]
                for cp in copies(p, jax.lax.rem(p, NBUF)): cp.start()
                state[0] = p + 1
            @pl.when(state[1] <= c)
            def _():
                for cp in copies(c, slot): cp.wait()
                state[1] = c + 1
        # variant "no_dma": no DMA machinery at all
        if variant == "arith_onehot":
            row = jax.lax.rem(c, 8)
            rowmask = (jax.lax.broadcasted_iota(jnp.int32, (8, G), 0) == row)
            ids_row = jnp.sum(ids_buf[slot] * rowmask.astype(jnp.int32), axis=0, keepdims=True)
            local_f = (ids_row - base).astype(vals_buf.dtype)        # [1, G]
            iota_col = jax.lax.broadcasted_iota(
                jnp.int32, (TT, 1), 0).astype(vals_buf.dtype)        # [TT, 1]
            d = iota_col - local_f                                   # [TT, G] bf16
            onehot = jnp.maximum(1.0 - jnp.abs(d), 0.0)
            out_ref[...] += jax.lax.dot_general(onehot, vals_buf[slot],
                dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        else:
            row = jax.lax.rem(c, 8)
            rowmask = (jax.lax.broadcasted_iota(jnp.int32, (8, G), 0) == row)
            ids_row = jnp.sum(ids_buf[slot] * rowmask.astype(jnp.int32), axis=0, keepdims=True)
            local = ids_row - base
            sel = jax.lax.broadcasted_iota(jnp.int32, (TT, G), 0) == local
            onehot = sel.astype(vals_buf.dtype)
            out_ref[...] += jax.lax.dot_general(onehot, vals_buf[slot],
                dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return carry
    jax.lax.fori_loop(0, nchunks, body, 0)
  return _k

@functools.partial(jax.jit, static_argnames=("num_segments", "variant"))
def run(vals, ids, num_segments, variant):
    E, F = vals.shape
    nt = num_segments // TT
    bounds = jax.lax.broadcasted_iota(jnp.int32, (nt + 1,), 0) * TT
    tile_ptr = jnp.searchsorted(ids, bounds, side="left").astype(jnp.int32)
    ids2d = jnp.pad(ids.reshape(E // G, G), ((0, 7), (0, 0)))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
        out_specs=pl.BlockSpec((TT, F), lambda t, ptr: (t, 0)),
        scratch_shapes=[pltpu.VMEM((NBUF, 8, G), jnp.int32), pltpu.VMEM((NBUF, G, F), vals.dtype),
                        pltpu.SMEM((2,), jnp.int32), pltpu.SemaphoreType.DMA((NBUF, 2))])
    return pl.pallas_call(make_k(variant), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((num_segments, F), jnp.float32))(tile_ptr, ids2d, vals)

rng = np.random.default_rng(0)
E, F, T = 655360, 128, 147456
n_real = int(E*0.92)
ids = np.sort(rng.integers(0, T, n_real)).astype(np.int32)
ids = np.concatenate([ids, np.full(E-n_real, T, np.int32)])
v = jnp.asarray(rng.standard_normal((E, F)), jnp.bfloat16); i = jnp.asarray(ids)
refn = np.zeros((T, F), np.float32); np.add.at(refn, ids[:n_real], np.asarray(v, np.float32)[:n_real])
for variant in sys.argv[1:]:
    out = run(v, i, T, variant); jax.block_until_ready(out)
    err = np.abs(np.asarray(out, np.float32)-refn).max() if variant in ("cond_issue", "arith_onehot") else -1
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10): out = run(v, i, T, variant)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter()-t0)/10*1e3)
    print(f"{variant}: {best:.3f} ms ({E/(best*1e-3)/1e6:.0f}M e/s) err={err}")
