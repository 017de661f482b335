"""Diagnose the scatter-free GAT backward's on-chip cost (round-5).

The r5 GAT bench measured 333 ms/step microstep — ~10x the r4 autodiff
path (~35 ms/step implied by 18.4M e/s) — with a healthy gather probe,
reproducible across three rested campaigns. This times the pieces at
bench-like per-hop shapes to find which op class regressed. Chained
timing (each iter consumes the previous output) per PERF_NOTES
"measurement trap": the tunnel caches identical executions.

Run on the real chip:  python -m experiments.gat_bwd_diag
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, x0, iters=6, warm=2):
    """Slope-timed dependency chain: fn must map x -> x-like."""
    def run(n, x):
        for _ in range(n):
            x = fn(x)
        jax.block_until_ready(x)
        return x

    t = {}
    x = run(warm, x0)
    for n in (2, iters):
        t0 = time.perf_counter()
        x = run(n, x)
        t[n] = time.perf_counter() - t0
    return (t[iters] - t[2]) / (iters - 2)


def main():
    rng = np.random.default_rng(0)
    H, C = 1, 256

    # bench GAT hop shapes (3-layer [15,10,5], batch 1024, calibrated
    # caps ballpark): outer hop has a HUGE input frontier
    hops = [
        ("outer", 560_000, 66_000, 660_000),   # N_in, T, E
        ("mid", 66_000, 12_000, 120_000),
        ("inner", 12_000, 1_024, 15_000),
    ]
    for name, N, T, E in hops:
        src = np.sort(rng.integers(0, N, E)).astype(np.int32)
        dst = np.sort(rng.integers(0, T, E)).astype(np.int32)
        msrc = src  # sorted by construction; mirror of some edge set
        mdst = rng.integers(0, T, E).astype(np.int32)
        xs = jnp.asarray(rng.standard_normal((N, H, C)), jnp.bfloat16)
        xt = jnp.asarray(rng.standard_normal((T, H, C)), jnp.bfloat16)
        a_s = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
        a_d = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        args = tuple(map(jnp.asarray, (src, dst, msrc, mdst)))

        from salient_plusplus_tpu.ops import mxu_segment
        from salient_plusplus_tpu.ops.gat_agg import gat_attention_agg

        # 1. MXU segsum alone at this hop's BACKWARD shape (segments =
        # the big input frontier N)
        W = H * C
        msg = jnp.asarray(rng.standard_normal((E, W)), jnp.bfloat16)

        @jax.jit
        def seg_bwd(m):
            o = mxu_segment.sorted_segment_sum_mxu(m, args[2], N)
            return m + o[:1, :] * 0  # keep chain dependency, same shape

        t_seg = chain_time(seg_bwd, msg)

        # 2. full custom-VJP fwd+bwd
        @jax.jit
        def fwd_bwd(x):
            def loss(xs_, xt_, as_, ad_):
                return gat_attention_agg(
                    T, 0.2, xs_, xt_, as_, ad_, args[0], args[1],
                    jnp.int32(E), args[2], args[3]
                ).astype(jnp.float32).sum()
            g = jax.grad(loss, argnums=(0, 1, 2, 3))(x, xt, a_s, a_d)
            return x + g[0]

        t_full = chain_time(fwd_bwd, xs)

        # 3. fwd only
        @jax.jit
        def fwd_only(x):
            o = gat_attention_agg(T, 0.2, x, xt, a_s, a_d, args[0],
                                  args[1], jnp.int32(E), args[2], args[3])
            return x.at[:T].add(o.astype(x.dtype))

        t_fwd = chain_time(fwd_only, xs)

        print(f"{name}: N={N} T={T} E={E}  "
              f"segsum_bwd(N-targets)={t_seg * 1e3:.1f}ms  "
              f"fwd={t_fwd * 1e3:.1f}ms  fwd+bwd={t_full * 1e3:.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()


def autodiff_ab():
    """A/B: the pre-r4 autodiff formulation (segment_softmax_self +
    sorted MXU segsum forward, XLA-autodiffed backward) at the same
    shapes — the path the 18.4M r4 GAT bench actually ran."""
    rng = np.random.default_rng(0)
    H, C = 1, 256
    from salient_plusplus_tpu.ops import mxu_segment
    from salient_plusplus_tpu.ops.segment import segment_softmax_self

    for name, N, T, E in [("outer", 560_000, 66_000, 660_000),
                          ("mid", 66_000, 12_000, 120_000)]:
        src = np.sort(rng.integers(0, N, E)).astype(np.int32)
        dst = np.sort(rng.integers(0, T, E)).astype(np.int32)
        xs = jnp.asarray(rng.standard_normal((N, H, C)), jnp.bfloat16)
        xt = jnp.asarray(rng.standard_normal((T, H, C)), jnp.bfloat16)
        a_s = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
        a_d = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        srcj, dstj = jnp.asarray(src), jnp.asarray(dst)

        def agg(xs_, xt_, as_, ad_):
            logits = jnp.take(as_, srcj, axis=0) + jnp.take(
                ad_, jnp.minimum(dstj, T - 1), axis=0)
            logits = jnp.where(logits > 0, logits, 0.2 * logits)
            zself = as_[:T] + ad_
            zself = jnp.where(zself > 0, zself, 0.2 * zself)
            att, self_att = segment_softmax_self(
                logits, dstj, jnp.int32(E), T, zself, sorted_dst=True)
            msg = jnp.take(xs_.reshape(N, H * C), srcj, axis=0)
            msg = msg * att.astype(xs_.dtype)
            out = mxu_segment.sorted_segment_sum(T, msg, dstj)
            out = out.reshape(T, H, C) + self_att[:, :, None] * \
                xt_.astype(jnp.float32)
            return out

        @jax.jit
        def fwd_only(x):
            return x.at[:T].add(agg(x, xt, a_s, a_d).astype(x.dtype))

        @jax.jit
        def fwd_bwd(x):
            def loss(xs_, xt_, as_, ad_):
                return agg(xs_, xt_, as_, ad_).sum()
            g = jax.grad(loss, argnums=(0, 1, 2, 3))(x, xt, a_s, a_d)
            return x + g[0]

        t_fwd = chain_time(fwd_only, xs)
        t_full = chain_time(fwd_bwd, xs)
        print(f"autodiff {name}: fwd={t_fwd * 1e3:.1f}ms  "
              f"fwd+bwd={t_full * 1e3:.1f}ms", flush=True)


if __name__ == "__main__" and __import__("os").environ.get("AB"):
    autodiff_ab()
