"""Slope-time fused_folded_aa (Pallas) vs the XLA folded activation path at
the vocoder's real folded shapes ([B=8, N=25600, L=192] for s=2/4/8).

Timing per CLAUDE.md: chain N dependent applications in one jit, reduce to a
scalar in-graph, fetch with float(); per-op cost = (t_N - t_1)/(N-1).

Run: timeout 580 python tools/profile_fused_folded.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

B = 8
N_HI = 9


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from indextts_tpu.ops.antialias import (
        downsample1d_folded,
        snake_folded,
        upsample1d_folded,
    )
    from indextts_tpu.ops.pallas.antialias_folded import fused_folded_aa

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__}")
    npr = np.random.default_rng(0)

    def slope(name, op, x, iters=3):
        def chain(n):
            def fn(x0):
                y = x0
                for i in range(n):
                    y = op(y) + jnp.float32(i * 1e-6).astype(x0.dtype)
                return y.astype(jnp.float32).sum()

            return jax.jit(fn)

        f1, fn_ = chain(1), chain(N_HI)
        float(f1(x)); float(fn_(x))
        t1s, tns = [], []
        for i in range(iters):
            xi = x + jnp.float32(i * 1e-3).astype(x.dtype)
            t0 = time.perf_counter(); float(f1(xi)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(fn_(xi)); tns.append(time.perf_counter() - t0)
        per_op = 1000 * (float(np.median(tns)) - float(np.median(t1s))) / (N_HI - 1)
        print(f"  {name:20s}: {per_op:7.2f} ms/op")
        return per_op

    for s, c in [(8, 24), (4, 48), (2, 96)]:
        n, l = 25600, s * c
        x = jnp.asarray(npr.standard_normal((B, n, l)), dtype)
        alpha = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        beta = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        print(f"folded shape N={n} L={l} (s={s} C={c}):")

        def xla_op(xf, s=s, c=c, alpha=alpha, beta=beta):
            y = upsample1d_folded(xf, s, c)
            y = snake_folded(y, alpha, beta, True, 2 * s)
            return downsample1d_folded(y, s, c)

        def pal_op(xf, s=s, c=c, alpha=alpha, beta=beta):
            return fused_folded_aa(xf, alpha, beta, True, s, c)

        slope("xla folded", xla_op, x)
        slope("pallas fused", pal_op, x)


if __name__ == "__main__":
    main()
