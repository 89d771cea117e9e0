"""Slope-time the wide-stage polyphase shift-add anti-aliased activation vs
the composed grouped-conv path (C >= 128 lanes, where the round-2 narrow-lane
polyphase negative result doesn't apply).

Run: timeout 580 python tools/profile_polyphase_wide.py
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
        anti_aliased_activation,
        anti_aliased_activation_polyphase,
    )

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

    for t, c in [(25600, 192), (12800, 384), (3200, 768)]:
        x = jnp.asarray(npr.standard_normal((B, t, c)), dtype)
        alpha = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        beta = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        print(f"shape T={t} C={c}:")
        slope("composed grouped", lambda x: anti_aliased_activation(x, alpha, beta, alpha_logscale=True), x)
        slope("polyphase wide", lambda x: anti_aliased_activation_polyphase(x, alpha, beta, alpha_logscale=True), x)


if __name__ == "__main__":
    main()
