"""Per-op cost via slope timing: the tunneled platform adds ~30 ms of fixed
dispatch+fetch overhead to every device call, so single-op timings are
meaningless. Chain N dependent applications of the op inside ONE jit and
take (t_N - t_1)/(N-1) as the true per-op cost.

Run: timeout 580 python tools/profile_slope.py
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
    import jax.numpy as jnp

    from indextts_tpu.ops.activations import snake_beta
    from indextts_tpu.ops.antialias import anti_aliased_activation
    from indextts_tpu.ops.conv import conv1d

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__} batch={B}")
    npr = np.random.default_rng(0)

    def slope(name, op, x, bytes_per_apply):
        def chain(n):
            def f(x0):
                y = x0
                for i in range(n):
                    y = op(y) + jnp.float32(i * 1e-6).astype(x0.dtype)  # keep deps
                return y.astype(jnp.float32).sum()

            return jax.jit(f)

        f1, fn = chain(1), chain(N_HI)
        float(f1(x)); float(fn(x))  # compile
        t1s, tns = [], []
        for i in range(3):
            xi = x + jnp.float32(i * 1e-3).astype(x.dtype)
            t0 = time.perf_counter(); float(f1(xi)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(fn(xi)); tns.append(time.perf_counter() - t0)
        t1, tn = float(np.median(t1s)), float(np.median(tns))
        per_op = 1000 * (tn - t1) / (N_HI - 1)
        gbs = bytes_per_apply / ((tn - t1) / (N_HI - 1)) / 1e9
        print(f"  {name:24s}: {per_op:7.2f} ms/op  (~{gbs:5.0f} GB/s eff; t1 {1000*t1:.0f} ms)")
        return per_op

    # trivial op: pure overhead check
    tiny = jnp.ones((8, 128), dtype)
    slope("add (tiny, overhead)", lambda x: x + 1.0, tiny, 8 * 128 * 2 * 2)

    for (t, c) in [(204800, 24), (51200, 96), (12800, 384)]:
        x = jnp.asarray(npr.standard_normal((B, t, c)), dtype)
        alpha = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        beta = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        w = jnp.asarray(npr.standard_normal((3, c, c)) * 0.02, dtype)
        nbytes = B * t * c * 2
        print(f"shape T={t} C={c} ({nbytes/1e6:.0f} MB/tensor):")
        slope("snake", lambda x: snake_beta(x, alpha, beta, True), x, 2 * nbytes)
        slope("anti-alias", lambda x: anti_aliased_activation(x, alpha, beta, alpha_logscale=True), x, 6 * nbytes)
        slope("conv3 dense", lambda x: conv1d(x, w, padding="same"), x, 2 * nbytes)


if __name__ == "__main__":
    main()
