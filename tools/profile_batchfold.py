"""Batch-folded anti-alias: [8, T, C] -> [1, T, 8C] (transpose+reshape), run
the per-channel anti-aliased snake at 8C lanes, fold back. Exact for
depthwise ops (each (b, c) channel independent; alpha tiled). The trace
(tools/trace_vocoder.py) shows XLA assigns {B->sublanes, C->lanes} layouts,
so C=24 wastes 104/128 lanes on every pass; folded, lanes = 192.

Also tests a bf16-native snake (no f32 materialization of the 2T signal).

Run: timeout 580 python tools/profile_batchfold.py
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

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__}")
    npr = np.random.default_rng(0)

    def fold(x):
        b, t, c = x.shape
        return x.transpose(1, 0, 2).reshape(1, t, b * c)

    def unfold(y, b):
        _, t, bc = y.shape
        return y.reshape(t, b, bc // b).transpose(1, 0, 2)

    def aa_folded(x, alpha, beta):
        b = x.shape[0]
        xf = fold(x)
        out = anti_aliased_activation(xf, jnp.tile(alpha, b), jnp.tile(beta, b), alpha_logscale=True)
        return unfold(out, b)

    # parity
    x32 = jnp.asarray(npr.standard_normal((3, 64, 5)), jnp.float32)
    al = jnp.asarray(npr.standard_normal((5,)), jnp.float32)
    be = jnp.asarray(npr.standard_normal((5,)), jnp.float32)
    want = anti_aliased_activation(x32, al, be, alpha_logscale=True)
    got = aa_folded(x32, al, be)
    print("fold parity maxdiff:", float(jnp.abs(want - got).max()))

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
        print(f"  {name:26s}: {per_op:7.2f} ms/op")
        return per_op

    for (t, c) in [(204800, 24), (102400, 48), (51200, 96)]:
        print(f"shape T={t} C={c}:")
        x = jnp.asarray(npr.standard_normal((B, t, c)), dtype)
        alpha = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        beta = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        slope("composed [8,T,C]", lambda x: anti_aliased_activation(x, alpha, beta, alpha_logscale=True), x)
        slope("fold+aa+unfold", lambda x: aa_folded(x, alpha, beta), x)
        slope("fold roundtrip only", lambda x: unfold(fold(x), x.shape[0]), x)
        xf = fold(x)
        slope("aa on folded [1,T,8C]", lambda y: anti_aliased_activation(
            y, jnp.tile(alpha, B), jnp.tile(beta, B), alpha_logscale=True), xf)


if __name__ == "__main__":
    main()
