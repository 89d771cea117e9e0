"""Decompose one anti-alias site at the worst stage shape and test a
bf16-accuracy polynomial sin.

The snake nonlinearity runs at 2x rate; XLA's f32 sin costs ~30-40 VPU ops.
In bf16 output (~2-3 significant digits) a range-reduced odd minimax
polynomial (~10 ops) is below quantization error. Measures: up-only,
down-only, snake(2T) with jnp.sin vs poly-sin, full composed vs composed
with poly-sin.

Run: timeout 580 python tools/profile_sin.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

B = 8
N_HI = 9
TWO_PI = 2.0 * np.pi


def poly_sin(u):
    """sin via range reduction to [-pi, pi] + degree-7 odd minimax poly.
    Max abs error ~6e-5 — far below bf16 resolution (~4e-3 relative)."""
    import jax.numpy as jnp

    k = jnp.round(u * (1.0 / TWO_PI))
    r = u - k * TWO_PI  # r in [-pi, pi]
    r2 = r * r
    # minimax coefficients for sin on [-pi, pi] (degree 7)
    return r * (0.9999966 + r2 * (-0.16664824 + r2 * (8.30632e-3 + r2 * (-1.83627e-4))))


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.ops.activations import snake_beta
    from indextts_tpu.ops.antialias import anti_aliased_activation, downsample1d, upsample1d

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__}")
    npr = np.random.default_rng(0)

    # accuracy check of poly_sin
    u = jnp.asarray(np.linspace(-50, 50, 100001), jnp.float32)
    err = float(jnp.abs(jnp.sin(u) - poly_sin(u)).max())
    print(f"poly_sin max abs err on [-50, 50]: {err:.2e} (bf16 eps ~ 3.9e-3)")

    def snake_poly(x, alpha, beta):
        a = jnp.exp(alpha).astype(jnp.float32)
        b_ = jnp.exp(beta).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        s = poly_sin(xf * a)
        return (xf + (1.0 / (b_ + 1e-9)) * s * s).astype(x.dtype)

    def aa_poly(x, alpha, beta):
        y = upsample1d(x, 2, 12)
        y = snake_poly(y, alpha, beta)
        return downsample1d(y, 2, 12)

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

    for (t, c) in [(204800, 24), (102400, 48)]:
        print(f"shape T={t} C={c}:")
        x = jnp.asarray(npr.standard_normal((B, t, c)), dtype)
        x2 = jnp.asarray(npr.standard_normal((B, 2 * t, c)), dtype)
        alpha = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        beta = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        # shape-restoring wrappers so the op can be chained (slice/tile keep
        # the data dependency and force the full computation)
        slope("upsample only", lambda x: upsample1d(x, 2, 12)[:, : x.shape[1]], x)
        slope("downsample only", lambda x: jnp.tile(downsample1d(x, 2, 12), (1, 2, 1)), x2)
        slope("snake(2T) jnp.sin", lambda x: snake_beta(x, alpha, beta, True), x2)
        slope("snake(2T) poly-sin", lambda x: snake_poly(x, alpha, beta), x2)
        slope("anti-alias composed", lambda x: anti_aliased_activation(x, alpha, beta, alpha_logscale=True), x)
        slope("anti-alias poly-sin", lambda x: aa_poly(x, alpha, beta), x)


if __name__ == "__main__":
    main()
