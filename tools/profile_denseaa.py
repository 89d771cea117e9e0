"""Anti-alias resampling via DIAGONAL DENSE convs: grouped depthwise convs
lower terribly on XLA:TPU (12.6 ms/op at the last stage) while dense convs of
the same shapes run near speed-of-light (conv3 dense: 0.44 ms). A depthwise
filter identical across channels equals a dense conv with kernel
W[k, i, o] = f[k] * (i == o) — C-times more FLOPs, but the MXU is idle here.

Checks parity vs the composed grouped path, then slope-times both.

Run: timeout 580 python tools/profile_denseaa.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

B = 8
N_HI = 9


def make_dense_aa():
    import jax.numpy as jnp

    from indextts_tpu.ops.activations import snake_beta
    from indextts_tpu.ops.antialias import kaiser_sinc_filter1d
    from indextts_tpu.ops.conv import conv1d, conv_transpose1d, pad1d

    def dense_aa(x, alpha, beta):
        """anti_aliased_activation with diagonal dense kernels (ratio 2, K 12)."""
        filt = kaiser_sinc_filter1d(0.25, 0.3, 12)
        c = x.shape[-1]
        eye = jnp.eye(c, dtype=x.dtype)
        w = jnp.asarray(filt, x.dtype)[:, None, None] * eye[None]  # [K, C, C]
        # upsample (upsample1d semantics: pad 5 replicate, convT stride2, crop 15/15)
        xp = pad1d(x, (5, 5), mode="replicate")
        y = 2.0 * conv_transpose1d(xp, w, stride=2, padding=0)
        y = y[:, 15 : y.shape[1] - 15, :]
        y = snake_beta(y, alpha, beta, True)
        # downsample (pad 5/6 replicate, conv stride 2)
        yp = pad1d(y, (5, 6), mode="replicate")
        return conv1d(yp, w, stride=2, padding=0)

    return dense_aa


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.ops.antialias import anti_aliased_activation

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__}")
    npr = np.random.default_rng(0)
    dense_aa = make_dense_aa()

    # parity (fp32)
    x32 = jnp.asarray(npr.standard_normal((2, 64, 5)), jnp.float32)
    al = jnp.asarray(npr.standard_normal((5,)), jnp.float32)
    be = jnp.asarray(npr.standard_normal((5,)), jnp.float32)
    want = anti_aliased_activation(x32, al, be, alpha_logscale=True)
    got = dense_aa(x32, al, be)
    print("parity maxdiff:", float(jnp.abs(want - got).max()))

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

    for (t, c) in [(204800, 24), (102400, 48), (51200, 96), (25600, 192), (12800, 384), (3200, 768)]:
        x = jnp.asarray(npr.standard_normal((B, t, c)), dtype)
        alpha = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        beta = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        print(f"shape T={t} C={c}:")
        slope("composed grouped", lambda x: anti_aliased_activation(x, alpha, beta, alpha_logscale=True), x)
        slope("dense diagonal", lambda x: dense_aa(x, alpha, beta), x)


if __name__ == "__main__":
    main()
