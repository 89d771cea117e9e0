"""Layout comparison with SLOPE timing (profile_layout.py was invalidated by
the ~32 ms per-dispatch overhead). [B, C, T] arrays only sublane-pad C
(24 -> 32 for bf16), vs lane-padding to 128 in [B, T, C] — potentially ~4x
less HBM traffic for the narrow vocoder tail.

Run: timeout 580 python tools/profile_layout2.py
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
    from jax import lax

    from indextts_tpu.ops.activations import snake_beta
    from indextts_tpu.ops.antialias import anti_aliased_activation, kaiser_sinc_filter1d
    from indextts_tpu.ops.conv import conv1d

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__}")
    npr = np.random.default_rng(0)

    def snake_beta_nct(x, alpha, beta):
        a = jnp.exp(alpha).astype(jnp.float32)[None, :, None]
        b_ = jnp.exp(beta).astype(jnp.float32)[None, :, None]
        xf = x.astype(jnp.float32)
        return (xf + (1.0 / (b_ + 1e-9)) * jnp.sin(xf * a) ** 2).astype(x.dtype)

    def anti_alias_nct(x, alpha, beta):
        filt = kaiser_sinc_filter1d(0.25, 0.3, 12)
        c = x.shape[1]
        w = jnp.asarray(filt, x.dtype)[None, None, :] * jnp.ones((c, 1, 1), x.dtype)
        xp = jnp.pad(x, ((0, 0), (0, 0), (5, 5)), mode="edge")
        up = 2.0 * lax.conv_general_dilated(
            xp, w, (1,), ((11, 11),), lhs_dilation=(2,),
            dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=c)
        up = up[:, :, 15 : 15 + 2 * x.shape[2]]
        s = snake_beta_nct(up, alpha, beta)
        xp2 = jnp.pad(s, ((0, 0), (0, 0), (5, 6)), mode="edge")
        return lax.conv_general_dilated(
            xp2, w, (2,), ((0, 0),),
            dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=c)

    def conv_dense_nct(x, w_oik):
        return lax.conv_general_dilated(
            x, w_oik, (1,), "SAME", dimension_numbers=("NCH", "OIH", "NCH"))

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
        print(f"  {name:24s}: {per_op:7.2f} ms/op")
        return per_op

    for (t, c) in [(204800, 24), (102400, 48)]:
        print(f"shape T={t} C={c}:")
        x_tc = jnp.asarray(npr.standard_normal((B, t, c)), dtype)
        x_ct = jnp.asarray(np.ascontiguousarray(np.asarray(x_tc, np.float32).transpose(0, 2, 1)), dtype)
        alpha = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        beta = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        w_tc = jnp.asarray(npr.standard_normal((3, c, c)) * 0.05, dtype)
        w_ct = jnp.asarray(np.asarray(w_tc, np.float32).transpose(2, 1, 0), dtype)

        slope("snake NTC", lambda x: snake_beta(x, alpha, beta, True), x_tc)
        slope("snake NCT", lambda x: snake_beta_nct(x, alpha, beta), x_ct)
        slope("anti-alias NTC", lambda x: anti_aliased_activation(x, alpha, beta, alpha_logscale=True), x_tc)
        slope("anti-alias NCT", lambda x: anti_alias_nct(x, alpha, beta), x_ct)
        slope("conv3 NTC", lambda x: conv1d(x, w_tc, padding="same"), x_tc)
        slope("conv3 NCT", lambda x: conv_dense_nct(x, w_ct), x_ct)
        # transpose cost both ways (needed at tail entry/exit)
        slope("transpose NTC->NCT", lambda x: x.transpose(0, 2, 1), x_tc)


if __name__ == "__main__":
    main()
