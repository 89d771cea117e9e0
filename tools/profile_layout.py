"""Layout experiment: XLA:TPU tiles the two minor dims to (sublane, lane) =
(16, 128) for bf16, so channels-last [B, T, C] arrays with C < 128 pad every
lane tile — C=24 wastes 5.3x of ALL HBM traffic in the late vocoder stages.
This measures snake / composed anti-alias / dense conv at late-stage shapes
in [B, T, C] vs [B, C, T] (time-minor) to decide whether the vocoder tail
should run transposed.

Timing is tunnel-proof (scalar reduce + fetch). Run: timeout 580 python
tools/profile_layout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

B = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from indextts_tpu.ops.activations import snake_beta
    from indextts_tpu.ops.antialias import anti_aliased_activation, kaiser_sinc_filter1d

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__} batch={B}")

    npr = np.random.default_rng(0)

    def timed(name, fn, *args, iters=3):
        jfn = jax.jit(lambda *a: fn(*a).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        float(jfn(*args))
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(iters):
            args2 = (args[0] + jnp.float32(i * 1e-3).astype(args[0].dtype),) + args[1:]
            t0 = time.perf_counter()
            float(jfn(*args2))
            times.append(time.perf_counter() - t0)
        ms = 1000 * float(np.median(times))
        print(f"  {name:26s}: {ms:8.1f} ms (compile {compile_s:.0f}s)")
        return ms

    # --- NCT (time-minor) formulations -----------------------------------
    def snake_beta_nct(x, alpha, beta):
        a = jnp.exp(alpha).astype(jnp.float32)[None, :, None]
        b_ = jnp.exp(beta).astype(jnp.float32)[None, :, None]
        xf = x.astype(jnp.float32)
        return (xf + (1.0 / (b_ + 1e-9)) * jnp.sin(xf * a) ** 2).astype(x.dtype)

    def depthwise_nct(x, filt, stride, pad):
        c = x.shape[1]
        w = jnp.asarray(filt, x.dtype)[None, None, :] * jnp.ones((c, 1, 1), x.dtype)  # [O, I/g, K]
        xp = jnp.pad(x, ((0, 0), (0, 0), pad), mode="edge")
        return lax.conv_general_dilated(
            xp, w, window_strides=(stride,), padding=((0, 0),),
            dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=c,
        )

    def anti_alias_nct(x, alpha, beta):
        filt = kaiser_sinc_filter1d(0.25, 0.3, 12)
        c = x.shape[1]
        # upsample: lhs-dilated depthwise conv (flip is a no-op: symmetric taps)
        w = jnp.asarray(filt, x.dtype)[None, None, :] * jnp.ones((c, 1, 1), x.dtype)
        xp = jnp.pad(x, ((0, 0), (0, 0), (5, 5)), mode="edge")
        up = 2.0 * lax.conv_general_dilated(
            xp, w, window_strides=(1,), padding=((11, 11),), lhs_dilation=(2,),
            dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=c,
        )
        up = up[:, :, 15 : 15 + 2 * x.shape[2]]
        s = snake_beta_nct(up, alpha, beta)
        return depthwise_nct(s, filt, 2, (5, 6))

    def conv_dense_nct(x, w_oik):
        return lax.conv_general_dilated(
            x, w_oik, window_strides=(1,), padding="SAME",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )

    from indextts_tpu.ops.conv import conv1d

    for (t, c) in [(204800, 24), (102400, 48), (51200, 96)]:
        print(f"shape T={t} C={c}:")
        x_tc = jnp.asarray(npr.standard_normal((B, t, c)), dtype)
        x_ct = jnp.asarray(np.ascontiguousarray(np.asarray(x_tc).transpose(0, 2, 1)), dtype)
        alpha = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        beta = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        w_tc = jnp.asarray(npr.standard_normal((3, c, c)) * 0.05, dtype)   # [K, I, O]
        w_ct = jnp.asarray(np.asarray(w_tc).transpose(2, 1, 0), dtype)      # [O, I, K]

        timed("snake [B,T,C]", lambda x: snake_beta(x, alpha, beta, True), x_tc)
        timed("snake [B,C,T]", lambda x: snake_beta_nct(x, alpha, beta), x_ct)
        timed("anti-alias [B,T,C]", lambda x: anti_aliased_activation(x, alpha, beta, True), x_tc)
        timed("anti-alias [B,C,T]", lambda x: anti_alias_nct(x, alpha, beta), x_ct)
        timed("conv3 dense [B,T,C]", lambda x: conv1d(x, w_tc, padding="same"), x_tc)
        timed("conv3 dense [B,C,T]", lambda x: conv_dense_nct(x, w_ct), x_ct)


if __name__ == "__main__":
    main()
