"""Prototype: anti-aliased snake activation computed in a folded layout
[B, T/F, F*C] so narrow-channel stages (C=24/48/96) stop paying the
(16,128)-tile lane-padding tax. All time shifts become static lane slices of
a 3-row concat; no grouped convs.

Compares per-op slope cost vs the composed grouped-conv path at the late
BigVGAN stage shapes, and checks numerical equality (interior; the 6-frame
edges are patched from the composed oracle).

Run: timeout 580 python tools/profile_folded.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

B = 8
N_HI = 9


def make_folded(F=8):
    import jax.numpy as jnp

    from indextts_tpu.ops.antialias import anti_aliased_activation, kaiser_sinc_filter1d

    f = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float32)

    def folded(x, alpha, beta):
        """x: [B, T, C] with T % F == 0. Equals anti_aliased_activation
        (alpha_logscale=True) except within ~6 frames of each end (patched)."""
        b, t, c = x.shape
        r = t // F
        fc = F * c
        a = jnp.exp(alpha).astype(jnp.float32)
        bt = jnp.exp(beta).astype(jnp.float32)
        a_f = jnp.tile(a, F)[None, None, :]
        inv_b_f = (1.0 / (bt + 1e-9))
        inv_b_f = jnp.tile(inv_b_f, F)[None, None, :]

        xf = x.reshape(b, r, fc)
        # 3-row neighborhood: row r-1 | r | r+1 (edge rows replicated; exact
        # edge semantics patched below)
        top = jnp.concatenate([xf[:, :1], xf[:, :-1]], axis=1)
        bot = jnp.concatenate([xf[:, 1:], xf[:, -1:]], axis=1)
        cat = jnp.concatenate([top, xf, bot], axis=2)  # [B, R, 3FC]

        def sl(delta):
            # all frames t+delta for t in a row: lanes [FC + delta*C, ... +FC)
            return jax.lax.dynamic_slice_in_dim(cat, fc + delta * c, fc, axis=2)

        # upsample polyphase in input-relative shifts (derived from the
        # convT index algebra validated against _upsample1d_grouped):
        #   y[2u]   = 2 * sum_{delta=-3..2} x[u+delta] * f[5-2*delta]
        #   y[2u+1] = 2 * sum_{delta=-2..3} x[u+delta] * f[6-2*delta]
        ue = None
        uo = None
        for delta in range(-3, 4):
            s = sl(delta).astype(jnp.float32)
            if -3 <= delta <= 2:
                te = (2.0 * float(f[5 - 2 * delta])) * s
                ue = te if ue is None else ue + te
            if -2 <= delta <= 3:
                to = (2.0 * float(f[6 - 2 * delta])) * s
                uo = to if uo is None else uo + to

        se = ue + inv_b_f * jnp.sin(ue * a_f) ** 2
        so = uo + inv_b_f * jnp.sin(uo * a_f) ** 2

        # downsample: y[t] = sum_j f[2j+1]*se[t+j-?] + f[2j]*so[t+j-?]
        # shifts of se/so (folded) need their own 3-row cats
        cat_e = jnp.concatenate(
            [jnp.concatenate([se[:, :1], se[:, :-1]], axis=1), se,
             jnp.concatenate([se[:, 1:], se[:, -1:]], axis=1)], axis=2)
        cat_o = jnp.concatenate(
            [jnp.concatenate([so[:, :1], so[:, :-1]], axis=1), so,
             jnp.concatenate([so[:, 1:], so[:, -1:]], axis=1)], axis=2)

        def sle(cc, delta):
            return jax.lax.dynamic_slice_in_dim(cc, fc + delta * c, fc, axis=2)

        # downsample on the phase signals (q[2m]=ue[m], q[2m+1]=uo[m], pad 5/6):
        #   y[t] = sum_{delta=-2..3} f[2*delta+5] * se[t+delta]
        #        + sum_{delta=-3..2} f[2*delta+6] * so[t+delta]
        y = None
        for delta in range(-3, 4):
            if -2 <= delta <= 3:
                term = float(f[2 * delta + 5]) * sle(cat_e, delta)
                y = term if y is None else y + term
            if -3 <= delta <= 2:
                term = float(f[2 * delta + 6]) * sle(cat_o, delta)
                y = term if y is None else y + term
        out = y.astype(x.dtype).reshape(b, t, c)

        # patch edges from the composed oracle (boundary replicate semantics)
        edge = min(2 * F, t)
        win = min(4 * F, t)
        head = anti_aliased_activation(x[:, :win], alpha, beta, alpha_logscale=True)
        tail = anti_aliased_activation(x[:, -win:], alpha, beta, alpha_logscale=True)
        out = out.at[:, :edge].set(head[:, :edge])
        out = out.at[:, -edge:].set(tail[:, -edge:])
        return out

    import jax

    return folded


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.ops.antialias import anti_aliased_activation

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__}")
    npr = np.random.default_rng(0)
    folded = make_folded()

    # numerical check (fp32, CPU-safe)
    x32 = jnp.asarray(npr.standard_normal((2, 64, 4)), jnp.float32)
    al = jnp.asarray(npr.standard_normal((4,)), jnp.float32)
    be = jnp.asarray(npr.standard_normal((4,)), jnp.float32)
    want = anti_aliased_activation(x32, al, be, alpha_logscale=True)
    got = folded(x32, al, be)
    diff = float(jnp.abs(want - got).max())
    print(f"parity maxdiff (fp32, incl. patched edges): {diff:.2e}")

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
        print(f"  {name:22s}: {per_op:7.2f} ms/op")
        return per_op

    for (t, c) in [(204800, 24), (102400, 48), (51200, 96)]:
        x = jnp.asarray(npr.standard_normal((B, t, c)), dtype)
        alpha = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        beta = jnp.asarray(npr.standard_normal((c,)), jnp.float32)
        print(f"shape T={t} C={c}:")
        slope("anti-alias composed", lambda x: anti_aliased_activation(x, alpha, beta, alpha_logscale=True), x)
        slope("anti-alias folded", lambda x: folded(x, alpha, beta), x)


if __name__ == "__main__":
    main()
