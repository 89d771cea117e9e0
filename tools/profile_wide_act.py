"""Slope-time the wide-stage anti-aliased activation formulations on TPU.

Shapes: the composed (unfolded) stages of the flagship vocoder at B=8,
200 codes — (T, C) in {(6400, 768), (12800, 384), (25600, 192)}.

Variants:
  composed              — anti_aliased_activation (current default)
  pallas_exact          — fused kernel + composed edge patching (round-1 routing)
  pallas_fast           — fused kernel, exact_edges=False (reference-CUDA edge
                          semantics; serving mode)

Methodology (docs/PERF.md): chain N dependent applications inside ONE jit,
in-graph scalar reduce, float() fetch; slope = (t(N2) - t(N1)) / (N2 - N1).

Run: timeout 580 python tools/profile_wide_act.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

N1, N2 = 4, 12


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from indextts_tpu.ops.antialias import anti_aliased_activation, anti_aliased_activation_phase
    from indextts_tpu.ops.pallas.antialias import fused_anti_alias_snake
    from indextts_tpu.ops.pallas.antialias_tmajor import fused_anti_alias_snake_tmajor

    dtype = jnp.bfloat16
    npr = np.random.default_rng(0)
    B = 8

    def chain(fn, n):
        @jax.jit
        def run(x, a, bt):
            y = x
            for _ in range(n):
                y = fn(y, a, bt)
            return jnp.sum(y.astype(jnp.float32))

        return run

    shapes = [(6400, 768), (12800, 384), (25600, 192)]
    sh = os.environ.get("SHAPES", "")
    if sh:
        want = {tuple(int(v) for v in s.split("x")) for s in sh.split(",")}
        shapes = [p for p in shapes if p in want]
    for t, c in shapes:
        x = jnp.asarray(npr.standard_normal((B, t, c)) * 0.1, dtype)
        a = jnp.asarray(npr.standard_normal((c,)) * 0.1, jnp.float32)
        bt = jnp.asarray(npr.standard_normal((c,)) * 0.1, jnp.float32)

        variants = {
            "composed": lambda y, aa, bb: anti_aliased_activation(y, aa, bb, alpha_logscale=True),
            "phase": lambda y, aa, bb: anti_aliased_activation_phase(y, aa, bb, alpha_logscale=True),
            "pallas_exact": lambda y, aa, bb: fused_anti_alias_snake(
                y, aa, bb, alpha_logscale=True, exact_edges=True
            ),
            "pallas_fast": lambda y, aa, bb: fused_anti_alias_snake(
                y, aa, bb, alpha_logscale=True, exact_edges=False
            ),
        }
        variants["tmajor_exact"] = lambda y, aa, bb: fused_anti_alias_snake_tmajor(
            y, aa, bb, alpha_logscale=True, exact_edges=True
        )
        variants["tmajor_fast"] = lambda y, aa, bb: fused_anti_alias_snake_tmajor(
            y, aa, bb, alpha_logscale=True, exact_edges=False
        )
        variants["tmajor_mxu"] = lambda y, aa, bb: fused_anti_alias_snake_tmajor(
            y, aa, bb, alpha_logscale=True, exact_edges=False, mxu=True
        )
        # poly-sin bodies (the composed path's bf16 default; the original
        # kernels always paid exact f32 jnp.sin — the decomposition probes
        # below showed the body arithmetic IS the 3.2 ms/op, not the pipeline)
        variants["tmajor_poly"] = lambda y, aa, bb: fused_anti_alias_snake_tmajor(
            y, aa, bb, alpha_logscale=True, exact_edges=False, poly_sin=True
        )
        variants["tmajor_mxu_poly"] = lambda y, aa, bb: fused_anti_alias_snake_tmajor(
            y, aa, bb, alpha_logscale=True, exact_edges=False, mxu=True, poly_sin=True
        )
        # decomposition probes: is the 3.2 ms/op tmajor cost the kernel's
        # block pipeline (PERF.md #14's conclusion) or the WRAPPER's full-
        # tensor passes (transpose, edge pad, 50-slice halo stack, output
        # slice+transpose)? wrapper = everything but the kernel; ident =
        # wrapper + full BlockSpec DMA pipeline with a passthrough body.
        variants["tmajor_wrapper"] = lambda y, aa, bb: fused_anti_alias_snake_tmajor(
            y, aa, bb, alpha_logscale=True, exact_edges=False, probe="wrapper"
        )
        variants["tmajor_ident"] = lambda y, aa, bb: fused_anti_alias_snake_tmajor(
            y, aa, bb, alpha_logscale=True, exact_edges=False, probe="ident"
        )
        if os.environ.get("PHASE_ONLY", "") == "1":
            variants = {k: v for k, v in variants.items() if k in ("composed", "phase")}
        only = os.environ.get("VARIANTS", "")
        if only:
            keep = only.split(",")
            variants = {k: v for k, v in variants.items() if k in keep}
        for name, fn in variants.items():
            try:
                times = {}
                for n in (N1, N2):
                    r = chain(fn, n)
                    float(r(x, a, bt))  # compile
                    best = 1e9
                    for _ in range(3):
                        t0 = time.perf_counter()
                        float(r(x, a, bt))
                        best = min(best, time.perf_counter() - t0)
                    times[n] = best
                slope = (times[N2] - times[N1]) / (N2 - N1) * 1000
                print(f"[{t}x{c}] {name:13s} slope {slope:7.3f} ms/op "
                      f"(t{N1}={times[N1]*1e3:.1f} t{N2}={times[N2]*1e3:.1f})", flush=True)
            except Exception as e:
                print(f"[{t}x{c}] {name:13s} FAILED: {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
