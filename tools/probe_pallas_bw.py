"""Pallas HBM copy-bandwidth sweep (round-4 verdict #1, part 2).

The late-round-3 decomposition probe measured the pallas_call pure-copy
floor at ~0.96 ms/op for a [8, 12800, 384] bf16 tensor (~164 GB/s effective
on read+write bytes) — far under the v5e's ~819 GB/s HBM peak. Every fused
activation kernel pays this floor once per invocation; whether a LARGER
fused region can ever win depends on whether the floor is a platform bound
or a blocking artifact. This tool sweeps:

- layout: blocks over T in [B, T, C] (the graph layout); [T, B, C]
  (tmajor); fully-collapsed 2-D [R, 512] rows
- block size: tile rows in {128, 256, 512, 1024, 2048}
- grid iteration marked parallel vs arbitrary (dimension_semantics)

against an XLA baseline pass (x * 1.0000001 chained — one materialized
read+write per op, the thing a fused kernel's boundary replaces).

Methodology (docs/PERF.md): chain N dependent applications in ONE jit,
in-graph scalar reduce, float() fetch; slope = (t(N2)-t(N1))/(N2-N1).

Run: timeout 580 python tools/probe_pallas_bw.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

N1, N2 = int(os.environ.get("N1", 4)), int(os.environ.get("N2", 24))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    dtype = jnp.bfloat16
    npr = np.random.default_rng(0)
    B, T, C = 8, 12800, 384  # the #14/#15 probe shape (78.6 MB logical bf16)
    nbytes = B * T * C * 2

    def _copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def copy_btc(tile_t, parallel):
        spec = pl.BlockSpec((B, tile_t, C), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _copy_kernel, grid=(T // tile_t,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, T, C), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) if parallel else ("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    def copy_tbc(tile_t, parallel):
        spec = pl.BlockSpec((tile_t, B, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _copy_kernel, grid=(T // tile_t,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((T, B, C), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) if parallel else ("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    def copy_flat(rows, lanes, parallel):
        total = B * T * C
        r_all = total // lanes
        spec = pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _copy_kernel, grid=(r_all // rows,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((r_all, lanes), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",) if parallel else ("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    def slope(fn, x):
        def chain(n):
            @jax.jit
            def run(y):
                for _ in range(n):
                    y = fn(y)
                return jnp.sum(y.astype(jnp.float32))
            return run

        r1, r2 = chain(N1), chain(N2)
        float(r1(x))  # compile
        float(r2(x))
        t = {}
        for name, r in (("n1", r1), ("n2", r2)):
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(r(x))
                samples.append(time.perf_counter() - t0)
            t[name] = float(np.median(samples))
        return (t["n2"] - t["n1"]) / (N2 - N1)

    x_btc = jnp.asarray(npr.standard_normal((B, T, C)) * 0.1, dtype)
    x_tbc = jnp.asarray(np.transpose(np.asarray(x_btc, np.float32), (1, 0, 2)), dtype)

    results = {}

    # XLA materialized-pass baseline: tanh chains cannot be folded into
    # one pass the way a multiply chain constant-folds (x*c^N = one fusion)
    results["xla_tanh_btc"] = slope(lambda y: jnp.tanh(y), x_btc)

    for tile_t in (256, 512):
        for par in (True,):
            tag = f"btc_t{tile_t}_{'par' if par else 'arb'}"
            try:
                k = copy_btc(tile_t, par)
                results[tag] = slope(lambda y, k=k: k(y), x_btc)
            except Exception as e:
                results[tag] = f"ERR {e}"[:80]
                print(f"{tag}: {results[tag]}", flush=True)
                continue
            print(f"{tag}: {results[tag]*1e3:.3f} ms/op "
                  f"({2*nbytes/results[tag]/1e9:.0f} GB/s)", flush=True)

    for tile_t in (256,):
        tag = f"tbc_t{tile_t}_par"
        try:
            k = copy_tbc(tile_t, True)
            results[tag] = slope(lambda y, k=k: k(y), x_tbc)
            print(f"{tag}: {results[tag]*1e3:.3f} ms/op "
                  f"({2*nbytes/results[tag]/1e9:.0f} GB/s)", flush=True)
        except Exception as e:
            results[tag] = f"ERR {e}"[:80]
            print(f"{tag}: {results[tag]}", flush=True)

    x_flat = {}
    for lanes in (128, 512):
        total = B * T * C
        x_flat[lanes] = jnp.reshape(x_btc, (total // lanes, lanes))
        for rows in (8192,):
            tag = f"flat_{lanes}l_r{rows}_par"
            try:
                k = copy_flat(rows, lanes, True)
                results[tag] = slope(lambda y, k=k: k(y), x_flat[lanes])
                print(f"{tag}: {results[tag]*1e3:.3f} ms/op "
                      f"({2*nbytes/results[tag]/1e9:.0f} GB/s)", flush=True)
            except Exception as e:
                results[tag] = f"ERR {e}"[:80]
                print(f"{tag}: {results[tag]}", flush=True)

    print("\n=== summary (ms/op, GB/s effective on 2x logical bytes) ===")
    for tag, v in results.items():
        if isinstance(v, float):
            print(f"{tag:28s} {v*1e3:8.3f} ms  {2*nbytes/v/1e9:7.0f} GB/s")
        else:
            print(f"{tag:28s} {v}")


if __name__ == "__main__":
    main()
