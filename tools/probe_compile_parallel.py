"""Measure whether axon remote compiles overlap across Python threads.

VERDICT round-2 weak #3: bench.py spends 74-295 s of its 580 s budget on
serialized remote compiles, and no prewarm strategy was ever tested. The
open question: does the axon compile server process two in-flight compiles
concurrently (threads dispatch independent jit lowerings), or does the
tunnel serialize them? If compiles overlap, bench.py could thread-compile
the extras' executables while the headline's timed iterations run.

Run on the real TPU (one process): `timeout 580 python tools/probe_compile_parallel.py`
Prints sequential vs threaded wall time for two DISTINCT fresh graphs
(unique shapes so the persistent cache can't serve them; the cache dir is
pointed at a throwaway tmp dir so results stay reproducible).

First run (2026-08-18, small 24-matmul chains) was inconclusive: each graph
compiled in ~1.1-1.7 s, far below bench scale (60-200 s), so threading
overhead drowned the signal (seq 1.12+1.32 after warmup vs threaded 2.54).
This version uses deep scanned transformer-ish graphs tuned to ~10-30 s
compiles, and adds the second question prewarm actually needs answered:
does a background compile PERTURB timed device execution of an
already-compiled graph? (bench times headline iterations while the extras
would compile.)

Interpretation: threaded ~= max(individual times) AND perturbed iteration
times ~= clean ones -> wire prewarm threads into bench; otherwise record
the negative result in PERF.md.

RESULT (2026-08-18, decode-loop-shaped graphs): STRONG NEGATIVE.
sequential 19.2 s + 27.9 s = 53.6 s wall; threaded 250.8 s wall with EACH
compile ballooning to ~230 s — concurrent compiles contend catastrophically
on this 1-core host (client-side tracing/lowering shares one core + the
GIL; 250 s wall vs 53.6 s of sequential work is ~4.7x pure overhead).
Background-compile perturbation of timed executions was minor by comparison
(67.2 -> 69.6 ms/iter) but moot. Prewarm threads are dropped; the effective
fix for the compile budget is the persistent compilation cache
(/tmp/jax_bench_cache), which serves warm compiles in ~1-2 s each.
See docs/PERF.md "Compile-time engineering".
"""

import os
import sys
import tempfile
import threading
import time

os.environ.setdefault("JAX_CACHE_DIR", tempfile.mkdtemp(prefix="compile_probe_"))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from jax.experimental.compilation_cache import compilation_cache

    compilation_cache.set_cache_dir(os.environ["JAX_CACHE_DIR"])
    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)

    def make_graph(seed: int, width: int):
        """A distinct deep decode-loop-shaped graph per (seed, width):
        a lax.while_loop over a multi-layer attention+MLP step with a
        static KV cache — the graph CLASS whose compiles dominate bench.py.
        Unique widths defeat both the in-process and persistent caches."""
        rng = np.random.default_rng(seed)
        L, H, S = 8, 8, 256
        dh = width // H
        wq = jnp.asarray(rng.standard_normal((L, width, width)) * 0.02, jnp.bfloat16)
        wk = jnp.asarray(rng.standard_normal((L, width, width)) * 0.02, jnp.bfloat16)
        wv = jnp.asarray(rng.standard_normal((L, width, width)) * 0.02, jnp.bfloat16)
        wo = jnp.asarray(rng.standard_normal((L, width, width)) * 0.02, jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((L, width, 4 * width)) * 0.02, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((L, 4 * width, width)) * 0.02, jnp.bfloat16)

        @jax.jit
        def fn(x0):
            B = x0.shape[0]
            kc = jnp.zeros((L, B, H, S, dh), jnp.bfloat16)
            vc = jnp.zeros((L, B, H, S, dh), jnp.bfloat16)

            def body(carry):
                i, x, kc, vc = carry
                h = x
                for l in range(L):
                    q = (h @ wq[l]).reshape(B, H, dh)
                    k = (h @ wk[l]).reshape(B, H, dh)
                    v = (h @ wv[l]).reshape(B, H, dh)
                    kc2 = jax.lax.dynamic_update_index_in_dim(kc[l], k[:, :, None], i, 3)
                    vc2 = jax.lax.dynamic_update_index_in_dim(vc[l], v[:, :, None], i, 3)
                    kc = kc.at[l].set(kc2)
                    vc = vc.at[l].set(vc2)
                    att = jnp.einsum("bhd,bhsd->bhs", q, kc2)
                    att = jax.nn.softmax(jnp.where(jnp.arange(S)[None, None] <= i, att, -1e9))
                    o = jnp.einsum("bhs,bhsd->bhd", att, vc2).reshape(B, width)
                    h = h + o @ wo[l]
                    h = h + jax.nn.gelu(h @ w1[l]) @ w2[l]
                return (i + 1, h, kc, vc)

            def cond(carry):
                return carry[0] < S

            _, x, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, kc, vc))
            return x.sum()

        x = jnp.ones((4, width), jnp.bfloat16)
        return fn, x

    def compile_one(seed, width):
        fn, x = make_graph(seed, width)
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        return time.perf_counter() - t0

    # init warmup so the first measured compile doesn't carry backend init
    jnp.zeros(8).block_until_ready()

    # sequential baseline: two fresh graphs, distinct widths
    t0 = time.perf_counter()
    a = compile_one(0, 512)
    b = compile_one(1, 640)
    seq = time.perf_counter() - t0

    # threaded: two MORE fresh graphs (new widths), dispatched concurrently
    results = {}

    def worker(name, seed, width):
        results[name] = compile_one(seed, width)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker, args=("c", 2, 768)),
          threading.Thread(target=worker, args=("d", 3, 896))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    thr = time.perf_counter() - t0

    # perturbation: time repeated executions of an ALREADY-compiled graph
    # while a fresh compile runs in a background thread (what bench prewarm
    # would do to the headline's timed iterations)
    run_fn, run_x = make_graph(0, 512)  # cached from 'a' above
    run_fn(run_x).block_until_ready()

    def timed_execs(n=6):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(run_fn(run_x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    clean_exec = timed_execs()
    bg = threading.Thread(target=compile_one, args=(4, 1024))
    bg.start()
    time.sleep(0.5)  # let the compile get in flight
    perturbed_exec = timed_execs()
    bg.join()

    import json

    print(json.dumps({
        "sequential_s": round(seq, 2),
        "seq_each_s": [round(a, 2), round(b, 2)],
        "threaded_s": round(thr, 2),
        "threaded_each_s": [round(results.get("c", -1), 2), round(results.get("d", -1), 2)],
        "overlap": thr < 0.75 * (results.get("c", 0) + results.get("d", 0)),
        "clean_exec_ms": round(1000 * clean_exec, 1),
        "perturbed_exec_ms": round(1000 * perturbed_exec, 1),
    }))


if __name__ == "__main__":
    main()
