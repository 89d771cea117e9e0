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

Interpretation: threaded ~= max(individual times) -> compiles overlap,
prewarm threads are worth wiring into bench; threaded ~= sum -> the server
serializes, drop the idea (record as a negative result in PERF.md).
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
        """A distinct multi-layer matmul chain per (seed, width) — unique
        shapes defeat both the in-process and persistent caches."""
        w = jnp.asarray(np.random.default_rng(seed).standard_normal((width, width)), jnp.bfloat16)

        @jax.jit
        def fn(x):
            for _ in range(24):
                x = jnp.tanh(x @ w)
            return x.sum()

        x = jnp.ones((width, width), jnp.bfloat16)
        return fn, x

    def compile_one(seed, width):
        fn, x = make_graph(seed, width)
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        return time.perf_counter() - t0

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

    import json

    print(json.dumps({
        "sequential_s": round(seq, 2),
        "seq_each_s": [round(a, 2), round(b, 2)],
        "threaded_s": round(thr, 2),
        "threaded_each_s": [round(results.get("c", -1), 2), round(results.get("d", -1), 2)],
        "overlap": thr < 0.75 * (results.get("c", 0) + results.get("d", 0)),
    }))


if __name__ == "__main__":
    main()
