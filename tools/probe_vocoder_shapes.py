"""Attribute the engine-level vocode stage cost (real TPU).

tools/profile_engine_e2e.py (E2E_STAGES=1) measured ~2.6-3.0 s of vocode
wall for ~7k latent frames at 32 requests, while bench.py's synthetic
pipeline vocodes 4.8k frames in ~450 ms — ~2.5x more per frame. This probe
times the jitted vocoder at the exact shapes each path uses to find where
the gap lives: batch/frame-shape inefficiency, the int16 fetch, or the
per-chunk host assembly (pads + concat) in engine._vocode_many.

Timing per CLAUDE.md methodology: each timed call is fetched to a host
scalar (int16 path: fetch the full wav like production does; float path:
in-graph sum -> scalar fetch), so wall includes real execution.

Run: timeout 580 python tools/probe_vocoder_shapes.py
Knobs: PROBE_SHAPES="b,m,fb;b,m,fb;...", PROBE_ITERS (default 3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from indextts_tpu.engine import IndexTTS

    here = os.path.dirname(os.path.abspath(__file__))
    cfg_path = os.path.join(here, "..", "configs", "indextts_1_5.yaml")
    eng = IndexTTS(cfg_path=cfg_path, model_dir="/nonexistent",
                   allow_random_init=True, fast_init=True)
    d = eng.cfg.gpt.model_dim
    iters = int(os.environ.get("PROBE_ITERS", 3))
    shapes = os.environ.get(
        "PROBE_SHAPES",
        # bench-like wide/long; engine-like batch of short rows; variants
        "8,608,300;16,224,300;32,224,300;16,608,300;16,224,100",
    )
    npr = np.random.default_rng(0)

    for spec in shapes.split(";"):
        b, m, fb = (int(x) for x in spec.split(","))
        lat = jnp.asarray(npr.standard_normal((b, m, d)).astype(np.float32) * 0.1,
                          eng.dtype)
        mel = jnp.asarray(npr.standard_normal((b, fb, 100)).astype(np.float32),
                          eng.dtype)
        lens = jnp.asarray([1.0] * b, jnp.float32)
        for int16_out in (True, False):
            fn = eng._vocoder_fn(b, m, fb, int16_out=int16_out)
            try:
                w = fn(eng.bigvgan_params, lat, mel, lens)  # compile
                np.asarray(w)
                vals = []
                for _ in range(iters):
                    t0 = time.perf_counter()
                    w = fn(eng.bigvgan_params, lat, mel, lens)
                    if int16_out:
                        np.asarray(w)  # production fetch: int16 wav via tunnel
                    else:
                        float(jnp.sum(w.astype(jnp.float32)))  # exec only
                    vals.append(time.perf_counter() - t0)
                sec = float(np.median(vals))
                frames = b * m
                print(f"b={b:3d} m={m:4d} fb={fb} int16_fetch={int16_out!s:5s} "
                      f"{sec*1000:8.1f} ms  ({sec/frames*1e6:6.1f} us/frame)",
                      flush=True)
            except Exception as e:
                print(f"b={b} m={m} fb={fb} FAILED: {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
