"""Measure streaming time-to-first-audio through engine.infer_stream on the
real TPU (the bench's ttfa_stream_ms measurement, standalone).

Run: timeout 580 python tools/profile_stream.py
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

    from indextts_tpu.engine import IndexTTS

    eng = IndexTTS(
        cfg_path=os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs", "indextts_1_5.yaml"),
        model_dir="/nonexistent", allow_random_init=True, fast_init=True,
    )
    npr = np.random.default_rng(0)
    mel_np = npr.standard_normal((1, 100, 300)).astype(np.float32)
    stream_text = "HELLO WORLD THIS IS A STREAMING LATENCY TEST SENTENCE."
    kwargs = dict(max_mel_tokens=120, do_sample=True, top_k=30)

    g = eng.infer_stream(prompt_mel=mel_np, text=stream_text, **kwargs)
    t0 = time.perf_counter()
    next(g)
    print(f"first chunk incl. compile: {time.perf_counter()-t0:.1f}s")
    g.close()

    samples = []
    for i in range(5):
        g = eng.infer_stream(prompt_mel=mel_np, text=stream_text, **kwargs)
        t0 = time.perf_counter()
        chunk = next(g)
        samples.append(1000 * (time.perf_counter() - t0))
        g.close()
    print(f"ttfa_stream_ms: median {np.median(samples):.1f}  all {[round(s,1) for s in samples]}")


if __name__ == "__main__":
    main()
