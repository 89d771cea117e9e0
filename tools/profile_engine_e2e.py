"""Engine-level end-to-end throughput on the real TPU — the number a USER of
the public API gets, including everything bench.py's synthetic pipeline
skips: text normalization + BPE + sentence split, length bucketing, host
silence-removal scan, the teacher-forced latent pass (or its fast_latents
skip), int16 conversion and the device->host wav fetch.

Measures engine.infer (1 request) and engine.infer_batch (8 / 32 requests,
one sentence each), exact pipeline vs serving mode (quant_kv+fast_latents).
audio-s/s counts WALL time of the public call. Compare against bench.py's
same-day headline/extras to see the engine-layer overhead.

Run: timeout 580 python tools/profile_engine_e2e.py
Knobs: E2E_REQS (default "1,8,32"), E2E_MODES ("exact,serving"),
E2E_MAX_MEL (default 220), E2E_ITERS (default 2 timed, after 1 warmup),
E2E_DISTINCT_PROMPTS=1 (each request brings its OWN reference voice — the
multi-tenant serving case: conditioning misses the per-prompt value cache
and rides the batched _conds_for_many dispatch; with the default shared
prompt, conditioning is cached after warmup and contributes ~nothing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

TEXTS = [
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK.",
    "A JOURNEY OF A THOUSAND MILES BEGINS WITH A SINGLE STEP FORWARD.",
    "SPEECH SYNTHESIS QUALITY DEPENDS ON PROSODY TIMBRE AND CLARITY.",
    "THE WEATHER TODAY IS SUNNY WITH A GENTLE BREEZE FROM THE WEST.",
]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from indextts_tpu.engine import IndexTTS

    here = os.path.dirname(os.path.abspath(__file__))
    cfg_path = os.path.join(here, "..", "configs", "indextts_1_5.yaml")
    max_mel = int(os.environ.get("E2E_MAX_MEL", 220))
    iters = int(os.environ.get("E2E_ITERS", 2))
    reqs = [int(x) for x in os.environ.get("E2E_REQS", "1,8,32").split(",")]
    modes = os.environ.get("E2E_MODES", "exact,serving").split(",")

    npr = np.random.default_rng(0)
    prompt_mel = npr.standard_normal((1, 100, 300)).astype(np.float32)
    distinct = os.environ.get("E2E_DISTINCT_PROMPTS", "") == "1"
    prompts = (
        [npr.standard_normal((1, 100, 300)).astype(np.float32) for _ in range(max(reqs))]
        if distinct
        else None
    )

    # num_beams is EXPLICIT: omitting it silently measured the engine's
    # reference-default beam-3 decode (discovered late round 3 — every
    # historical row in SERVING.md's engine table is a beam-3 number).
    # E2E_BEAMS=1 measures the greedy serving config.
    beams = int(os.environ.get("E2E_BEAMS", 3))
    kwargs = dict(do_sample=True, top_k=30, max_mel_tokens=max_mel,
                  num_beams=beams, temperature=1.0, top_p=0.8,
                  repetition_penalty=10.0)

    for mode in modes:
        serving = mode == "serving"
        eng = IndexTTS(cfg_path=cfg_path, model_dir="/nonexistent",
                       allow_random_init=True, fast_init=True,
                       quant_kv=serving, fast_latents=serving)

        def run(n):
            items = [
                (prompts[i] if distinct else prompt_mel, TEXTS[i % len(TEXTS)])
                for i in range(n)
            ]
            if n == 1:
                sr, wav = eng.infer(items[0][0], TEXTS[0], None, verbose=False, **kwargs)
                return wav.size / sr  # int16 mono; robust to [1, S] vs [S, 1]
            outs = eng.infer_batch(
                items,
                sentences_bucket_max_size=int(os.environ.get("E2E_BUCKET", 8)),
                verbose=os.environ.get("E2E_STAGES", "") == "1",
                **kwargs,
            )
            return sum(w.size / sr for sr, w in outs)

        for n in reqs:
            try:
                run(n)  # warmup/compile for this shape bucket
                vals = []
                for it in range(iters):
                    t0 = time.perf_counter()
                    audio = run(n)
                    wall = time.perf_counter() - t0
                    vals.append(audio / wall)
                print(f"[{mode:7s}] reqs={n:3d} beams={beams} engine e2e "
                      f"{float(np.median(vals)):7.2f} audio-s/s "
                      f"(runs {['%.1f' % v for v in vals]})", flush=True)
            except Exception as e:
                print(f"[{mode:7s}] reqs={n:3d} FAILED: {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
