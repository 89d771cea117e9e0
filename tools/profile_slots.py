"""Measure slot-mode serving (rolling admission) on the real TPU.

Numbers an operator needs to choose between the two continuous-batching
modes (docs/SERVING.md):
- slot steady-state decode cost (ms/step with all slots active) — the
  throughput price of the statically-sized circular cache vs the
  gather-window batcher's segment-grown cache;
- admission latency (prefill + admit dispatch wall) — what a request pays
  to JOIN a live batch (vs waiting out the running batch in window mode);
- e2e audio-s/s: engine.infer_slots vs engine.infer_batch on the same
  requests, same run.

Run: timeout 580 python tools/profile_slots.py
Knobs: SLOTS (8), CHUNK (25), MAX_MEL (220), REQS (8), MODES
("serving" default: quant_kv+fast_latents — the recommended slot config).
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
    n_slots = int(os.environ.get("SLOTS", 8))
    chunk = int(os.environ.get("CHUNK", 25))
    max_mel = int(os.environ.get("MAX_MEL", 220))
    n_reqs = int(os.environ.get("REQS", 8))
    modes = os.environ.get("MODES", "serving").split(",")

    npr = np.random.default_rng(0)
    prompt = npr.standard_normal((1, 100, 300)).astype(np.float32)
    kwargs = dict(do_sample=True, top_k=30, max_mel_tokens=max_mel,
                  num_beams=1, temperature=1.0, top_p=0.8,
                  repetition_penalty=10.0)
    items = [(prompt, TEXTS[i % len(TEXTS)]) for i in range(n_reqs)]

    for mode in modes:
        serving = mode == "serving"
        eng = IndexTTS(cfg_path=cfg_path, model_dir="/nonexistent",
                       allow_random_init=True, fast_init=True,
                       quant_kv=serving, fast_latents=serving)

        # --- ONE long-lived session (production shape: the server keeps a
        # session per static signature; per-call sessions re-pay tracing)
        sess = eng.slot_session(n_slots=n_slots, chunk_steps=chunk, **kwargs)
        t0 = time.perf_counter()
        for it in items:
            sess.submit(*it)
        sess.drain()
        print(f"[{mode}] slot warmup (compiles): {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        eng.infer_batch(items, sentences_bucket_max_size=n_slots, **kwargs)
        print(f"[{mode}] batch warmup: {time.perf_counter() - t0:.1f}s", flush=True)

        # --- admission latency on the WARM session (what a request pays to
        # join a live batch), median of 3 into different free slots
        admits = []
        for k in range(3):
            sess.submit(prompt, TEXTS[k % len(TEXTS)])
            row = sess.pending.popleft()
            t0 = time.perf_counter()
            sess._admit_one(row, k)
            np.asarray(sess.state.cur)  # force the admit chain to finish
            admits.append(time.perf_counter() - t0)
        print(f"[{mode}] admission (prefill+admit, fetched, warm): "
              f"{1000 * float(np.median(admits)):.1f} ms "
              f"(runs {['%.0f' % (1000 * a) for a in admits]})", flush=True)

        # --- steady-state step cost: all slots active, timed full chunks
        for i in range(n_slots - 3):
            sess.submit(prompt, TEXTS[(i + 3) % len(TEXTS)])
        while sess.pending:
            free = [k for k, r in enumerate(sess.slots) if r is None]
            if not free:
                break
            sess._admit_one(sess.pending.popleft(), free[0])
        walls = []
        import jax.numpy as jnp
        for it in range(6):
            cols = {k: jnp.asarray(v) for k, v in sess.dyn_cols.items()}
            sess.rng, sub = jax.random.split(sess.rng)
            t0 = time.perf_counter()
            sess.state = sess._steps_fn(
                params=eng.gpt_params, state=sess.state, rng=sub,
                temperature=cols["temperature"], top_p=cols["top_p"],
                repetition_penalty=cols["repetition_penalty"],
                typical_mass=cols["typical_mass"],
            )
            np.asarray(sess.state.tick)  # chunk fully executed
            walls.append(time.perf_counter() - t0)
            if not np.asarray(sess.state.active).any():
                break
        per_step = 1000 * float(np.median(walls)) / chunk
        print(f"[{mode}] slot chunk ({chunk} steps, {n_slots} slots, "
              f"S={sess.cache_len}): {1000 * float(np.median(walls)):.1f} ms "
              f"-> {per_step:.2f} ms/step", flush=True)

        # --- drain the probe rows, then e2e comparison on the warm session
        sess.drain()

        def _slot_e2e():
            for it in items:
                sess.submit(*it)
            outs = sess.drain()
            return [outs[k] for k in sorted(outs)]

        for name, fn in (
            ("infer_slots (warm session)", _slot_e2e),
            ("infer_batch", lambda: eng.infer_batch(
                items, sentences_bucket_max_size=n_slots, **kwargs)),
        ):
            vals = []
            for _ in range(2):
                t0 = time.perf_counter()
                outs = fn()
                wall = time.perf_counter() - t0
                audio = sum(w.size / sr for sr, w in outs)
                vals.append(audio / wall)
            print(f"[{mode}] {name}: {float(np.median(vals)):.2f} audio-s/s "
                  f"(runs {['%.1f' % v for v in vals]})", flush=True)

        # --- streaming slot request under load: time-to-first-chunk for a
        # request joining a session whose other slots are mid-decode, and
        # the per-tick cost with one streaming row mixed in (the premium a
        # streaming row adds: its ~(chunk+overlap)-code window re-vocode)
        if not serving:
            continue  # streaming needs fast_latents
        sess.submit(prompt, TEXTS[1], on_chunk=lambda r, c: None)
        sess.drain()  # compile the window extractor + window vocoder shapes
        for it in items[: n_slots - 1]:
            sess.submit(*it)
        for _ in range(2):
            sess.tick()  # other slots mid-decode
        first = []
        t_submit = time.perf_counter()
        sess.submit(prompt, TEXTS[0],
                    on_chunk=lambda r, c, t0=t_submit: first.append(
                        time.perf_counter() - t0) if not first else None)
        while not first and sess.busy:
            sess.tick()
        print(f"[{mode}] streaming first chunk (7 busy rows): "
              f"{1000 * first[0]:.0f} ms after submit", flush=True)
        walls = []
        for _ in range(4):
            t0 = time.perf_counter()
            sess.tick()
            walls.append(time.perf_counter() - t0)
            if not sess.busy:
                break
        if walls:
            print(f"[{mode}] tick wall with 1 streaming row mixed in: "
                  f"{1000 * float(np.median(walls)):.1f} ms "
                  f"(plain chunk ~{chunk}x step cost + window vocode)",
                  flush=True)
        sess.drain()


if __name__ == "__main__":
    main()
