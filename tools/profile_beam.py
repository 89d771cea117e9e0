"""Profile the beam-3 decode stage (VERDICT round-2 weak #2: e2e implies
~20 ms/step vs the predicted ~3.6 ms/step HBM floor).

Times generate_speech_beam ALONE (decode only, in-graph scalar fetch) at the
bench config (batch 8, 3 beams, 200 new tokens, flagship scale), plus greedy
for reference, and reports effective ms/step. Reorder strategy selectable via
INDEXTTS_BEAM_REORDER=gather|onehot to compare cache-reorder lowerings.

Run: timeout 580 python tools/profile_beam.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 8))
GEN_TOKENS = int(os.environ.get("BENCH_GEN_TOKENS", 200))
TEXT_LEN = int(os.environ.get("BENCH_TEXT_LEN", 64))
COND_FRAMES = int(os.environ.get("BENCH_COND_FRAMES", 300))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from functools import partial

    from indextts_tpu.config import load_config
    from indextts_tpu.models.gpt import get_conditioning, init_unified_voice
    from indextts_tpu.models.gpt_decode import (
        GenerationConfig,
        generate_speech,
        generate_speech_beam,
    )

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs", "indextts_1_5.yaml"))
    gpt_cfg = cfg.gpt
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__} batch={BATCH} beams=3 "
          f"reorder={os.environ.get('INDEXTTS_BEAM_REORDER', 'default')}")

    shapes = jax.eval_shape(lambda: init_unified_voice(jax.random.PRNGKey(0), gpt_cfg))

    @jax.jit
    def build():
        def mk(s):
            if jnp.issubdtype(s.dtype, jnp.floating):
                n = int(np.prod(s.shape)) if s.shape else 1
                i = jax.lax.broadcasted_iota(jnp.float32, (max(n, 1),), 0)
                return (0.02 * jnp.sin(i * 0.37 + 1.0)).reshape(s.shape).astype(dtype)
            return jnp.zeros(s.shape, s.dtype)

        return jax.tree_util.tree_map(mk, shapes)

    params = build()
    npr = np.random.default_rng(0)
    cond_mel = jnp.asarray(npr.standard_normal((1, COND_FRAMES, 100)), dtype)
    text = jnp.asarray(npr.integers(2, 8000, (BATCH, TEXT_LEN)), jnp.int32)
    text_lens = jnp.full((BATCH,), TEXT_LEN, jnp.int32)

    conds = jax.jit(lambda p, m, l: get_conditioning(p, gpt_cfg, m, l))(
        params, cond_mel, jnp.asarray([COND_FRAMES])
    )
    conds_b = jnp.broadcast_to(conds, (BATCH,) + conds.shape[1:])

    def timeit(name, fn, iters=3):
        t0 = time.perf_counter()
        float(fn(jax.random.PRNGKey(0)))
        compile_s = time.perf_counter() - t0
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            float(fn(jax.random.PRNGKey(1 + i)))
            ts.append(time.perf_counter() - t0)
        ms = 1000 * float(np.median(ts))
        print(f"  {name:24s}: {ms:8.1f} ms  ({ms / GEN_TOKENS:6.2f} ms/step)   compile {compile_s:.0f}s")
        return ms

    # early_stopping off so the loop always runs all 200 steps (fixed work)
    gen_b = GenerationConfig(do_sample=True, num_beams=3, top_k=30,
                             max_new_tokens=GEN_TOKENS, early_stopping=False)
    beam_fn = jax.jit(partial(generate_speech_beam, cfg=gpt_cfg, gen=gen_b))

    def beam_once(key):
        codes, lens = beam_fn(
            params=params, conds=conds_b, text_tokens=text, text_lengths=text_lens,
            rng=key, temperature=jnp.float32(1.0), top_p=jnp.float32(0.8),
            repetition_penalty=jnp.float32(10.0),
        )
        return (codes.sum() + lens.sum()).astype(jnp.float32)

    gen_g = GenerationConfig(do_sample=True, num_beams=1, top_k=30,
                             max_new_tokens=GEN_TOKENS, early_stopping=False)
    greedy_fn = jax.jit(partial(generate_speech, cfg=gpt_cfg, gen=gen_g))

    def greedy_once(key):
        codes, lens = greedy_fn(
            params=params, conds=conds_b, text_tokens=text, text_lengths=text_lens,
            rng=key, temperature=jnp.float32(1.0), top_p=jnp.float32(0.8),
            repetition_penalty=jnp.float32(10.0),
        )
        return (codes.sum() + lens.sum()).astype(jnp.float32)

    if os.environ.get("SKIP_GREEDY", "0") != "1":
        timeit("greedy decode", greedy_once)
    timeit("beam3 decode", beam_once)


if __name__ == "__main__":
    main()
