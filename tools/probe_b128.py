"""Probe the single-chip serving ceiling past B=64: does B=128 compile when
the vocoder runs in sub-batches?

Round-3 context (commit 4c8e7e8): serving mode measured B=32 -> ~110,
B=64 -> ~119 audio-s/s; a MONOLITHIC B=128 pipeline failed to compile.
Hypothesis: the failure is the vocoder graph's 2x-rate wide-stage
intermediates at B=128 (activation memory is per-sample; decode's int8 KV
cache at B=128 is only ~1.5 GB), so decode at B=128 + vocode in chunks of
32 should compile and may beat the B=64 number by amortizing the decode
weight stream further.

Run: timeout 580 python tools/probe_b128.py
Knobs: PROBE_BATCH (128), PROBE_VOC_CHUNK (32), BENCH_GEN_TOKENS (200).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BATCH = int(os.environ.get("PROBE_BATCH", 128))
VOC_CHUNK = int(os.environ.get("PROBE_VOC_CHUNK", 32))
TEXT_LEN = 64
GEN_TOKENS = int(os.environ.get("BENCH_GEN_TOKENS", 200))
COND_FRAMES = 300
SAMPLE_RATE = 24000
SAMPLES_PER_CODE = 1024


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from indextts_tpu.config import load_config
    from indextts_tpu.models.bigvgan import bigvgan_apply, init_bigvgan
    from indextts_tpu.models.gpt import get_conditioning, init_unified_voice
    from indextts_tpu.models.gpt_decode import GenerationConfig, generate_speech

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_config(os.path.join(here, "..", "configs", "indextts_1_5.yaml"))
    gpt_cfg, h = cfg.gpt, cfg.bigvgan
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32

    def fast_params_like(init_fn):
        from indextts_tpu.engine import _is_norm_scale

        shapes = jax.eval_shape(init_fn)

        @jax.jit
        def build():
            def mk(path, s):
                if jnp.issubdtype(s.dtype, jnp.floating):
                    if _is_norm_scale(path):
                        return jnp.ones(s.shape, dtype)
                    n = int(np.prod(s.shape)) if s.shape else 1
                    i = jax.lax.broadcasted_iota(jnp.float32, (max(n, 1),), 0)
                    return (0.02 * jnp.sin(i * 0.37 + 1.0)).reshape(s.shape).astype(dtype)
                return jnp.zeros(s.shape, s.dtype)

            return jax.tree_util.tree_map_with_path(mk, shapes)

        return build()

    rng = jax.random.PRNGKey(0)
    gpt_params = fast_params_like(lambda: init_unified_voice(rng, gpt_cfg))
    bv_params = fast_params_like(lambda: init_bigvgan(jax.random.fold_in(rng, 1), h))

    npr = np.random.default_rng(0)
    cond_mel = jnp.asarray(npr.standard_normal((1, COND_FRAMES, 100)), dtype)
    text = jnp.asarray(npr.integers(2, 8000, (BATCH, TEXT_LEN)), jnp.int32)
    text_lens = jnp.full((BATCH,), TEXT_LEN, jnp.int32)
    gen = GenerationConfig(do_sample=True, num_beams=1, top_k=30, max_new_tokens=GEN_TOKENS)

    cond_fn = jax.jit(lambda p, m, l: get_conditioning(p, gpt_cfg, m, l))
    decode_sv = jax.jit(partial(generate_speech, cfg=gpt_cfg, gen=gen,
                                quant_kv=True, capture_latents=True, pos_off=1))
    voc_fn = jax.jit(lambda p, lat, mel: bigvgan_apply(p, h, lat, mel))

    def pipe(key):
        conds = cond_fn(gpt_params, cond_mel, jnp.asarray([COND_FRAMES]))
        cb = jnp.broadcast_to(conds, (BATCH,) + conds.shape[1:])
        codes, code_lens, lat = decode_sv(
            params=gpt_params, conds=cb, text_tokens=text, text_lengths=text_lens,
            rng=key, temperature=jnp.float32(1.0), top_p=jnp.float32(0.8),
            repetition_penalty=jnp.float32(10.0),
        )
        lat = lat.astype(dtype)
        mel_b = jnp.broadcast_to(cond_mel, (VOC_CHUNK,) + cond_mel.shape[1:])
        wavs = [voc_fn(bv_params, lat[i:i + VOC_CHUNK], mel_b)
                for i in range(0, BATCH, VOC_CHUNK)]
        return wavs, code_lens

    t0 = time.perf_counter()
    wavs, _ = pipe(jax.random.PRNGKey(70))
    wavs[-1].block_until_ready()
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s "
          f"(B={BATCH}, voc chunks of {VOC_CHUNK})", flush=True)

    vals = []
    for it in range(3):
        t0 = time.perf_counter()
        wavs, lens_s = pipe(jax.random.PRNGKey(71 + it))
        wavs[-1].block_until_ready()
        wall = time.perf_counter() - t0
        audio_s = int(np.asarray(lens_s).sum()) * SAMPLES_PER_CODE / SAMPLE_RATE
        vals.append(audio_s / wall)
        print(f"iter {it}: {wall:.3f}s wall, {audio_s:.1f} audio-s "
              f"-> {audio_s / wall:.2f} audio-s/s", flush=True)
    print(f"median: {float(np.median(vals)):.2f} audio-s/s "
          f"(serving_b64 baseline ~119-120)", flush=True)


if __name__ == "__main__":
    main()
