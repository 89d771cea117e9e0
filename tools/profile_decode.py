"""Decode roofline measurement (VERDICT round-1 weak #3).

Measures ms/step of the jitted KV-cache decode at the flagship scale across
batch sizes and cache lengths, against the analytic HBM bound:

  weights ~944 MB bf16 read once per step (batch-independent)
  + KV cache read per step: L*B*H*S*Dh*2(KV)*2B bytes
  -> v5e HBM ~819 GB/s gives the floor.

Timing is tunnel-proof: each measurement decodes N steps inside ONE device
call (lax.while_loop), reduces to a scalar, and fetches it.

Run: timeout 580 python tools/profile_decode.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

GEN_TOKENS = int(os.environ.get("BENCH_GEN_TOKENS", 200))
TEXT_LEN = int(os.environ.get("BENCH_TEXT_LEN", 64))
HBM_GBS = 819.0  # v5e


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from indextts_tpu.config import load_config
    from indextts_tpu.models.gpt import init_unified_voice
    from indextts_tpu.models.gpt_decode import GenerationConfig, generate_speech

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs", "indextts_1_5.yaml"))
    gpt_cfg = cfg.gpt
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__}")

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
    weight_bytes = sum(
        int(np.prod(s.shape)) * 2
        for s in jax.tree_util.tree_leaves(shapes)
        if jnp.issubdtype(s.dtype, jnp.floating)
    )
    print(f"weights: {weight_bytes/1e6:.0f} MB bf16 -> floor {1000*weight_bytes/(HBM_GBS*1e9):.2f} ms/step")

    npr = np.random.default_rng(0)
    d = gpt_cfg.model_dim

    def run_case(batch, gen_tokens):
        conds = jnp.asarray(npr.standard_normal((batch, gpt_cfg.condition_num_latent, d)), dtype)
        text = jnp.asarray(npr.integers(2, 8000, (batch, TEXT_LEN)), jnp.int32)
        text_lens = jnp.full((batch,), TEXT_LEN, jnp.int32)
        nb = int(os.environ.get("BEAM", "1"))
        gen = GenerationConfig(do_sample=nb == 1, num_beams=nb, top_k=30, max_new_tokens=gen_tokens)
        quant_kv = os.environ.get("QUANT_KV", "0") == "1"
        if nb > 1:
            from indextts_tpu.models.gpt_decode import generate_speech_beam

            fn = jax.jit(
                lambda p, c, t, tl, r: generate_speech_beam(
                    p, gpt_cfg, gen, c, t, tl, r,
                    temperature=jnp.float32(1.0), top_p=jnp.float32(0.8),
                    repetition_penalty=jnp.float32(10.0), quant_kv=quant_kv,
                )[1].sum()
            )
        else:
            fn = jax.jit(
                lambda p, c, t, tl, r: generate_speech(
                    p, gpt_cfg, gen, c, t, tl, r,
                    temperature=jnp.float32(1.0), top_p=jnp.float32(0.8),
                    repetition_penalty=jnp.float32(10.0), quant_kv=quant_kv,
                )[1].sum()
            )
        t0 = time.perf_counter()
        int(fn(params, conds, text, text_lens, jax.random.PRNGKey(1)))
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            int(fn(params, conds, text, text_lens, jax.random.PRNGKey(2 + i)))
            times.append(time.perf_counter() - t0)
        wall = float(np.median(times))
        ms_step = 1000 * wall / gen_tokens
        # cache: [L, B*nb, H, S, Dh] x2, S = prefill + gen_tokens; beams
        # multiply the rows and int8 KV (QUANT_KV) halves bytes/elem — the
        # printed floor must describe the config actually being measured
        p_len = gpt_cfg.condition_num_latent + TEXT_LEN + 2 + 1
        s_len = p_len + gen_tokens
        bytes_per_elem = 1 if quant_kv else 2
        cache_bytes = (gpt_cfg.layers * batch * nb * gpt_cfg.heads * s_len
                       * (d // gpt_cfg.heads) * 2 * bytes_per_elem)
        floor_ms = 1000 * (weight_bytes + cache_bytes) / (HBM_GBS * 1e9)
        print(
            f"B={batch:3d} gen={gen_tokens:4d}: {ms_step:6.2f} ms/step "
            f"(cache {cache_bytes/1e6:5.0f} MB, hbm floor {floor_ms:.2f} ms, "
            f"ratio {ms_step/floor_ms:.2f}x, compile {compile_s:.0f}s, "
            f"audio-s/s {batch*gen_tokens*1024/24000/wall:.1f})"
        )
        return ms_step

    batches = [int(x) for x in os.environ.get("BATCHES", "8,16,32,1").split(",")]
    for bsz in batches:
        run_case(bsz, GEN_TOKENS)


if __name__ == "__main__":
    main()
