"""Dump the optimized HLO of the greedy decode executable and print the
definitions of the ops the xplane trace (tools/trace_decode.py) blames —
e.g. add_add_fusion.6 at 0.87 ms/step ([8,1280] output, 36 us per
layer-step: far beyond its data size, so its fused computation must be
reading something big or stalling on it).

Run: timeout 580 python tools/dump_decode_hlo.py [op_name_substr ...]
Writes the full text to /tmp/decode_hlo.txt for ad-hoc grepping.
"""

import os
import sys

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
    from indextts_tpu.models.gpt_decode import GenerationConfig, generate_speech

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs", "indextts_1_5.yaml"))
    gpt_cfg = cfg.gpt
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(lambda: init_unified_voice(jax.random.PRNGKey(0), gpt_cfg))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype),
        shapes,
    )
    npr = np.random.default_rng(0)
    text = jnp.asarray(npr.integers(2, 8000, (BATCH, TEXT_LEN)), jnp.int32)
    text_lens = jnp.full((BATCH,), TEXT_LEN, jnp.int32)
    conds_b = jnp.zeros((BATCH, gpt_cfg.condition_num_latent, gpt_cfg.model_dim), dtype)

    gen_b = GenerationConfig(do_sample=True, num_beams=1, top_k=30, max_new_tokens=GEN_TOKENS)
    quant = os.environ.get("TRACE_QUANT", "0") == "1"
    fn = jax.jit(partial(generate_speech, cfg=gpt_cfg, gen=gen_b, quant_kv=quant))
    lowered = fn.lower(
        params=params, conds=conds_b, text_tokens=text, text_lengths=text_lens,
        rng=jax.random.PRNGKey(0), temperature=jnp.float32(1.0),
        top_p=jnp.float32(0.8), repetition_penalty=jnp.float32(10.0),
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = "/tmp/decode_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {out}", file=sys.stderr)

    wanted = sys.argv[1:] or ["add_add_fusion", "fusion.385", "copy-start.2"]
    lines = txt.splitlines()
    # print each wanted op's definition line and, for fusions, the fused
    # computation body (calls=...)
    import re

    for w in wanted:
        for i, ln in enumerate(lines):
            s = ln.lstrip()
            if s.startswith("%" + w) or re.match(rf"%{re.escape(w)}[ .=]", s):
                print("\n=== def:", ln.strip()[:400])
                m = re.search(r"calls=%?([\w.\-]+)", ln)
                if m:
                    body = m.group(1)
                    inb = False
                    for ln2 in lines:
                        if re.match(rf"\s*%?{re.escape(body)}\b", ln2) and "{" in ln2:
                            inb = True
                        if inb:
                            print("   ", ln2.rstrip()[:300])
                            if ln2.rstrip().endswith("}"):
                                break
                break


if __name__ == "__main__":
    main()
