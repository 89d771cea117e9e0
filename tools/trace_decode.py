"""Capture a jax profiler trace of one GREEDY batch-8 decode and print the
top ops by self-time from the xplane "XLA Ops" line (the only line with
non-overlapping durations, per docs/PERF.md). TRACE_QUANT=1 traces the int8
KV-cache (quant_kv) decode instead. Attribution target: the ~1.0 ms/step gap
between the measured 2.45 ms/step and the 1.43 ms/step weight-streaming
floor (docs/PERF.md "Decode").

Run: timeout 580 python tools/trace_decode.py
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 8))
GEN_TOKENS = int(os.environ.get("BENCH_GEN_TOKENS", 200))
TEXT_LEN = int(os.environ.get("BENCH_TEXT_LEN", 64))
COND_FRAMES = int(os.environ.get("BENCH_COND_FRAMES", 300))
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/greedy_trace")


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

    gen_b = GenerationConfig(do_sample=True, num_beams=1, top_k=30,
                             max_new_tokens=GEN_TOKENS)
    quant = os.environ.get("TRACE_QUANT", "0") == "1"
    beam_fn = jax.jit(partial(generate_speech, cfg=gpt_cfg, gen=gen_b, quant_kv=quant))

    def once(key):
        codes, lens = beam_fn(
            params=params, conds=conds_b, text_tokens=text, text_lengths=text_lens,
            rng=key, temperature=jnp.float32(1.0), top_p=jnp.float32(0.8),
            repetition_penalty=jnp.float32(10.0),
        )
        return float((codes.sum() + lens.sum()).astype(jnp.float32))

    once(jax.random.PRNGKey(0))  # compile
    t0 = time.perf_counter()
    once(jax.random.PRNGKey(1))
    print(f"exec: {1000*(time.perf_counter()-t0):.0f} ms")

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        once(jax.random.PRNGKey(2))

    paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane")
        return

    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            total_by_name = {}
            count_by_name = {}
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                total_by_name[meta.name] = total_by_name.get(meta.name, 0) + ev.duration_ps
                count_by_name[meta.name] = count_by_name.get(meta.name, 0) + 1
            tot = sum(total_by_name.values())
            print(f"\n=== {plane.name} / {line.name} (sum {tot/1e12*1000:.1f} ms) ===")
            for name, ps in sorted(total_by_name.items(), key=lambda kv: -kv[1])[:35]:
                print(f"  {ps/1e9:9.2f} ms  x{count_by_name[name]:<5d} {name[:120]}")


if __name__ == "__main__":
    main()
