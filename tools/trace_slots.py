"""Trace one slot_steps chunk (serving config) and print the top XLA ops.

Attribution target (round-4 verdict #4): slot steady-state decode costs
~3.3 ms/step at 8 slots vs the window batcher's ~2.35 — WHERE does the
~0.9 ms/step go? Stated cause is the statically-sized circular cache read
(serving.py), but the step also carries per-row position gathers, the
latent-capture buffer write, mask updates, and codes/seen scatters that the
linear decode shapes differently. Same xplane method as trace_decode.py.

Run: timeout 580 python tools/trace_slots.py
Knobs: SLOTS (8), CHUNK (25), GEN (200), TEXT_LEN (64), QUANT (1), CAP (1).
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

SLOTS = int(os.environ.get("SLOTS", 8))
CHUNK = int(os.environ.get("CHUNK", 25))
GEN = int(os.environ.get("GEN", 200))
TEXT_LEN = int(os.environ.get("TEXT_LEN", 64))
COND_FRAMES = 300
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/slot_trace")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from functools import partial

    from indextts_tpu.config import load_config
    from indextts_tpu.models.gpt import get_conditioning, init_unified_voice
    from indextts_tpu.models.gpt_decode import GenerationConfig
    from indextts_tpu.models.gpt_slots import (
        slot_admit, slot_prefill, slot_state_init, slot_steps)

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", "configs", "indextts_1_5.yaml"))
    gpt_cfg = cfg.gpt
    dtype = jnp.bfloat16
    quant = os.environ.get("QUANT", "1") == "1"
    cap = os.environ.get("CAP", "1") == "1"
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
    text = jnp.asarray(npr.integers(2, 8000, (SLOTS, TEXT_LEN)), jnp.int32)
    text_lens = jnp.full((SLOTS,), TEXT_LEN, jnp.int32)
    conds = jax.jit(lambda p, m, l: get_conditioning(p, gpt_cfg, m, l))(
        params, cond_mel, jnp.asarray([COND_FRAMES]))

    gen = GenerationConfig(do_sample=True, num_beams=1, top_k=30,
                           max_new_tokens=GEN)
    pos_off = 1 if cap else 2
    prefill = jax.jit(partial(slot_prefill, cfg=gpt_cfg, gen=gen,
                              capture_latents=cap, quant_kv=quant))
    admit = jax.jit(partial(slot_admit, cfg=gpt_cfg), donate_argnames=("state",))
    steps = jax.jit(partial(slot_steps, cfg=gpt_cfg, gen=gen, n_steps=CHUNK,
                            pos_off=pos_off), donate_argnames=("state",))
    sargs = dict(temperature=jnp.float32(1.0), top_p=jnp.float32(0.8),
                 repetition_penalty=jnp.float32(10.0),
                 typical_mass=jnp.float32(0.9))
    prods = [prefill(params=params, conds=conds, text_tokens=text[i:i + 1],
                     text_lengths=text_lens[i:i + 1],
                     rng=jax.random.PRNGKey(80 + i), **sargs)
             for i in range(SLOTS)]
    p_len = prods[0]["prefill_mask"].shape[1]
    s_len = -(-(p_len + GEN) // 64) * 64
    print(f"p={p_len} S={s_len} quant={quant} cap={cap}")
    state = slot_state_init(gpt_cfg, gen, SLOTS, s_len, dtype,
                            capture_latents=cap, quant_kv=quant)
    for i, prod in enumerate(prods):
        state = admit(state, prod, i)
    state = steps(params=params, state=state, rng=jax.random.PRNGKey(90), **sargs)
    np.asarray(state.tick)  # compile + first chunk
    walls = []
    for it in range(4):
        t0 = time.perf_counter()
        state = steps(params=params, state=state,
                      rng=jax.random.PRNGKey(91 + it), **sargs)
        np.asarray(state.tick)
        walls.append(time.perf_counter() - t0)
    print(f"steady: {1000*float(np.median(walls))/CHUNK:.2f} ms/step "
          f"({[round(w*1000,1) for w in walls]} ms/chunk)")

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        state = steps(params=params, state=state,
                      rng=jax.random.PRNGKey(99), **sargs)
        np.asarray(state.tick)

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
            print(f"\n=== {plane.name} / {line.name} (sum {tot/1e12*1000:.1f} ms"
                  f" = {tot/1e12*1000/CHUNK:.3f} ms/step) ===")
            for name, ps in sorted(total_by_name.items(), key=lambda kv: -kv[1])[:35]:
                print(f"  {ps/1e9:9.2f} ms  x{count_by_name[name]:<5d} {name[:120]}")


if __name__ == "__main__":
    main()
