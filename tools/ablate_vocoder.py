"""In-graph vocoder ablation: full bigvgan_apply exec time under the current
routing vs INDEXTTS_WIDE_PHASE=1 (phase-space wide activations).

Compiles the SAME jit signature as bench.py's voc_fn so the persistent cache
can hit. Timing: in-graph scalar reduce via a separate tiny jit + float()
fetch (docs/PERF.md methodology).

Run: INDEXTTS_WIDE_PHASE=0|1 timeout 590 python tools/ablate_vocoder.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 8))
GEN_TOKENS = int(os.environ.get("BENCH_GEN_TOKENS", 200))


def mark(m):
    print(f"[+{time.perf_counter() - T0:.0f}s] {m}", flush=True)


T0 = time.perf_counter()


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import indextts_tpu.models.bigvgan as bv
    from indextts_tpu.config import load_config

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs", "indextts_1_5.yaml"))
    h = cfg.bigvgan
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(lambda: bv.init_bigvgan(jax.random.PRNGKey(0), h))

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
    latent = jnp.asarray(npr.standard_normal((BATCH, GEN_TOKENS, h.gpt_dim)), dtype)
    mel_ref = jnp.asarray(npr.standard_normal((BATCH, 300, h.num_mels)), dtype)
    mark("inputs ready")

    if os.environ.get("INDEXTTS_ABLATE_PRESPK", "") == "1":
        # how much of the iter is the per-call ECAPA recompute: precompute
        # the speaker embedding once (the engine-level amortization
        # bigvgan_apply's docstring describes) and pass it in
        from indextts_tpu.models.ecapa import ecapa_apply

        spk = jax.jit(lambda p, m: ecapa_apply(p["speaker_encoder"], m))(params, mel_ref)
        spk = jax.block_until_ready(spk)
        fn = jax.jit(lambda p, lat, m, s: bv.bigvgan_apply(p, h, lat, m, speaker_embedding=s))
        call = lambda lat: fn(params, lat, mel_ref, spk)
    else:
        fn = jax.jit(lambda p, lat, m: bv.bigvgan_apply(p, h, lat, m))
        call = lambda lat: fn(params, lat, mel_ref)
    red = jax.jit(lambda w: jnp.sum(w.astype(jnp.float32)))
    float(red(call(latent)))
    mark(f"compiled (WIDE_PHASE={os.environ.get('INDEXTTS_WIDE_PHASE', '0')})")
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        float(red(call(latent + jnp.asarray(0.0001 * i, dtype))))
        times.append(time.perf_counter() - t0)
    mark(f"exec ms per iter: {[round(1e3 * t, 1) for t in times]} (incl. ~32ms dispatch+reduce)")


if __name__ == "__main__":
    main()
