"""Vocoder cost decomposition on the real TPU (VERDICT round-1 weak #2).

STALE METHODOLOGY — numbers from this tool are NOT trustworthy on the axon
platform: it times via block_until_ready(), which can return before remote
execution finishes (CLAUDE.md "Timing methodology": an 815 ms graph
"measured" 0.5 ms this way). Use tools/profile_vocoder2.py (in-graph scalar
reduce + float() fetch) — this file is kept only as the historical artifact
behind PERF.md's round-1 numbers.

Times the BigVGAN generator at the bench configuration (batch 8, 200 codes ->
204800 samples/row) in several ablations to locate where the ~800 ms/iter
goes:

  full        — bigvgan_apply as benched (composed anti-alias activations)
  plain_snake — anti-alias up/down removed (snake only): isolates the
                anti-alias resampling cost
  pallas      — fused Pallas anti-alias kernel path
  convs_only  — activations replaced by identity: isolates the conv stack

Optionally captures a jax profiler trace of the full vocoder
(PROFILE_TRACE=1 -> /tmp/voc_trace).

Run: timeout 580 python tools/profile_vocoder.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 8))
GEN_TOKENS = int(os.environ.get("BENCH_GEN_TOKENS", 200))
COND_FRAMES = int(os.environ.get("BENCH_COND_FRAMES", 300))


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.config import load_config
    import indextts_tpu.models.bigvgan as bv
    from indextts_tpu.ops.activations import snake, snake_beta

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs", "indextts_1_5.yaml"))
    h = cfg.bigvgan
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform} dtype={dtype.__name__} batch={BATCH} codes={GEN_TOKENS}")

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
    mel_ref = jnp.asarray(npr.standard_normal((BATCH, COND_FRAMES, h.num_mels)), dtype)

    def bench(name, fn, iters=4):
        t0 = time.perf_counter()
        out = fn(params, latent, mel_ref)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(params, latent, mel_ref).block_until_ready()
            times.append(time.perf_counter() - t0)
        ms = 1000 * float(np.median(times))
        print(f"{name:14s}: {ms:8.1f} ms   (compile {compile_s:.1f}s)")
        return ms

    results = {}

    # 1. full composed path
    full_fn = jax.jit(lambda p, l, m: bv.bigvgan_apply(p, h, l, m))
    results["full"] = bench("full", full_fn)

    # 2. plain snake (no anti-alias up/down)
    orig_activation = bv._activation

    def plain_activation(p_act, x, hh, use_pallas=False):
        if hh.activation == "snakebeta":
            return snake_beta(x, p_act["alpha"], p_act["beta"], hh.snake_logscale)
        return snake(x, p_act["alpha"], hh.snake_logscale)

    bv._activation = plain_activation
    plain_fn = jax.jit(lambda p, l, m: bv.bigvgan_apply(p, h, l, m))
    results["plain_snake"] = bench("plain_snake", plain_fn)

    # 3. identity activations (convs only)
    bv._activation = lambda p_act, x, hh, use_pallas=False: x
    convs_fn = jax.jit(lambda p, l, m: bv.bigvgan_apply(p, h, l, m))
    results["convs_only"] = bench("convs_only", convs_fn)
    bv._activation = orig_activation

    # 4. pallas fused anti-alias
    if platform == "tpu":
        pallas_fn = jax.jit(lambda p, l, m: bv.bigvgan_apply(p, h, l, m, use_pallas=True))
        try:
            results["pallas"] = bench("pallas", pallas_fn)
        except Exception as e:
            print("pallas failed:", e)

    anti_alias = results.get("full", 0) - results.get("plain_snake", 0)
    act_cost = results.get("plain_snake", 0) - results.get("convs_only", 0)
    print(f"\nderived: anti-alias resampling ~{anti_alias:.0f} ms, "
          f"snake itself ~{act_cost:.0f} ms, convs ~{results.get('convs_only', 0):.0f} ms")

    if os.environ.get("PROFILE_TRACE", "0") == "1":
        with jax.profiler.trace("/tmp/voc_trace"):
            full_fn(params, latent, mel_ref).block_until_ready()
        print("trace written to /tmp/voc_trace")


if __name__ == "__main__":
    main()
