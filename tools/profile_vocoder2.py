"""Vocoder timing, tunnel-proof variant: every timed call reduces to a scalar
in-graph and fetches it (float()), so the measurement can't complete until the
device finished the whole graph. Inputs vary per iteration to defeat any
result caching in the remote-execution path.

(tools/profile_vocoder.py showed 0.5 ms via block_until_ready — physically
impossible for an ~11 TFLOP graph on a ~200 TFLOP/s chip, so
block_until_ready on this tunneled platform returns before remote execution
completes. CLAUDE.md's "micro-benchmarks are unreliable here" made concrete.)
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

    def bench(name, apply_fn, iters=3):
        fn = jax.jit(lambda p, l, m: apply_fn(p, l, m).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        float(fn(params, latent, mel_ref))
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(iters):
            lat_i = latent + jnp.float32(i * 1e-3).astype(dtype)
            t0 = time.perf_counter()
            float(fn(params, lat_i, mel_ref))
            times.append(time.perf_counter() - t0)
        ms = 1000 * float(np.median(times))
        print(f"{name:14s}: {ms:8.1f} ms   (compile {compile_s:.1f}s, all {[round(1000*t,1) for t in times]})")
        return ms

    results = {}
    results["full"] = bench("full", lambda p, l, m: bv.bigvgan_apply(p, h, l, m))

    orig_activation = bv._activation

    def plain_activation(p_act, x, hh, use_pallas=False):
        if hh.activation == "snakebeta":
            return snake_beta(x, p_act["alpha"], p_act["beta"], hh.snake_logscale)
        return snake(x, p_act["alpha"], hh.snake_logscale)

    bv._activation = plain_activation
    results["plain_snake"] = bench("plain_snake", lambda p, l, m: bv.bigvgan_apply(p, h, l, m))

    bv._activation = lambda p_act, x, hh, use_pallas=False: x
    results["convs_only"] = bench("convs_only", lambda p, l, m: bv.bigvgan_apply(p, h, l, m))
    bv._activation = orig_activation

    if platform == "tpu" and os.environ.get("SKIP_PALLAS", "0") != "1":
        try:
            results["pallas"] = bench("pallas", lambda p, l, m: bv.bigvgan_apply(p, h, l, m, use_pallas=True))
        except Exception as e:
            print("pallas failed:", e)

    anti_alias = results.get("full", 0) - results.get("plain_snake", 0)
    act_cost = results.get("plain_snake", 0) - results.get("convs_only", 0)
    print(f"\nderived: anti-alias resampling ~{anti_alias:.0f} ms, "
          f"snake itself ~{act_cost:.0f} ms, convs ~{results.get('convs_only', 0):.0f} ms")


if __name__ == "__main__":
    main()
