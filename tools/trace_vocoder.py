"""Capture a jax profiler trace of one full-vocoder execution and print the
top ops by self-time from the xplane (device plane).

Run: timeout 580 python tools/trace_vocoder.py
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 8))
GEN_TOKENS = int(os.environ.get("BENCH_GEN_TOKENS", 200))
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/voc_trace")


def main():
    import jax
    import jax.numpy as jnp

    # share the bench's persistent compile cache — the full-vocoder compile
    # is minutes on the remote compiler and bench.py compiles the same graph
    jax.config.update(
        "jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from indextts_tpu.config import load_config
    import indextts_tpu.models.bigvgan as bv

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs", "indextts_1_5.yaml"))
    h = cfg.bigvgan
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    print(f"platform={platform}")

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

    # EXACTLY the bench's voc_fn HLO so the persistent compile cache hits
    # (adding an in-graph .sum() changes the executable -> minutes recompile);
    # completion is observed through a separate tiny jitted sum
    fn = jax.jit(lambda p, l, m: bv.bigvgan_apply(p, h, l, m))
    red = jax.jit(lambda w: jnp.sum(w.astype(jnp.float32)))
    float(red(fn(params, latent, mel_ref)))  # compile
    t0 = time.perf_counter()
    float(red(fn(params, latent, mel_ref)))
    print(f"exec: {1000*(time.perf_counter()-t0):.0f} ms (incl. reduce+fetch)")

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        float(red(fn(params, latent + jnp.asarray(0.001, dtype), mel_ref)))

    paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths)
    if not paths:
        return

    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        total_by_name = {}
        for line in plane.lines:
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                name = meta.name
                total_by_name[name] = total_by_name.get(name, 0) + ev.duration_ps
        if not total_by_name:
            continue
        tot = sum(total_by_name.values())
        print(f"\n=== plane: {plane.name} (sum {tot/1e12*1000:.1f} ms over lines) ===")
        for name, ps in sorted(total_by_name.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {ps/1e9:9.2f} ms  {name[:140]}")


if __name__ == "__main__":
    main()
