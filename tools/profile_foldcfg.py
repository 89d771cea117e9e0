"""Sweep stage-fold configurations of the BigVGAN folded execution and time
the full vocoder graph for each (one process, sequential compiles).

Each config is (max_channels, {channels: s}) — _FOLDED_MAX_CHANNELS override
plus explicit per-width fold factors (falling back to the pow2>=128 rule).

Run: timeout 580 python tools/profile_foldcfg.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 8))
GEN_TOKENS = int(os.environ.get("BENCH_GEN_TOKENS", 200))

CONFIGS = [
    ("baseline s128 max96", 96, {}),
    ("max192 (192->s1)", 192, {192: 1}),
    ("max192 192->s2", 192, {192: 2}),
    ("half-s: 24:4 48:2 96:1", 96, {24: 4, 48: 2, 96: 1}),
    ("max384 (384->s1 192->s1)", 384, {384: 1, 192: 1}),
]


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.config import load_config
    import indextts_tpu.models.bigvgan as bv

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
    mel_ref = jnp.asarray(npr.standard_normal((BATCH, 300, h.num_mels)), dtype)

    base_rule = bv._stage_fold

    for name, maxc, smap in CONFIGS:
        bv._FOLDED_MAX_CHANNELS = maxc

        def rule(channels, t, _smap=smap, _maxc=maxc):
            if channels > _maxc:
                return 1
            if channels in _smap:
                s = _smap[channels]
                while s > 1 and t % s:
                    s //= 2
                return s
            s = 1
            while s * channels < 128:
                s *= 2
            while s > 1 and t % s:
                s //= 2
            return s

        bv._stage_fold = rule
        fn = jax.jit(lambda p, l, m: bv.bigvgan_apply(p, h, l, m).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        float(fn(params, latent, mel_ref))
        tc = time.perf_counter() - t0
        ts = []
        for i in range(3):
            li = latent + jnp.asarray(0.001 * (i + 1), dtype)
            t0 = time.perf_counter()
            float(fn(params, li, mel_ref))
            ts.append(time.perf_counter() - t0)
        print(f"  {name:28s}: {1000*float(np.median(ts)):7.1f} ms  (compile {tc:.0f}s, all {[round(1000*x,1) for x in ts]})")

    bv._stage_fold = base_rule


if __name__ == "__main__":
    main()
