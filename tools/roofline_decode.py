"""Decode-step HBM roofline calibration (round-4 verdict #3).

CLAUDE.md carries a "1.43 ms/step weight-streaming floor" for the B=8 greedy
decode (2.45 ms/step measured) — but that floor divides 1171 MB of bf16
weights by the v5e's THEORETICAL 819 GB/s HBM peak, and nothing ever measured
what this chip actually sustains on the decode step's real access pattern
(stacked-layer scan, [24, D, 3D/4D] weight blocks, head-paired KV caches).
This tool measures achievable bandwidth with the decode step's OWN shapes:

- stream_full:   lax.scan of the production `_decode_block` over the real
                 stacked blocks + bf16 caches, plus the mel-head matmul —
                 i.e. the decode step's memory traffic with its real compute,
                 minus sampling/embedding/cache-update/while_loop overhead.
- weights_only:  same scan with the cache attention elided (reads weights
                 only) — the pure weight-streaming time.
- cache_only:    same scan with the weight matmuls elided (reads k2/v2 only).
- *_q variants:  int8 cache (quant_kv serving mode) where applicable.

Methodology (docs/PERF.md): chain N dependent applications of the step in
ONE jit, in-graph scalar reduce + float() fetch; slope = (tN2-tN1)/(N2-N1).
The chained x changes every application, so constant caches/weights cannot
be CSE'd out of later applications' matmuls/einsums.

Verdict rule (VERDICT r4 #3): if stream_full lands well under the measured
2.45 ms/step, the gap is addressable overhead — attack; if it lands near it,
decode is certified memory-bound at the measured fraction of the ACHIEVABLE
(not theoretical) bound. Reference hot loop: model.py:115-192.

Run: timeout 580 python tools/roofline_decode.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

N1, N2 = int(os.environ.get("N1", 2)), int(os.environ.get("N2", 10))
B = int(os.environ.get("ROOF_BATCH", 8))
S = int(os.environ.get("ROOF_S", 320))  # cache_len for the GEN_TOKENS=200 bench shape


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("ROOF_CPU", "0") == "1":
        # the sitecustomize pins JAX_PLATFORMS=axon; env vars alone cannot
        # force CPU on this host (CLAUDE.md) — only this config update can
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", "/root/.cache/indextts_bench/xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from indextts_tpu.config import load_config
    from indextts_tpu.models.gpt import init_gpt2_blocks
    from indextts_tpu.models.gpt_decode import _decode_block, _decode_block_q, _quant_cols
    from indextts_tpu.ops.quant import matmul_maybe_quantized

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", "configs", "indextts_1_5.yaml")).gpt
    L, D, H = cfg.layers, cfg.model_dim, cfg.heads
    # tiny-shape smoke-test knobs (CPU CI); flagship shapes by default
    L = int(os.environ.get("ROOF_LAYERS", L))
    D = int(os.environ.get("ROOF_DIM", D))
    H = int(os.environ.get("ROOF_HEADS", H))
    import dataclasses
    cfg = dataclasses.replace(cfg, layers=L, model_dim=D, heads=H)
    dh = D // H
    dtype = jnp.bfloat16
    npr = np.random.default_rng(0)

    # real stacked-block shapes, fast deterministic values (values are
    # irrelevant for wall-clock; threefry init of 500M params costs minutes)
    shapes = jax.eval_shape(lambda: init_gpt2_blocks(jax.random.PRNGKey(0), L, D))

    @jax.jit
    def build_blocks():
        def mk(path, s):
            n = int(np.prod(s.shape)) if s.shape else 1
            i = jax.lax.broadcasted_iota(jnp.float32, (max(n, 1),), 0)
            return (0.02 * jnp.sin(i * 0.37 + 1.0)).reshape(s.shape).astype(dtype)
        return jax.tree_util.tree_map_with_path(mk, shapes)

    blocks = build_blocks()
    head_w = jnp.asarray(0.02 * npr.standard_normal((D, cfg.number_mel_codes)), dtype)
    k2 = jnp.asarray(0.1 * npr.standard_normal((L, B, H // 2, S, 2 * dh)), dtype)
    v2 = jnp.asarray(0.1 * npr.standard_normal((L, B, H // 2, S, 2 * dh)), dtype)
    k8, ks = jax.jit(_quant_cols)(k2)
    v8, vs = jax.jit(_quant_cols)(v2)
    bias = jnp.zeros((B, 1, S), jnp.float32)
    x0 = jnp.asarray(0.1 * npr.standard_normal((B, D)), dtype)

    weight_bytes = sum(int(np.prod(x.shape)) * 2
                       for x in jax.tree_util.tree_leaves(blocks))
    head_bytes = int(np.prod(head_w.shape)) * 2
    cache_bytes = 2 * int(np.prod(k2.shape)) * 2  # k2+v2, bf16
    cache_bytes_q = 2 * int(np.prod(k8.shape)) + 2 * int(np.prod(ks.shape)) * 4
    print(f"L={L} D={D} H={H} B={B} S={S}  weights {weight_bytes/1e6:.0f} MB "
          f"+ head {head_bytes/1e6:.0f} MB, cache bf16 {cache_bytes/1e6:.0f} MB "
          f"int8 {cache_bytes_q/1e6:.0f} MB", flush=True)

    # NB: every operand rides as a jit ARGUMENT — a closed-over device
    # array becomes an HLO constant and the 945 MB of weights blow the
    # remote compiler's request-size limit (HTTP 413, measured)

    def step_full(x, blocks, k2, v2, head_w):
        def body(x, layer):
            layer_p, k2c, v2c = layer
            out, _ = _decode_block(layer_p, x, k2c, v2c, bias, H)
            return out, None
        x, _ = jax.lax.scan(body, x, (blocks, k2, v2))
        logits = (x @ head_w).astype(jnp.float32)
        # fold logits back so chained applications stay [B, D] and dependent
        return x * (1.0 + 1e-6 * jnp.tanh(jnp.sum(logits, axis=-1, keepdims=True) * 1e-6)).astype(dtype)

    def step_full_q(x, blocks, k8, ks, v8, vs, head_w):
        def body(x, layer):
            layer_p, k8c, ksc, v8c, vsc = layer
            out, _ = _decode_block_q(layer_p, x, k8c, ksc, v8c, vsc, bias, H)
            return out, None
        x, _ = jax.lax.scan(body, x, (blocks, k8, ks, v8, vs))
        logits = (x @ head_w).astype(jnp.float32)
        return x * (1.0 + 1e-6 * jnp.tanh(jnp.sum(logits, axis=-1, keepdims=True) * 1e-6)).astype(dtype)

    def step_weights_only(x, blocks, head_w):
        """The _decode_block weight matmuls with the cache attention elided:
        reads ONLY the stacked weights (+ mel head)."""
        def body(x, layer_p):
            h = x  # LN elided (reads no HBM beyond [L, D] vectors)
            qkv = matmul_maybe_quantized(h, layer_p["attn_qkv"])
            q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
            a = matmul_maybe_quantized(q * jnp.mean(k_new) + v_new,
                                       layer_p["attn_proj"])
            x = x + a
            h = matmul_maybe_quantized(x, layer_p["mlp_fc"])
            h = matmul_maybe_quantized(jax.nn.gelu(h), layer_p["mlp_proj"])
            return x + h, None
        x, _ = jax.lax.scan(body, x, blocks)
        logits = (x @ head_w).astype(jnp.float32)
        return x * (1.0 + 1e-6 * jnp.tanh(jnp.sum(logits, axis=-1, keepdims=True) * 1e-6)).astype(dtype)

    def step_cache_only(x, k2, v2):
        """The _decode_block attention einsums with the weight matmuls
        elided: reads ONLY the bf16 k2/v2 caches."""
        g2 = H // 2
        def body(x, layer):
            k2c, v2c = layer
            q = x.reshape(B, g2, 2, dh)
            q = jnp.concatenate([q, q], axis=-1)  # [B, H/2, 2, 2Dh]
            s2 = jnp.einsum("bgtd,bgsd->bgts", q, k2c).astype(jnp.float32)
            a2 = jax.nn.softmax(s2, axis=-1).astype(x.dtype)
            o2 = jnp.einsum("bgts,bgsd->bgtd", a2, v2c)  # [B, H/2, 2, 2Dh]
            return x + 1e-3 * o2[..., :dh].reshape(B, D), None
        x, _ = jax.lax.scan(body, x, (k2, v2))
        return x

    def slope(fn, x, operands):
        def chain(n):
            @jax.jit
            def run(y, *ops):
                for _ in range(n):
                    y = fn(y, *ops)
                return jnp.sum(y.astype(jnp.float32))
            return run

        r1, r2 = chain(N1), chain(N2)
        float(r1(x, *operands))  # compile
        float(r2(x, *operands))
        t = {}
        for name, r in (("n1", r1), ("n2", r2)):
            samples = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(r(x, *operands))
                samples.append(time.perf_counter() - t0)
            t[name] = float(np.median(samples))
        return (t["n2"] - t["n1"]) / (N2 - N1)

    variants = [
        ("weights_only", step_weights_only, (blocks, head_w),
         weight_bytes + head_bytes),
        ("cache_only", step_cache_only, (k2, v2), cache_bytes),
        ("stream_full", step_full, (blocks, k2, v2, head_w),
         weight_bytes + head_bytes + cache_bytes),
        ("stream_full_q", step_full_q, (blocks, k8, ks, v8, vs, head_w),
         weight_bytes + head_bytes + cache_bytes_q),
    ]
    results = {}
    for tag, fn, operands, nbytes in variants:
        try:
            t = slope(fn, x0, operands)
            results[tag] = {"ms_per_op": round(t * 1e3, 3),
                            "read_mb": round(nbytes / 1e6, 1),
                            "gb_per_s": round(nbytes / t / 1e9, 1)}
            print(f"{tag:16s} {t*1e3:7.3f} ms/op  {nbytes/1e6:7.0f} MB  "
                  f"{nbytes/t/1e9:6.1f} GB/s", flush=True)
        except Exception as e:
            results[tag] = {"error": repr(e)[:200]}
            print(f"{tag}: ERR {e}", flush=True)

    # measured decode step for comparison (bench extras' decode_ms_per_step)
    try:
        with open("/root/.cache/indextts_bench/results.json") as f:
            dec = json.load(f).get("decode_ms_per_step", {}).get("value")
    except OSError:
        dec = None
    results["measured_decode_ms_per_step"] = dec
    if dec and "ms_per_op" in results.get("stream_full", {}):
        results["decode_pct_of_shape_bound"] = round(
            100.0 * results["stream_full"]["ms_per_op"] / dec, 1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
