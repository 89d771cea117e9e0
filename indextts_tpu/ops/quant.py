"""Int8 weight-only quantization for the serving decode path.

The AR decode is weight-streaming bound (every step reads the full GPT stack
from HBM); storing matmul weights as per-output-channel int8 halves that
traffic vs bf16. Activations stay bf16/f32 — weights are dequantized in
registers/VMEM inside the matmul fusion, so HBM sees only int8. Opt-in
(quality-accuracy trade-off is the caller's): engine flag / BENCH_INT8.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-output-channel symmetric int8: w ≈ q * scale. Input is [Din, Dout]
    or layer-stacked [L, Din, Dout]; scales keep the stack and output axes."""
    wf = jnp.asarray(w, jnp.float32)
    reduce_axes = (-2,)  # the input-feature axis
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"weight": q, "scale": scale.astype(jnp.float32)}


import os

# trace-time toggle: route int8 matmuls through the Pallas streaming kernel
PALLAS_INT8 = os.environ.get("INDEXTTS_PALLAS_INT8", "0") == "1"


def matmul_maybe_quantized(
    x: jnp.ndarray, wp: Dict[str, Any], bias_key: str = "bias", use_pallas: Optional[bool] = None
) -> jnp.ndarray:
    """x @ W (+ b) where wp holds either a plain weight or {weight:int8, scale}.
    With use_pallas, 2D int8 matmuls route through the Pallas kernel that
    streams weights from HBM as int8 (ops/pallas/qmatmul.py)."""
    if use_pallas is None:
        use_pallas = PALLAS_INT8
    w = wp["weight"]
    if "scale" in wp and w.dtype == jnp.int8:
        if use_pallas and x.ndim == 2 and w.ndim == 2:
            from indextts_tpu.ops.pallas.qmatmul import int8_matmul

            return int8_matmul(
                x, w, wp["scale"], bias=wp.get(bias_key),
                interpret=jax.default_backend() == "cpu",
            )
        w = w.astype(x.dtype) * wp["scale"].astype(x.dtype)
    else:
        w = w.astype(x.dtype)
    out = x @ w
    if bias_key in wp and wp[bias_key] is not None:
        out = out + wp[bias_key].astype(out.dtype)
    return out


_QUANT_TARGETS = ("attn_qkv", "attn_proj", "mlp_fc", "mlp_proj")


def quantize_gpt_blocks(gpt_params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the stacked GPT-2 block matmuls (the decode-bandwidth bulk).
    Norms, biases, embeddings, and heads stay in their original dtype."""
    blocks = dict(gpt_params["blocks"])
    for name in _QUANT_TARGETS:
        wp = dict(blocks[name])
        qd = quantize_weight(wp["weight"])
        wp["weight"] = qd["weight"]
        wp["scale"] = qd["scale"]
        blocks[name] = wp
    out = dict(gpt_params)
    out["blocks"] = blocks
    return out


def quantize_unified_voice(params: Dict[str, Any], include_head: bool = True) -> Dict[str, Any]:
    out = dict(params)
    out["gpt"] = dict(params["gpt"])
    out["gpt"]["blocks"] = quantize_gpt_blocks(params["gpt"])["blocks"]
    if include_head:
        head = dict(params["mel_head"])
        qd = quantize_weight(head["weight"])
        head["weight"] = qd["weight"]
        head["scale"] = qd["scale"]
        out["mel_head"] = head
    return out
