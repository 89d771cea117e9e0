"""Perceiver resampler: variable-length conditioning -> fixed 32 latents.

Behavioral reference: indextts/gpt/perceiver.py:224-317 — learned latents
cross-attend to the (projected) conditioning sequence with the queries
included in the context (perceiver.py:308-309), GEGLU feed-forward
(perceiver.py:204-221), RMSNorm output (perceiver.py:167-186, 261).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops.activations import gelu
from indextts_tpu.ops.norms import rms_norm

Params = Dict[str, Any]


from indextts_tpu.models.conformer import _linear_init, linear as _linear


def init_perceiver(
    rng: jax.Array,
    dim: int,
    dim_context: Optional[int] = None,
    num_latents: int = 32,
    depth: int = 2,
    dim_head: int = 64,
    heads: int = 8,
    ff_mult: int = 4,
) -> Params:
    dim_context = dim_context or dim
    dim_inner = dim_head * heads
    dim_ff_inner = int(dim * ff_mult * 2 / 3)
    rngs = jax.random.split(rng, 2 + depth * 5)
    ri = iter(rngs)
    params: Params = {
        "latents": 0.02 * jax.random.normal(next(ri), (num_latents, dim), jnp.float32),
        "layers": [],
        "norm_gamma": jnp.ones((dim,), jnp.float32),
    }
    if dim_context != dim:
        params["proj_context"] = _linear_init(next(ri), dim_context, dim)
    for _ in range(depth):
        params["layers"].append(
            {
                "to_q": _linear_init(next(ri), dim, dim_inner, bias=False),
                "to_kv": _linear_init(next(ri), dim, dim_inner * 2, bias=False),
                "to_out": _linear_init(next(ri), dim_inner, dim, bias=False),
                "ff_in": _linear_init(next(ri), dim, dim_ff_inner * 2),
                "ff_out": _linear_init(next(ri), dim_ff_inner, dim),
            }
        )
    return params


def _attention(layer: Params, latents: jnp.ndarray, context: jnp.ndarray, mask, heads: int, dim_head: int):
    """Cross-attention with queries included in the context
    (reference: perceiver.py:277-317)."""
    b, n, _ = latents.shape
    full_context = jnp.concatenate([latents, context], axis=-2)
    q = _linear(layer["to_q"], latents)
    kv = _linear(layer["to_kv"], full_context)
    k, v = jnp.split(kv, 2, axis=-1)

    def split_heads(y):
        return y.reshape(b, -1, heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    scale = dim_head**-0.5
    sim = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    if mask is not None:
        # mask: [B, n + ctx_len] bool key-padding mask (True = attend)
        sim = jnp.where(mask[:, None, None, :], sim, jnp.finfo(jnp.float32).min)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(latents.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)
    return _linear(layer["to_out"], out)


def _geglu_ff(layer: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Linear -> GEGLU -> Linear (reference: perceiver.py:204-221)."""
    h = _linear(layer["ff_in"], x)
    a, gate = jnp.split(h, 2, axis=-1)
    return _linear(layer["ff_out"], gelu(gate) * a)


def perceiver_apply(
    params: Params,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    heads: int = 8,
    dim_head: int = 64,
) -> jnp.ndarray:
    """x: [B, T, dim_context]; mask: [B, num_latents + T] key-padding mask
    (the UnifiedVoice caller left-pads the conditioning mask with 32 ones,
    model.py:500-502). Returns [B, num_latents, dim]."""
    b = x.shape[0]
    if "proj_context" in params:
        x = _linear(params["proj_context"], x)
    latents = jnp.broadcast_to(params["latents"][None], (b,) + params["latents"].shape).astype(x.dtype)
    for layer in params["layers"]:
        latents = _attention(layer, latents, x, mask, heads, dim_head) + latents
        latents = _geglu_ff(layer, latents) + latents
    dim = latents.shape[-1]
    return rms_norm(latents, params["norm_gamma"], scale=dim**0.5)
