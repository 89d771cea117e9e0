"""Tortoise-style attention blocks for the legacy conditioning encoder.

Behavioral reference: indextts/utils/arch_util.py:41-120 (AttentionBlock /
QKVAttentionLegacy over channel-first sequences with GroupNorm32 and a
zero-initialized output projection) and indextts/utils/xtransformers.py:146-186
(RelativePositionBias — the only piece of that vendored library the reference
actually imports). Used by the `condition_type="perceiver"` / default paths of
UnifiedVoice (model.py:210-234, 344-360).

Layout here is channels-last [B, T, C]; the qkv/out projections are 1x1 convs
stored as [C, 3C] / [C, C] matrices.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops.norms import group_norm

Params = Dict[str, Any]


def norm_groups(channels: int) -> int:
    """GroupNorm group count heuristic (reference: arch_util.py:22-37)."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups = int(groups / 2)
    assert groups > 2
    return groups


# ---------------------------------------------------------------------------
# RelativePositionBias (reference: xtransformers.py:146-186)
# ---------------------------------------------------------------------------


def init_relative_position_bias(rng, heads: int, num_buckets: int = 32) -> Params:
    return {"emb": 0.02 * jax.random.normal(rng, (num_buckets, heads), jnp.float32)}


def _relative_position_bucket(relative_position, causal: bool, num_buckets: int, max_distance: int):
    ret = 0
    n = -relative_position
    if not causal:
        num_buckets //= 2
        ret = (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def relative_position_bias(
    p: Params, qlen: int, klen: int, scale: float = 1.0,
    causal: bool = False, num_buckets: int = 32, max_distance: int = 64,
) -> jnp.ndarray:
    """[heads, qlen, klen] additive bias."""
    q_pos = jnp.arange(qlen)[:, None]
    k_pos = jnp.arange(klen)[None, :]
    rel = k_pos - q_pos
    buckets = _relative_position_bucket(rel, causal, num_buckets, max_distance)
    bias = p["emb"][buckets]  # [q, k, heads]
    return bias.transpose(2, 0, 1) * scale


# ---------------------------------------------------------------------------
# AttentionBlock
# ---------------------------------------------------------------------------


def init_attention_block(
    rng, channels: int, num_heads: int = 1, relative_pos_embeddings: bool = False
) -> Params:
    r = jax.random.split(rng, 3)
    bound = 1.0 / np.sqrt(channels)
    p: Params = {
        "norm": {"weight": jnp.ones((channels,)), "bias": jnp.zeros((channels,))},
        "qkv": {
            "weight": jax.random.uniform(r[0], (channels, 3 * channels), jnp.float32, -bound, bound),
            "bias": jax.random.uniform(r[1], (3 * channels,), jnp.float32, -bound, bound),
        },
        # zero-initialized out projection (reference: zero_module, arch_util.py:10-16)
        "proj_out": {
            "weight": jnp.zeros((channels, channels), jnp.float32),
            "bias": jnp.zeros((channels,), jnp.float32),
        },
    }
    if relative_pos_embeddings:
        p["rel_pos"] = init_relative_position_bias(r[2], num_heads)
    return p


def attention_block_apply(
    p: Params, x: jnp.ndarray, num_heads: int, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """x: [B, T, C] -> [B, T, C] with residual (reference: arch_util.py:115-120).

    QKVAttentionLegacy semantics (arch_util.py:40-75): per-head qkv split,
    1/sqrt(sqrt(d)) double-scaling, fp32 softmax, optional relative position
    bias added pre-softmax, post-softmax multiplicative mask.
    """
    b, t, c = x.shape
    ch = c // num_heads
    h = group_norm(x, p["norm"]["weight"], p["norm"]["bias"], norm_groups(c))
    qkv = h @ p["qkv"]["weight"].astype(h.dtype) + p["qkv"]["bias"].astype(h.dtype)  # [B, T, 3C]
    # reference layout: [B, H*3*ch, T] split as contiguous (q, k, v) per head
    qkv = qkv.reshape(b, t, num_heads, 3 * ch).transpose(0, 2, 1, 3)  # [B, H, T, 3ch]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    w = jnp.einsum("bhtc,bhsc->bhts", q * scale, k * scale).astype(jnp.float32)
    if "rel_pos" in p:
        w = w + relative_position_bias(p["rel_pos"], t, t, scale=ch**0.5, num_buckets=32, max_distance=64)
    w = jax.nn.softmax(w, axis=-1).astype(x.dtype)
    if mask is not None:
        w = w * mask[:, None, None, :].astype(w.dtype)
    a = jnp.einsum("bhts,bhsc->bhtc", w, v)
    a = a.transpose(0, 2, 1, 3).reshape(b, t, c)
    a = a @ p["proj_out"]["weight"].astype(a.dtype) + p["proj_out"]["bias"].astype(a.dtype)
    return x + a


# ---------------------------------------------------------------------------
# ConditioningEncoder (reference: model.py:210-234)
# ---------------------------------------------------------------------------


def init_conditioning_encoder(
    rng, spec_dim: int, embedding_dim: int, attn_blocks: int = 6, num_attn_heads: int = 4
) -> Params:
    r = jax.random.split(rng, attn_blocks + 1)
    bound = 1.0 / np.sqrt(spec_dim)
    return {
        "init": {
            "weight": jax.random.uniform(r[0], (spec_dim, embedding_dim), jnp.float32, -bound, bound),
            "bias": jnp.zeros((embedding_dim,), jnp.float32),
        },
        "attn": [init_attention_block(r[i + 1], embedding_dim, num_attn_heads) for i in range(attn_blocks)],
    }


def conditioning_encoder_apply(
    p: Params, x: jnp.ndarray, num_heads: int, mean: bool = False
) -> jnp.ndarray:
    """x: mel [B, T, spec_dim] -> [B, T, emb] (or [B, emb] when mean)."""
    h = x @ p["init"]["weight"].astype(x.dtype) + p["init"]["bias"].astype(x.dtype)
    for blk in p["attn"]:
        h = attention_block_apply(blk, h, num_heads)
    if mean:
        return h.mean(axis=1)
    return h
