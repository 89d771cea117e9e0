"""Conformer conditioning encoder (functional JAX).

Behavioral reference: indextts/gpt/conformer_encoder.py (wenet-style conformer
over the prompt mel) + conformer/attention.py (Transformer-XL relative
position attention with u/v biases, rel_shift disabled per attention.py:300-310)
+ conformer/embedding.py (sinusoidal PE with sqrt(d) input scaling) +
conformer/subsampling.py (2D-conv subsampling variants).

Inference-only: dropout elided (the engine constructs it with
dropout_rate=0.0); macaron/concat_after off per the IndexTTS config
(conformer_encoder.py:439-520 defaults: rel_pos, normalize_before,
use_cnn_module=True, kernel 15, SiLU).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import ConditionModuleConfig
from indextts_tpu.ops.activations import glu, relu, silu
from indextts_tpu.ops.conv import conv1d, conv2d
from indextts_tpu.ops.norms import layer_norm
from indextts_tpu.utils.common import make_pad_mask

Params = Dict[str, Any]


def _linear_init(rng, din, dout, bias=True):
    kw, kb = jax.random.split(rng)
    bound = 1.0 / np.sqrt(din)
    p = {"weight": jax.random.uniform(kw, (din, dout), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (dout,), jnp.float32, -bound, bound)
    return p


def _ln_init(d):
    return {"weight": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def linear(p, x):
    out = x @ p["weight"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """PositionalEncoding table (reference: embedding.py:47-54)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


# ---------------------------------------------------------------------------
# subsampling input layers (reference: subsampling.py)
# ---------------------------------------------------------------------------


def init_subsampling(rng, input_layer: str, idim: int, odim: int) -> Params:
    r = jax.random.split(rng, 4)
    if input_layer == "linear":
        return {
            "out": _linear_init(r[0], idim, odim),
            "ln": _ln_init(odim),
        }
    if input_layer == "conv2d2":
        f_out = (idim - 1) // 2
        return {
            "conv0": _conv2d_init(r[0], 3, 1, odim),
            "out": _linear_init(r[1], odim * f_out, odim),
        }
    if input_layer == "conv2d":  # 1/4 subsampling, two 3x3 stride-2 convs
        f_out = (((idim - 1) // 2) - 1) // 2
        return {
            "conv0": _conv2d_init(r[0], 3, 1, odim),
            "conv1": _conv2d_init(r[1], 3, odim, odim),
            "out": _linear_init(r[2], odim * f_out, odim),
        }
    if input_layer == "conv2d6":  # 1/6: 3x3 s2 then 5x5 s3 (subsampling.py:251-297)
        f_out = (((idim - 1) // 2) - 2) // 3
        return {
            "conv0": _conv2d_init(r[0], 3, 1, odim),
            "conv1": _conv2d_init(r[1], 5, odim, odim),
            "out": _linear_init(r[2], odim * f_out, odim),
        }
    if input_layer == "conv2d8":  # 1/8: three 3x3 s2 convs (subsampling.py:300-348)
        f_out = ((((idim - 1) // 2 - 1) // 2) - 1) // 2
        return {
            "conv0": _conv2d_init(r[0], 3, 1, odim),
            "conv1": _conv2d_init(r[1], 3, odim, odim),
            "conv2": _conv2d_init(r[2], 3, odim, odim),
            "out": _linear_init(r[3], odim * f_out, odim),
        }
    raise ValueError(f"unsupported input_layer: {input_layer}")


def _conv2d_init(rng, k, cin, cout):
    kw, kb = jax.random.split(rng)
    bound = 1.0 / np.sqrt(cin * k * k)
    return {
        "weight": jax.random.uniform(kw, (k, k, cin, cout), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def subsampling_apply(
    p: Params, x: jnp.ndarray, mask: jnp.ndarray, kind: str = "conv2d2"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, T, idim]; mask: [B, 1, T] bool (True = valid).

    Returns (features [B, T', odim], mask [B, 1, T']).
    """
    if kind == "linear":
        out = layer_norm(linear(p["out"], x), p["ln"]["weight"], p["ln"]["bias"])
        return out, mask
    if kind == "conv2d2":
        h = x[..., None]  # [B, T, F, 1]
        h = relu(conv2d(h, p["conv0"]["weight"], p["conv0"]["bias"], stride=2))
        b, t, f, c = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)
        out = linear(p["out"], h)
        return out, mask[:, :, 2::2]
    if kind == "conv2d":
        h = x[..., None]
        h = relu(conv2d(h, p["conv0"]["weight"], p["conv0"]["bias"], stride=2))
        h = relu(conv2d(h, p["conv1"]["weight"], p["conv1"]["bias"], stride=2))
        b, t, f, c = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)
        out = linear(p["out"], h)
        return out, mask[:, :, 2::2][:, :, 2::2]
    if kind == "conv2d6":
        h = x[..., None]
        h = relu(conv2d(h, p["conv0"]["weight"], p["conv0"]["bias"], stride=2))
        h = relu(conv2d(h, p["conv1"]["weight"], p["conv1"]["bias"], stride=3))
        b, t, f, c = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)
        out = linear(p["out"], h)
        return out, mask[:, :, 2::2][:, :, 4::3]
    if kind == "conv2d8":
        h = x[..., None]
        h = relu(conv2d(h, p["conv0"]["weight"], p["conv0"]["bias"], stride=2))
        h = relu(conv2d(h, p["conv1"]["weight"], p["conv1"]["bias"], stride=2))
        h = relu(conv2d(h, p["conv2"]["weight"], p["conv2"]["bias"], stride=2))
        b, t, f, c = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)
        out = linear(p["out"], h)
        return out, mask[:, :, 2::2][:, :, 2::2][:, :, 2::2]
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# relative-position multi-headed attention (reference: attention.py:189-312)
# ---------------------------------------------------------------------------


def init_rel_mha(rng, heads: int, d_model: int) -> Params:
    r = jax.random.split(rng, 7)
    d_k = d_model // heads
    # xavier_uniform for pos biases (attention.py:206-207)
    bound = math.sqrt(6.0 / (heads + d_k))
    return {
        "linear_q": _linear_init(r[0], d_model, d_model),
        "linear_k": _linear_init(r[1], d_model, d_model),
        "linear_v": _linear_init(r[2], d_model, d_model),
        "linear_out": _linear_init(r[3], d_model, d_model),
        "linear_pos": _linear_init(r[4], d_model, d_model, bias=False),
        "pos_bias_u": jax.random.uniform(r[5], (heads, d_k), jnp.float32, -bound, bound),
        "pos_bias_v": jax.random.uniform(r[6], (heads, d_k), jnp.float32, -bound, bound),
    }


def rel_mha_apply(
    p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray, mask: jnp.ndarray, heads: int
) -> jnp.ndarray:
    """Self-attention with Transformer-XL u/v biases, rel_shift disabled
    (reference: attention.py:235-312). mask: [B, 1, T] bool (True = valid)."""
    b, t, d = x.shape
    d_k = d // heads

    def split_heads(y):
        return y.reshape(b, -1, heads, d_k).transpose(0, 2, 1, 3)  # [B, H, T, dk]

    q = split_heads(linear(p["linear_q"], x))
    k = split_heads(linear(p["linear_k"], x))
    v = split_heads(linear(p["linear_v"], x))
    pos = linear(p["linear_pos"], pos_emb)  # [1, T, D]
    pmat = pos.reshape(1, -1, heads, d_k).transpose(0, 2, 1, 3)  # [1, H, T, dk]

    q_u = q + p["pos_bias_u"].astype(q.dtype)[None, :, None, :]
    q_v = q + p["pos_bias_v"].astype(q.dtype)[None, :, None, :]
    matrix_ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k)
    matrix_bd = jnp.einsum("bhtd,bhsd->bhts", q_v, jnp.broadcast_to(pmat, (b,) + pmat.shape[1:]))
    scores = (matrix_ac + matrix_bd) / math.sqrt(d_k)

    neg = jnp.asarray(-jnp.inf, scores.dtype)
    key_invalid = ~mask[:, 0, :][:, None, None, :]  # [B, 1, 1, T]
    scores = jnp.where(key_invalid, neg, scores)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    attn = jnp.where(key_invalid, 0.0, attn)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return linear(p["linear_out"], out)


# ---------------------------------------------------------------------------
# conformer blocks
# ---------------------------------------------------------------------------


def init_conv_module(rng, channels: int, kernel: int = 15) -> Params:
    r = jax.random.split(rng, 3)
    return {
        "pw1": _conv_init_1d(r[0], 1, channels, 2 * channels),
        "dw": _dwconv_init(r[1], kernel, channels),
        "ln": _ln_init(channels),
        "pw2": _conv_init_1d(r[2], 1, channels, channels),
    }


def _conv_init_1d(rng, k, cin, cout):
    kw, kb = jax.random.split(rng)
    bound = 1.0 / np.sqrt(cin * k)
    return {
        "weight": jax.random.uniform(kw, (k, cin, cout), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _dwconv_init(rng, k, channels):
    kw, kb = jax.random.split(rng)
    bound = 1.0 / np.sqrt(k)
    return {
        "weight": jax.random.uniform(kw, (k, 1, channels), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (channels,), jnp.float32, -bound, bound),
    }


def conv_module_apply(p: Params, x: jnp.ndarray, mask_pad: jnp.ndarray, kernel: int = 15) -> jnp.ndarray:
    """GLU pointwise -> depthwise (pad (k-1)//2) -> LayerNorm+SiLU -> pointwise,
    masking padded frames before and after (reference: conformer_encoder.py:112-167)."""
    valid = mask_pad[:, 0, :, None]  # [B, T, 1] bool
    x = jnp.where(valid, x, 0.0)
    x = conv1d(x, p["pw1"]["weight"], p["pw1"]["bias"])
    x = glu(x, axis=-1)
    c = x.shape[-1]
    x = conv1d(x, p["dw"]["weight"], p["dw"]["bias"], padding=(kernel - 1) // 2, groups=c)
    x = silu(layer_norm(x, p["ln"]["weight"], p["ln"]["bias"]))
    x = conv1d(x, p["pw2"]["weight"], p["pw2"]["bias"])
    return jnp.where(valid, x, 0.0)


def init_ffn(rng, d_model: int, hidden: int) -> Params:
    r = jax.random.split(rng, 2)
    return {"w1": _linear_init(r[0], d_model, hidden), "w2": _linear_init(r[1], hidden, d_model)}


def init_plain_mha(rng, heads: int, d_model: int) -> Params:
    """Absolute-position MultiHeadedAttention (reference: attention.py:26-186)."""
    r = jax.random.split(rng, 4)
    return {
        "linear_q": _linear_init(r[0], d_model, d_model),
        "linear_k": _linear_init(r[1], d_model, d_model),
        "linear_v": _linear_init(r[2], d_model, d_model),
        "linear_out": _linear_init(r[3], d_model, d_model),
    }


def plain_mha_apply(p: Params, x: jnp.ndarray, mask: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    d_k = d // heads

    def split_heads(y):
        return y.reshape(b, -1, heads, d_k).transpose(0, 2, 1, 3)

    q = split_heads(linear(p["linear_q"], x))
    k = split_heads(linear(p["linear_k"], x))
    v = split_heads(linear(p["linear_v"], x))
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(d_k)
    key_invalid = ~mask[:, 0, :][:, None, None, :]
    scores = jnp.where(key_invalid, -jnp.inf, scores)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    attn = jnp.where(key_invalid, 0.0, attn)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    return linear(p["linear_out"], out.transpose(0, 2, 1, 3).reshape(b, t, d))


def init_conformer_layer(
    rng, d_model: int, heads: int, linear_units: int, cnn_kernel: int = 15, rel_pos: bool = True
) -> Params:
    r = jax.random.split(rng, 3)
    return {
        "attn": init_rel_mha(r[0], heads, d_model) if rel_pos else init_plain_mha(r[0], heads, d_model),
        "ff": init_ffn(r[1], d_model, linear_units),
        "conv": init_conv_module(r[2], d_model, cnn_kernel),
        "norm_mha": _ln_init(d_model),
        "norm_ff": _ln_init(d_model),
        "norm_conv": _ln_init(d_model),
        "norm_final": _ln_init(d_model),
    }


def conformer_layer_apply(
    p: Params, x: jnp.ndarray, pos_emb: jnp.ndarray, mask: jnp.ndarray, heads: int,
    cnn_kernel: int = 15, rel_pos: bool = True,
) -> jnp.ndarray:
    """normalize_before, no macaron (reference: conformer_encoder.py:232-313)."""
    # MHA
    h = layer_norm(x, p["norm_mha"]["weight"], p["norm_mha"]["bias"])
    if rel_pos:
        x = x + rel_mha_apply(p["attn"], h, pos_emb, mask, heads)
    else:
        x = x + plain_mha_apply(p["attn"], h, mask, heads)
    # conv module
    h = layer_norm(x, p["norm_conv"]["weight"], p["norm_conv"]["bias"])
    x = x + conv_module_apply(p["conv"], h, mask, cnn_kernel)
    # FFN (SiLU activation, ff_scale=1)
    h = layer_norm(x, p["norm_ff"]["weight"], p["norm_ff"]["bias"])
    h = linear(p["ff"]["w2"], silu(linear(p["ff"]["w1"], h)))
    x = x + h
    return layer_norm(x, p["norm_final"]["weight"], p["norm_final"]["bias"])


# ---------------------------------------------------------------------------
# full encoder
# ---------------------------------------------------------------------------


def init_conformer(rng, cfg: ConditionModuleConfig, input_size: int = 100) -> Params:
    r = jax.random.split(rng, cfg.num_blocks + 2)
    rel = cfg.pos_enc_layer_type == "rel_pos"
    return {
        "embed": init_subsampling(r[0], cfg.input_layer, input_size, cfg.output_size),
        "layers": [
            init_conformer_layer(
                r[i + 1], cfg.output_size, cfg.attention_heads, cfg.linear_units, rel_pos=rel
            )
            for i in range(cfg.num_blocks)
        ],
        "after_norm": _ln_init(cfg.output_size),
        "pe": jnp.asarray(sinusoidal_pe(5000, cfg.output_size)),
    }


def conformer_apply(
    params: Params, cfg: ConditionModuleConfig, xs: jnp.ndarray, xs_lens: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """xs: [B, T, input_size]; xs_lens: [B] frame lengths.

    Returns (encoded [B, T', output_size], mask [B, 1, T'] bool True=valid)
    (reference: conformer_encoder.py:400-436).
    """
    b, t, _ = xs.shape
    masks = ~make_pad_mask(xs_lens, t)[:, None, :]  # [B, 1, T]
    xs, masks = subsampling_apply(params["embed"], xs, masks, cfg.input_layer)
    xscale = math.sqrt(cfg.output_size)
    pos_emb = params["pe"][None, : xs.shape[1], :].astype(xs.dtype)
    rel = cfg.pos_enc_layer_type == "rel_pos"
    if cfg.pos_enc_layer_type == "abs_pos":
        # absolute PE added to the input (embedding.py:57-75)
        xs = xs * xscale + pos_emb
    elif rel:
        # rel_pos: scale input, feed table prefix to attention (embedding.py:129-143)
        xs = xs * xscale
    # no_pos: input used as-is
    for layer in params["layers"]:
        xs = conformer_layer_apply(layer, xs, pos_emb, masks, cfg.attention_heads, rel_pos=rel)
    xs = layer_norm(xs, params["after_norm"]["weight"], params["after_norm"]["bias"])
    return xs, masks
