"""UnifiedVoice: the autoregressive speech-token LM (functional JAX).

Behavioral reference: indextts/gpt/model.py:300-589 — text/mel embedding
spaces with learned per-modality positional embeddings, a GPT-2 core whose
built-in wte/wpe are nulled out (build_hf_gpt_transformer, model.py:253-274),
conformer+perceiver conditioning (model.py:347-358, 490-519), teacher-forced
forward with CE losses or latent return (model.py:521-589), and the padding
discipline of set_mel_padding/set_text_padding/build_aligned_inputs_and_targets
(model.py:429-460).

TPU-first design decisions (not a port):
  * GPT-2 blocks are parameter-stacked and executed with lax.scan — one
    compiled block body regardless of depth.
  * All shapes are static; padding is carried as lengths + masks.
  * The decode path (gpt_decode.py) runs a jitted lax.while_loop over a
    preallocated KV cache instead of HF generate().
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import GPTConfig
from indextts_tpu.models.conformer import conformer_apply, init_conformer
from indextts_tpu.models.perceiver import init_perceiver, perceiver_apply
from indextts_tpu.ops.activations import gelu_new
from indextts_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _normal(rng, shape, std=0.02):
    return std * jax.random.normal(rng, shape, jnp.float32)


def init_gpt2_blocks(rng: jax.Array, layers: int, d: int) -> Params:
    """Stacked GPT-2 block parameters, leading axis = layer (for lax.scan).

    Weight convention matches HF Conv1D (y = x @ W + b), so converted
    checkpoints drop straight in.
    """
    r = jax.random.split(rng, 8)
    # GPT-2 init: normal(0.02), residual projections scaled by 1/sqrt(2*layers)
    proj_std = 0.02 / math.sqrt(2 * layers)
    return {
        "ln_1": {"weight": jnp.ones((layers, d)), "bias": jnp.zeros((layers, d))},
        "attn_qkv": {"weight": _normal(r[0], (layers, d, 3 * d)), "bias": jnp.zeros((layers, 3 * d))},
        "attn_proj": {
            "weight": proj_std / 0.02 * _normal(r[1], (layers, d, d)),
            "bias": jnp.zeros((layers, d)),
        },
        "ln_2": {"weight": jnp.ones((layers, d)), "bias": jnp.zeros((layers, d))},
        "mlp_fc": {"weight": _normal(r[2], (layers, d, 4 * d)), "bias": jnp.zeros((layers, 4 * d))},
        "mlp_proj": {
            "weight": proj_std / 0.02 * _normal(r[3], (layers, 4 * d, d)),
            "bias": jnp.zeros((layers, d)),
        },
    }


def init_unified_voice(rng: jax.Array, cfg: GPTConfig) -> Params:
    r = jax.random.split(rng, 12)
    d = cfg.model_dim
    n_text = cfg.number_text_tokens * cfg.types + 1
    params: Params = {
        "text_embedding": _normal(r[0], (n_text, d)),
        "mel_embedding": _normal(r[1], (cfg.number_mel_codes, d)),
        "text_pos_embedding": _normal(r[2], (cfg.max_text_seq_len, d)),
        "mel_pos_embedding": _normal(r[3], (cfg.max_mel_seq_len, d)),
        "gpt": {
            "blocks": init_gpt2_blocks(r[4], cfg.layers, d),
            "ln_f": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        },
        "final_norm": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "text_head": {"weight": _normal(r[5], (d, n_text)), "bias": jnp.zeros((n_text,))},
        "mel_head": {"weight": _normal(r[6], (d, cfg.number_mel_codes)), "bias": jnp.zeros((cfg.number_mel_codes,))},
    }
    if cfg.condition_type in ("conformer_perceiver", "conformer_encoder"):
        if (cfg.condition_type == "conformer_encoder"
                and cfg.condition_module.output_size != d):
            # without the perceiver projection the conformer latents
            # concatenate straight into the GPT embedding stream — a
            # mismatched width would only surface as a shape error deep in
            # a jit trace (the reference has no working conformer_encoder
            # path at mismatched dims either, model.py conditioning)
            raise NotImplementedError(
                f"condition_type='conformer_encoder' needs "
                f"condition_module.output_size == model_dim "
                f"({cfg.condition_module.output_size} != {d})"
            )
        params["conditioning_encoder"] = init_conformer(r[7], cfg.condition_module, input_size=100)
        if cfg.condition_type == "conformer_perceiver":
            params["perceiver_encoder"] = init_perceiver(
                r[8],
                dim=d,
                dim_context=cfg.condition_module.output_size,
                num_latents=cfg.condition_num_latent,
                heads=cfg.condition_module.attention_heads,
                ff_mult=cfg.condition_module.perceiver_mult,
            )
    elif cfg.condition_type == "perceiver":
        # legacy path (model.py:344-346): AttentionBlock stack + perceiver
        from indextts_tpu.models.attention_block import init_conditioning_encoder

        params["conditioning_encoder"] = init_conditioning_encoder(
            r[7], 100, d, attn_blocks=6, num_attn_heads=cfg.heads
        )
        params["perceiver_encoder"] = init_perceiver(
            r[8], dim=d, dim_context=d, num_latents=cfg.condition_num_latent
        )
    elif cfg.condition_type == "default":
        # mean-pooled ConditioningEncoder (model.py:360, 507-518)
        from indextts_tpu.models.attention_block import init_conditioning_encoder

        params["conditioning_encoder"] = init_conditioning_encoder(
            r[7], 100, d, attn_blocks=6, num_attn_heads=cfg.heads
        )
    else:
        raise NotImplementedError(
            f"condition_type={cfg.condition_type!r}: the reference's 'gst' branch references an "
            "encoder it never constructs (model.py:503-506) and is unsupported there too"
        )
    return params


# ---------------------------------------------------------------------------
# MelEncoder: the use_mel_codes_as_input=False alternative input path
# (reference: model.py:21-37, 277-297 — conv/ResBlock stack, 4x reduction).
# Vestigial in the reference too (inference always uses mel codes); provided
# for capability parity.
# ---------------------------------------------------------------------------


def init_mel_encoder(rng: jax.Array, channels: int, mel_channels: int = 80, resblocks_per_reduction: int = 1) -> Params:
    from indextts_tpu.models.conformer import _conv_init_1d

    r = jax.random.split(rng, 3 + 3 * resblocks_per_reduction * 2)
    ri = iter(r)

    def resblock(chan):
        return {
            "conv0": _conv_init_1d(next(ri), 3, chan, chan),
            "conv1": _conv_init_1d(next(ri), 3, chan, chan),
            "gn0": {"weight": jnp.ones((chan,)), "bias": jnp.zeros((chan,))},
            "gn1": {"weight": jnp.ones((chan,)), "bias": jnp.zeros((chan,))},
        }

    c4, c2 = channels // 4, channels // 2
    return {
        "conv_in": _conv_init_1d(next(ri), 3, mel_channels, c4),
        "res0": [resblock(c4) for _ in range(resblocks_per_reduction)],
        "down0": _conv_init_1d(next(ri), 3, c4, c2),
        "gn_a": {"weight": jnp.ones((c2,)), "bias": jnp.zeros((c2,))},
        "res1": [resblock(c2) for _ in range(resblocks_per_reduction)],
        "down1": _conv_init_1d(next(ri), 3, c2, channels),
        "gn_b": {"weight": jnp.ones((channels,)), "bias": jnp.zeros((channels,))},
        "res2": [resblock(channels) for _ in range(resblocks_per_reduction)],
    }


def mel_encoder_apply(params: Params, mel: jnp.ndarray, channels: int) -> jnp.ndarray:
    """mel [B, T, mel_channels] -> embeddings [B, T/4, channels]."""
    from indextts_tpu.ops.conv import conv1d
    from indextts_tpu.ops.norms import group_norm

    def resblock(p, x, chan):
        h = conv1d(x, p["conv0"]["weight"], p["conv0"]["bias"], padding=1)
        h = group_norm(h, p["gn0"]["weight"], p["gn0"]["bias"], num_groups=chan // 8)
        h = jnp.maximum(h, 0)
        h = conv1d(h, p["conv1"]["weight"], p["conv1"]["bias"], padding=1)
        h = group_norm(h, p["gn1"]["weight"], p["gn1"]["bias"], num_groups=chan // 8)
        return jnp.maximum(h + x, 0)

    c4, c2 = channels // 4, channels // 2
    h = conv1d(mel, params["conv_in"]["weight"], params["conv_in"]["bias"], padding=1)
    for p in params["res0"]:
        h = resblock(p, h, c4)
    h = conv1d(h, params["down0"]["weight"], params["down0"]["bias"], stride=2, padding=1)
    h = jnp.maximum(group_norm(h, params["gn_a"]["weight"], params["gn_a"]["bias"], num_groups=channels // 16), 0)
    for p in params["res1"]:
        h = resblock(p, h, c2)
    h = conv1d(h, params["down1"]["weight"], params["down1"]["bias"], stride=2, padding=1)
    h = jnp.maximum(group_norm(h, params["gn_b"]["weight"], params["gn_b"]["bias"], num_groups=channels // 8), 0)
    for p in params["res2"]:
        h = resblock(p, h, channels)
    return h


# ---------------------------------------------------------------------------
# GPT-2 core
# ---------------------------------------------------------------------------


# (decode-time KV caches live in gpt_decode.py: head-paired k2/v2
# [L, B, H/2, S, 2*Dh] — see its module docstring for the layout rationale)


def _attn(q, k, v, bias):
    """q: [B, H, Tq, Dh]; k/v: [B, H, Tk, Dh]; bias: additive [B, 1, Tq, Tk]."""
    d_k = q.shape[-1]
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(d_k)
    scores = scores.astype(jnp.float32) + bias
    attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", attn, v)


def _block_full(layer_p: Params, x: jnp.ndarray, bias: jnp.ndarray, heads: int) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One GPT-2 block over a full sequence. Returns output and (k, v)."""
    from indextts_tpu.ops.quant import matmul_maybe_quantized

    b, t, d = x.shape
    dh = d // heads
    h = layer_norm(x, layer_p["ln_1"]["weight"], layer_p["ln_1"]["bias"])
    qkv = matmul_maybe_quantized(h, layer_p["attn_qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(y):
        return y.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    a = _attn(q, k, v, bias)
    a = a.transpose(0, 2, 1, 3).reshape(b, t, d)
    a = matmul_maybe_quantized(a, layer_p["attn_proj"])
    x = x + a
    h = layer_norm(x, layer_p["ln_2"]["weight"], layer_p["ln_2"]["bias"])
    h = gelu_new(matmul_maybe_quantized(h, layer_p["mlp_fc"]))
    h = matmul_maybe_quantized(h, layer_p["mlp_proj"])
    return x + h, (k, v)


def gpt2_apply(
    gpt_params: Params,
    emb: jnp.ndarray,
    heads: int,
    attention_mask: Optional[jnp.ndarray] = None,
    return_kv: bool = False,
):
    """GPT-2 stack over [B, T, D] embeddings (wte/wpe are external, matching
    the nulled-out HF core, model.py:268-273). attention_mask: [B, T] with
    1 = attend (HF additive-mask semantics).
    """
    b, t, _ = emb.shape
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    bias = jnp.where(causal[None, None], 0.0, jnp.finfo(jnp.float32).min)
    if attention_mask is not None:
        pad_bias = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, jnp.finfo(jnp.float32).min)
        bias = bias + pad_bias

    def body(x, layer_p):
        out, kv = _block_full(layer_p, x, bias, heads)
        return out, kv if return_kv else None

    x, kvs = jax.lax.scan(body, emb, gpt_params["blocks"])
    x = layer_norm(x, gpt_params["ln_f"]["weight"], gpt_params["ln_f"]["bias"])
    return (x, kvs) if return_kv else x


# ---------------------------------------------------------------------------
# conditioning
# ---------------------------------------------------------------------------


def get_conditioning(
    params: Params, cfg: GPTConfig, speech_conditioning_mel: jnp.ndarray, cond_mel_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Prompt mel [B, frames, 100] -> conditioning latents [B, 32, D]
    (reference: model.py:490-519, conformer_perceiver branch)."""
    if cfg.condition_type == "conformer_perceiver":
        enc, mask = conformer_apply(
            params["conditioning_encoder"], cfg.condition_module, speech_conditioning_mel, cond_mel_lengths
        )
        # left-pad the key mask with cond_num ones (model.py:500-502)
        b = enc.shape[0]
        ones = jnp.ones((b, cfg.condition_num_latent), dtype=bool)
        conds_mask = jnp.concatenate([ones, mask[:, 0, :]], axis=1)
        return perceiver_apply(
            params["perceiver_encoder"],
            enc,
            conds_mask,
            heads=cfg.condition_module.attention_heads,
        )
    if cfg.condition_type == "conformer_encoder":
        enc, _ = conformer_apply(
            params["conditioning_encoder"], cfg.condition_module, speech_conditioning_mel, cond_mel_lengths
        )
        return enc
    if cfg.condition_type == "perceiver":
        # legacy path (model.py:491-495): AttentionBlock stack -> perceiver
        from indextts_tpu.models.attention_block import conditioning_encoder_apply

        enc = conditioning_encoder_apply(params["conditioning_encoder"], speech_conditioning_mel, cfg.heads)
        return perceiver_apply(params["perceiver_encoder"], enc)
    if cfg.condition_type == "default":
        # mean-pooled single conditioning vector (model.py:507-518)
        from indextts_tpu.models.attention_block import conditioning_encoder_apply

        enc = conditioning_encoder_apply(
            params["conditioning_encoder"], speech_conditioning_mel, cfg.heads, mean=True
        )
        return enc[:, None, :]
    raise NotImplementedError(cfg.condition_type)


# ---------------------------------------------------------------------------
# teacher-forced forward (training losses / latent return)
# ---------------------------------------------------------------------------


def set_padding(tokens: jnp.ndarray, lengths: jnp.ndarray, pad_value: int) -> jnp.ndarray:
    """Replace positions >= length with pad_value (reference: model.py:434-460)."""
    t = tokens.shape[1]
    idx = jnp.arange(t)[None, :]
    return jnp.where(idx >= lengths[:, None], pad_value, tokens)


def build_aligned_inputs_and_targets(tokens: jnp.ndarray, start: int, stop: int):
    inp = jnp.pad(tokens, ((0, 0), (1, 0)), constant_values=start)
    tar = jnp.pad(tokens, ((0, 0), (0, 1)), constant_values=stop)
    return inp, tar


def unified_voice_forward(
    params: Params,
    cfg: GPTConfig,
    speech_conditioning_mel: jnp.ndarray,
    text_inputs: jnp.ndarray,
    text_lengths: jnp.ndarray,
    mel_codes: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    cond_mel_lengths: jnp.ndarray,
    return_latent: bool = True,
    text_first: bool = True,
    conds: Optional[jnp.ndarray] = None,
    types: Optional[jnp.ndarray] = None,
    mask_pad_keys: bool = False,
):
    """Teacher-forced forward (reference: model.py:521-589).

    Either returns mel latents [B, T_mel, D] (return_latent=True — the
    stage-2 path of the engine) or (loss_text, loss_mel, mel_logits).
    `conds` may be precomputed conditioning latents ([B, 32, D]).
    `types` expands the text embedding space per row (model.py:541-543).

    `mask_pad_keys`: mask attention keys that only exist because of shape
    bucketing — text positions >= text_len+2 and mel positions >=
    mel_code_len+1 after framing. The reference runs this stage at exact
    per-sentence length (infer.py:196-200), so a bucket-padded call with the
    mask on is bit-comparable to the reference's exact-length pass; without
    it the extra stop-token keys shift the latents slightly.
    """
    if conds is None:
        conds = get_conditioning(params, cfg, speech_conditioning_mel, cond_mel_lengths)
    if types is not None:
        text_inputs = text_inputs * (1 + types)[:, None]
    d = cfg.model_dim

    # mel padding from wav lengths (model.py:557: ceil(wav/compression)+1)
    mel_code_lengths = jnp.ceil(wav_lengths / cfg.mel_length_compression).astype(jnp.int32) + 1
    mel_codes = set_padding(mel_codes, mel_code_lengths, cfg.stop_mel_token)
    text_inputs = set_padding(text_inputs, text_lengths, cfg.stop_text_token)
    text_inputs = jnp.pad(text_inputs, ((0, 0), (0, 1)), constant_values=cfg.stop_text_token)
    mel_codes = jnp.pad(mel_codes, ((0, 0), (0, 1)), constant_values=cfg.stop_mel_token)

    text_inputs, text_targets = build_aligned_inputs_and_targets(
        text_inputs, cfg.start_text_token, cfg.stop_text_token
    )
    mel_codes_in, mel_targets = build_aligned_inputs_and_targets(
        mel_codes, cfg.start_mel_token, cfg.stop_mel_token
    )
    text_emb = (
        params["text_embedding"][text_inputs] + params["text_pos_embedding"][: text_inputs.shape[1]][None]
    )
    mel_emb = (
        params["mel_embedding"][mel_codes_in] + params["mel_pos_embedding"][: mel_codes_in.shape[1]][None]
    )

    if text_first:
        first_emb, second_emb = text_emb, mel_emb
    else:
        first_emb, second_emb = mel_emb, text_emb
    emb = jnp.concatenate([conds.astype(text_emb.dtype), first_emb, second_emb], axis=1)
    attention_mask = None
    if mask_pad_keys:
        # valid keys: all conds; text block [start, t_0..t_{len-1}, stop] =
        # len+2 positions; mel block [start, c_0.., stop] = mel_code_len+1
        # positions — everything beyond exists only due to shape bucketing
        b = emb.shape[0]
        lt = text_inputs.shape[1]  # framed text width
        lm = mel_codes_in.shape[1]
        cond_ok = jnp.ones((b, conds.shape[1]), bool)
        text_ok = jnp.arange(lt)[None, :] < (text_lengths + 2)[:, None]
        mel_ok = jnp.arange(lm)[None, :] < (mel_code_lengths + 1)[:, None]
        first_ok, second_ok = (text_ok, mel_ok) if text_first else (mel_ok, text_ok)
        attention_mask = jnp.concatenate([cond_ok, first_ok, second_ok], axis=1)
    hidden = gpt2_apply(params["gpt"], emb, cfg.heads, attention_mask=attention_mask)
    offset = conds.shape[1]
    enc = hidden[:, offset:]
    enc = layer_norm(enc, params["final_norm"]["weight"], params["final_norm"]["bias"])

    first_len = first_emb.shape[1]
    second_len = second_emb.shape[1]
    first_out = enc[:, :first_len]
    second_out = enc[:, -second_len:]

    if return_latent:
        # strip the two trailing frames added by this forward (model.py:576-578)
        return second_out[:, :-2]

    text_out, mel_out = (first_out, second_out) if text_first else (second_out, first_out)
    text_logits = text_out @ params["text_head"]["weight"] + params["text_head"]["bias"]
    mel_logits = mel_out @ params["mel_head"]["weight"] + params["mel_head"]["bias"]

    def ce(logits, targets):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return nll.mean()

    loss_text = ce(text_logits, text_targets)
    loss_mel = ce(mel_logits, mel_targets)
    # reference returns [B, V, T]-permuted logits (model.py:479-486)
    return loss_text, loss_mel, mel_logits.transpose(0, 2, 1)
