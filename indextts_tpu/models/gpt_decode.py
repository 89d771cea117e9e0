"""Autoregressive decode for UnifiedVoice: jitted prefill + while_loop.

Replaces the reference's HF `generate()` path (model.py:591-708 +
GPT2InferenceModel, model.py:40-207) with a TPU-native design:

  * `prepare_gpt_inputs` reproduces the left-padded [pad][cond][text][start]
    embedding layout and attention mask of model.py:591-654 with static
    shapes (per-row left-pad realized as a gather, not Python loops).
  * prefill runs the full GPT-2 stack once, writing K/V into a preallocated
    HBM cache of static length prefill_len + max_new_tokens.
  * the decode loop is a lax.while_loop with early exit when every row has
    emitted stop_mel_token; sampling/penalties are the pure-jnp processors in
    ops/sampling.py with HF-compatible semantics.
  * the mel positional-embedding off-by-one of the reference inference model
    (model.py:151-155: generated token t receives mel position t+1, position
    1 is never used) is reproduced exactly for checkpoint parity.

Entry points:
  * generate_speech / generate_speech_segmented — greedy & sampling, the
    segmented variant grows the KV cache so per-step attention reads scale
    with generated length (bit-exact vs the monolithic loop).
  * generate_speech_beam / generate_speech_beam_segmented — HF-style
    beam_search / beam_sample with a split cache: the prefill K/V are shared
    read-only across beams; reorders gather only the generated region.
    `_generate_speech_beam_dense` is the straightforward full-gather
    implementation kept as the in-repo oracle (tests/test_beam_oracle.py
    additionally checks it against an independent Python beam search).
  * prefill_decode_state / decode_steps — the resumable
    state machine behind streaming synthesis (engine.infer_stream).
  * inference_speech — the reference-signature high-level wrapper
    (num_return_sequences, input_tokens, typical sampling).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu.config import GPTConfig
from indextts_tpu.models.gpt import gpt2_apply
from indextts_tpu.ops.activations import gelu_new
from indextts_tpu.ops.norms import layer_norm
from indextts_tpu.ops.sampling import (
    apply_repetition_penalty,
    apply_temperature,
    apply_top_k_top_p,
    apply_top_p,
    apply_typical,
    greedy_token,
    process_logits,
    sample_token,
)

Params = Dict[str, Any]
NEG_INF = jnp.finfo(jnp.float32).min


# length_penalty as f32 scalar () or column [b, 1], so per-row penalties
# (continuous batching) broadcast against [b, 2nb] candidate scores — the
# SAME normalization ops/sampling uses for its per-row knobs (one
# definition; a drift in dtype/ndim handling must reach both)
from indextts_tpu.ops.sampling import _colp as _lp_col


def _beam_joint_scores(logits, seen, beam_scores, gen: "GenerationConfig",
                       temperature, top_p, repetition_penalty, typical_mass):
    """Joint successor scores with HF beam semantics (transformers-4.36
    beam_search/beam_sample, the stack the reference drives via
    model.py:698-703): PROCESSORS (repetition penalty, typical) run on the
    LOG-SOFTMAXED per-beam scores, the cumulative beam scores are added,
    and — beam_sample only — the WARPERS (temperature, top-k/top-p with
    min_tokens_to_keep=2) run on the JOINT scores. This ordering matters:
    log-probs are always <= 0, so HF's repetition penalty always MULTIPLIES
    by the penalty (strong suppression) — applying it to raw logits (the
    non-beam sampling order) divides positive logits instead, a much weaker
    penalty with a different token ranking. ONE definition for the dense /
    split / segmented drivers AND the test oracle.

    logits/seen: [bb, V]; beam_scores: [bb]. Returns [bb, V] f32."""
    lf = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lf = apply_repetition_penalty(lf, seen, repetition_penalty)
    if gen.typical_sampling:
        lf = apply_typical(lf, typical_mass, min_tokens_to_keep=2)
    joint = lf + beam_scores[:, None]
    if gen.do_sample:
        joint = apply_temperature(joint, temperature)
        if gen.top_k:
            joint = apply_top_k_top_p(joint, max(int(gen.top_k), 2), top_p,
                                      min_tokens_to_keep=2)
        else:
            joint = apply_top_p(joint, top_p, min_tokens_to_keep=2)
    return joint


def _select_successors(logp_joint, key, step, gen: "GenerationConfig", nb: int):
    """[b, nb*V] joint scores -> (vals, idx) of the 2*nb successors per row.
    Sampling uses Gumbel top-k (== HF beam_sample's multinomial without
    replacement over softmax(joint)) with the post-sample sort by true
    score; greedy is plain top-k. ONE definition for all three drivers."""
    k = 2 * nb
    if gen.do_sample:
        g = -jnp.log(-jnp.log(
            jax.random.uniform(jax.random.fold_in(key, step), logp_joint.shape) + 1e-20
        ) + 1e-20)
        _, idx = jax.lax.top_k(logp_joint + g, k)
        vals = jnp.take_along_axis(logp_joint, idx, axis=1)
        order = jnp.argsort(-vals, axis=1)
        return jnp.take_along_axis(vals, order, axis=1), jnp.take_along_axis(idx, order, axis=1)
    return jax.lax.top_k(logp_joint, k)


def _beam_stop_bound_base(length_penalty, prefill_len: int, max_new: int, i):
    """Optimistic (ADMISSIBLE) hypothesis-length base for the early-stop
    score bound: hypothesis scores divide by (prefill+len)**lp, so the
    best-case finish length is max_new when lp > 0 (bigger denominator
    helps a negative score) but the NEXT step when lp < 0 — using max_new
    for negative lp would stop before a strictly better short hypothesis
    was reachable (HF's BeamHypotheses.is_done switches to cur_len for
    lp <= 0 for the same reason). Returns () or [b] f32."""
    lpv = jnp.asarray(length_penalty, jnp.float32)
    return jnp.where(
        lpv > 0,
        jnp.float32(prefill_len + max_new),
        jnp.asarray(prefill_len + i + 1, jnp.float32),
    )


@dataclass(frozen=True)
class GenerationConfig:
    """Static (shape/trace-affecting) generation settings. Dynamic scalars
    (temperature/top_p/repetition_penalty/length_penalty/typical_mass) are
    traced arguments instead so tweaking them never recompiles — this config
    participates in jit cache keys, so only structure belongs here."""

    do_sample: bool = True
    num_beams: int = 1
    top_k: int = 30
    typical_sampling: bool = False
    max_new_tokens: int = 600
    # beam termination: an ADMISSIBLE score-bound criterion — stop once no
    # live beam's optimistic bound (raw score / max-length penalty) can beat
    # the best finished hypothesis. This differs from HF's early_stopping=True
    # (stop after num_beams finished hypotheses): ours may search LONGER and
    # return a higher-scoring hypothesis, so beam token sequences can deviate
    # from HF generate() even at identical scores arithmetic. All in-repo
    # drivers and the dense oracle share this rule (bit-matched in tests).
    early_stopping: bool = True


def prepare_gpt_inputs(
    params: Params,
    cfg: GPTConfig,
    conds: jnp.ndarray,
    text_tokens: jnp.ndarray,
    text_lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build prefill embeddings + attention mask (reference: model.py:591-654).

    conds: [B, C, D]; text_tokens: [B, L] right-padded with stop_text_token;
    text_lengths: [B] true token counts (excluding start/stop).

    Returns (emb [B, P, D], attention_mask [B, P] bool) with
    P = C + L + 2 + 1 (start_mel appended, model.py:645-653).
    """
    b, l = text_tokens.shape
    c = conds.shape[1]
    d = cfg.model_dim
    # logical text sequence [start, t_0..t_{len-1}, stop, (stop pads)...]
    full_text = jnp.concatenate(
        [
            jnp.full((b, 1), cfg.start_text_token, text_tokens.dtype),
            text_tokens,
            jnp.full((b, 1), cfg.stop_text_token, text_tokens.dtype),
        ],
        axis=1,
    )  # [B, L+2]
    full_text = jnp.where(
        jnp.arange(l + 2)[None, :] > text_lengths[:, None],
        cfg.stop_text_token,
        full_text,
    ).astype(jnp.int32)
    text_emb = params["text_embedding"][full_text] + params["text_pos_embedding"][: l + 2][None]
    seq = jnp.concatenate([conds.astype(text_emb.dtype), text_emb], axis=1)  # [B, C+L+2, D]

    core = c + l + 2
    pad = (l - text_lengths).astype(jnp.int32)  # left pad per row
    j = jnp.arange(core)[None, :]  # [1, core]
    src = j - pad[:, None]
    gathered = jnp.take_along_axis(seq, jnp.clip(src, 0, core - 1)[..., None], axis=1)
    emb_core = jnp.where((src >= 0)[..., None], gathered, 0.0)
    mask_core = src >= 0

    start_emb = (params["mel_embedding"][cfg.start_mel_token] + params["mel_pos_embedding"][0])[None, None]
    emb = jnp.concatenate([emb_core, jnp.broadcast_to(start_emb, (b, 1, d)).astype(emb_core.dtype)], axis=1)
    mask = jnp.concatenate([mask_core, jnp.ones((b, 1), bool)], axis=1)
    return emb, mask


def _mel_logits(params: Params, hidden: jnp.ndarray, return_normed: bool = False):
    """lm_head = final_norm -> mel_head (reference: model.py:48). The
    final_norm'd hidden IS the stage-2 latent the vocoder consumes
    (unified_voice_forward:397), so callers capturing latents during decode
    ask for it back."""
    from indextts_tpu.ops.quant import matmul_maybe_quantized

    h = layer_norm(hidden, params["final_norm"]["weight"], params["final_norm"]["bias"])
    logits = matmul_maybe_quantized(h, params["mel_head"])
    if return_normed:
        return logits, h
    return logits


def _pair_heads(t: jnp.ndarray) -> jnp.ndarray:
    """[L, B, H, S, Dh] -> [L, B, H/2, S, 2*Dh]: adjacent heads share the
    lane axis. With Dh=64 a per-head cache tiles 64 lanes into 128-lane
    registers — 2x physical HBM on every read; head-paired tensors are
    exactly one lane tile (decode at batch 8 is at the weights+cache
    streaming bound, docs/PERF.md)."""
    l, b, h, s, dh = t.shape
    return t.reshape(l, b, h // 2, 2, s, dh).transpose(0, 1, 2, 4, 3, 5).reshape(l, b, h // 2, s, 2 * dh)


def _pair_heads_new(t: jnp.ndarray) -> jnp.ndarray:
    """[B, H, Dh] single-position K or V -> [B, H/2, 2*Dh]."""
    b, h, dh = t.shape
    return t.reshape(b, h // 2, 2 * dh)


def _prefill(params: Params, cfg: GPTConfig, emb: jnp.ndarray, mask: jnp.ndarray, cache_len: int,
             return_hidden: bool = False, quant_kv: bool = False):
    """Run the full stack over the prompt, returning last-position logits and
    the HEAD-PAIRED caches (k2, v2), each [L, B, H/2, cache_len, 2*Dh].
    Keeping K and V separate lets the score contraction stream only K bytes
    and the value contraction only V bytes (a K|V-packed cache halves
    padding but doubles the bytes EACH contraction touches — measured a
    wash); head-pairing removes the Dh=64 lane padding. With
    `return_hidden`, also returns the final_norm'd last-position hidden
    (the latent that predicts the first mel code)."""
    hidden, (k, v) = gpt2_apply(params["gpt"], emb, cfg.heads, attention_mask=mask, return_kv=True)
    k2 = _pair_heads(k)
    v2 = _pair_heads(v)
    pad_amt = cache_len - k2.shape[3]
    pads = ((0, 0), (0, 0), (0, 0), (0, pad_amt), (0, 0))
    if quant_kv:
        # int8 cache with per-column scales (see _decode_block_q); jnp.pad
        # ZERO-fills the pad columns' scales — safe because attention bias
        # masks unwritten columns (zero scale => zero score/value); do not
        # rely on pad scales being nonzero (grow_cache zero-pads too)
        k8, ks = _quant_cols(k2)
        v8, vs = _quant_cols(v2)
        spads = pads[:-1]
        cache = (jnp.pad(k8, pads), jnp.pad(ks, spads), jnp.pad(v8, pads), jnp.pad(vs, spads))
    else:
        cache = (jnp.pad(k2, pads), jnp.pad(v2, pads))
    if return_hidden:
        logits, h = _mel_logits(params, hidden[:, -1], return_normed=True)
        return logits, cache, h
    logits = _mel_logits(params, hidden[:, -1])
    return logits, cache


def _select_paired(o2, dh: int):
    """[..., H/2, 2, 2*Dh] joint value output -> [..., H, Dh]: row t of each
    pair holds (sum attn_t . v_{2g} | sum attn_t . v_{2g+1}); keep the
    matching half."""
    lead = o2.shape[:-3]
    g2 = o2.shape[-3]
    sel = jnp.stack([o2[..., 0, :dh], o2[..., 1, dh:]], axis=-2)
    return sel.reshape(*lead, 2 * g2, dh)


def _qpad2(q: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[B, H, Dh] query -> block-diagonal [B, H/2, 2, 2*Dh] so a dot against
    the head-paired K rows contracts to exactly q_h.k_h per head (the other
    head's lanes meet zeros)."""
    b, h, dh = q.shape
    q2 = q.reshape(b, h // 2, 2, dh)
    z = jnp.zeros_like(q2[:, :, :1])
    top = jnp.concatenate([q2[:, :, :1], z], axis=-1)  # t=0: (q_{2g} | 0)
    bot = jnp.concatenate([z, q2[:, :, 1:]], axis=-1)  # t=1: (0 | q_{2g+1})
    return jnp.concatenate([top, bot], axis=2)


def _decode_block(layer_p, x, k2, v2, attn_bias, heads):
    """Single-token GPT-2 block against read-only HEAD-PAIRED caches
    (k2/v2 [B, H/2, S, 2*Dh]). x: [B, D]. The new token's K/V are NOT
    written here — attention treats them as an extra (S+1)-th logit and the
    paired rows are returned for a single batched cache write after the
    layer scan. Scores contract the block-diagonal query against k2 (exact:
    the sibling head's lanes meet zeros); the value contraction runs both
    heads' V jointly and the per-head halves are selected from the small
    output. Returns (out [B, D], (k2_new, v2_new) each [B, H/2, 2*Dh])."""
    from indextts_tpu.ops.quant import matmul_maybe_quantized

    b, d = x.shape
    dh = d // heads
    g2 = heads // 2
    s_len = k2.shape[2]
    h = layer_norm(x, layer_p["ln_1"]["weight"], layer_p["ln_1"]["bias"])
    qkv = matmul_maybe_quantized(h, layer_p["attn_qkv"])
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, heads, dh)
    k_new = k_new.reshape(b, heads, dh)
    v_new = v_new.reshape(b, heads, dh)
    scale = 1.0 / math.sqrt(dh)
    s2 = jnp.einsum("bgtd,bgsd->bgts", _qpad2(q, heads), k2).astype(jnp.float32)
    scores_c = s2.reshape(b, heads, s_len) * scale + attn_bias
    score_self = (jnp.sum(q * k_new, axis=-1, keepdims=True)).astype(jnp.float32) * scale  # [B, H, 1]
    scores = jnp.concatenate([scores_c, score_self], axis=-1)  # [B, H, S+1]
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    a2 = attn[..., :-1].reshape(b, g2, 2, s_len)
    o2 = jnp.einsum("bgts,bgsd->bgtd", a2, v2)  # [B, H/2, 2, 2*Dh]
    a = _select_paired(o2, dh) + attn[..., -1:] * v_new
    a = matmul_maybe_quantized(a.reshape(b, d), layer_p["attn_proj"])
    x = x + a
    h = layer_norm(x, layer_p["ln_2"]["weight"], layer_p["ln_2"]["bias"])
    h = gelu_new(matmul_maybe_quantized(h, layer_p["mlp_fc"]))
    h = matmul_maybe_quantized(h, layer_p["mlp_proj"])
    return x + h, (_pair_heads_new(k_new), _pair_heads_new(v_new))


def _quant_cols(t: jnp.ndarray):
    """Symmetric int8 over the trailing lane axis: t ≈ q * s[..., None].
    Used for KV-cache quantization — one scale per (layer, batch, head-pair,
    position) column, so dequantization factors out of both attention
    einsums exactly (scores: multiply by s after the contraction; values:
    fold s into the attention weights before it)."""
    tf = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(tf), axis=-1)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(tf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _decode_block_q(layer_p, x, k8, ks, v8, vs, attn_bias, heads):
    """_decode_block against an INT8 cache: k8/v8 [B, H/2, S, 2*Dh] int8 with
    per-column scales ks/vs [B, H/2, S]. HBM streams half the cache bytes;
    the int8 operand upcasts in-register inside the einsum fusion (same
    pattern as ops/quant weight streaming). Exact per-column dequant."""
    from indextts_tpu.ops.quant import matmul_maybe_quantized

    b, d = x.shape
    dh = d // heads
    g2 = heads // 2
    s_len = k8.shape[2]
    h = layer_norm(x, layer_p["ln_1"]["weight"], layer_p["ln_1"]["bias"])
    qkv = matmul_maybe_quantized(h, layer_p["attn_qkv"])
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, heads, dh)
    k_new = k_new.reshape(b, heads, dh)
    v_new = v_new.reshape(b, heads, dh)
    scale = 1.0 / math.sqrt(dh)
    s2 = jnp.einsum("bgtd,bgsd->bgts", _qpad2(q, heads), k8.astype(x.dtype)).astype(jnp.float32)
    s2 = s2 * ks[:, :, None, :]  # dequant: scale is per (b, g, s) column
    scores_c = s2.reshape(b, heads, s_len) * scale + attn_bias
    score_self = (jnp.sum(q * k_new, axis=-1, keepdims=True)).astype(jnp.float32) * scale
    scores = jnp.concatenate([scores_c, score_self], axis=-1)
    attn = jax.nn.softmax(scores, axis=-1)
    a2 = (attn[..., :-1].astype(jnp.float32).reshape(b, g2, 2, s_len)
          * vs[:, :, None, :]).astype(x.dtype)
    o2 = jnp.einsum("bgts,bgsd->bgtd", a2, v8.astype(x.dtype))
    a = _select_paired(o2, dh) + attn[..., -1:].astype(x.dtype) * v_new
    a = matmul_maybe_quantized(a.reshape(b, d), layer_p["attn_proj"])
    x = x + a
    h = layer_norm(x, layer_p["ln_2"]["weight"], layer_p["ln_2"]["bias"])
    h = gelu_new(matmul_maybe_quantized(h, layer_p["mlp_fc"]))
    h = matmul_maybe_quantized(h, layer_p["mlp_proj"])
    return x + h, (_pair_heads_new(k_new), _pair_heads_new(v_new))


def _decode_step(params: Params, cfg: GPTConfig, token, mel_pos, cache, pos, base_mask,
                 return_hidden: bool = False):
    """One decode step. token: [B] int32; mel_pos: scalar mel-position index;
    cache: head-paired (k2, v2) each [L,B,H/2,S,2*Dh]; pos: scalar write
    index in the cache; base_mask: [B, S] bool validity of already-written
    cache positions (True = attend; position `pos` itself must be False —
    the new token's K/V are handled as the extra attention logit inside the
    block). The cache may be bf16 (k2, v2) or int8 (k8, ks, v8, vs) — see
    _decode_block_q. Returns (logits [B, V], cache[, normed hidden [B, D]])."""
    x = params["mel_embedding"][token] + params["mel_pos_embedding"][mel_pos]
    attn_bias = jnp.where(base_mask[:, None, :], 0.0, NEG_INF)  # [B, 1, S]
    quant = len(cache) == 4

    if quant:
        k8_all, ks_all, v8_all, vs_all = cache

        def body(x, layer):
            layer_p, k8, ks, v8, vs = layer
            out, kv_new = _decode_block_q(layer_p, x, k8, ks, v8, vs, attn_bias, cfg.heads)
            return out, kv_new

        x, (k2_news, v2_news) = jax.lax.scan(
            body, x, (params["gpt"]["blocks"], k8_all, ks_all, v8_all, vs_all)
        )
        k8n, ksn = _quant_cols(k2_news)
        v8n, vsn = _quant_cols(v2_news)
        cache_out = (
            jax.lax.dynamic_update_slice(k8_all, k8n[:, :, :, None, :], (0, 0, 0, pos, 0)),
            jax.lax.dynamic_update_slice(ks_all, ksn[:, :, :, None], (0, 0, 0, pos)),
            jax.lax.dynamic_update_slice(v8_all, v8n[:, :, :, None, :], (0, 0, 0, pos, 0)),
            jax.lax.dynamic_update_slice(vs_all, vsn[:, :, :, None], (0, 0, 0, pos)),
        )
    else:
        k2_all, v2_all = cache

        def body(x, layer):
            layer_p, k2c, v2c = layer
            out, kv_new = _decode_block(layer_p, x, k2c, v2c, attn_bias, cfg.heads)
            return out, kv_new

        x, (k2_news, v2_news) = jax.lax.scan(body, x, (params["gpt"]["blocks"], k2_all, v2_all))
        # one column write per tensor for all layers: [L, B, H/2, 2*Dh]
        cache_out = (
            jax.lax.dynamic_update_slice(k2_all, k2_news[:, :, :, None, :], (0, 0, 0, pos, 0)),
            jax.lax.dynamic_update_slice(v2_all, v2_news[:, :, :, None, :], (0, 0, 0, pos, 0)),
        )
    x = layer_norm(x, params["gpt"]["ln_f"]["weight"], params["gpt"]["ln_f"]["bias"])
    if return_hidden:
        logits, h = _mel_logits(params, x, return_normed=True)
        return logits, cache_out, h
    logits = _mel_logits(params, x)
    return logits, cache_out


def generate_speech(
    params: Params,
    cfg: GPTConfig,
    gen: GenerationConfig,
    conds: jnp.ndarray,
    text_tokens: jnp.ndarray,
    text_lengths: jnp.ndarray,
    rng: jax.Array,
    temperature=1.0,
    top_p=0.8,
    repetition_penalty=10.0,
    typical_mass=0.9,
    input_tokens: Optional[jnp.ndarray] = None,
    capture_latents: bool = False,
    pos_off: int = 2,
    quant_kv: bool = False,
):
    """Greedy / sampled generation (num_beams == 1).

    Returns (codes [B, max_new_tokens] right-padded with stop_mel_token,
    code_lengths [B] counting tokens up to and including the stop token).
    Matches HF generate() semantics for do_sample/greedy with
    eos=pad=stop_mel_token (model.py:698-703). `input_tokens` [B, S0] are
    forced mel-code prefixes appended after start_mel (model.py:673-688);
    they occupy mel positions 1..S0 in the prefill and the returned codes
    exclude them (the reference truncates at trunc_index, model.py:704-708).

    `capture_latents=True` additionally returns lat [B, max_new, D] — the
    final_norm'd hidden that predicted each code (lat[j] is the stage-2
    latent for code j). With the default pos_off=2 these carry the decode
    loop's positional off-by-one and thus deviate from the teacher-forced
    two-pass latents; pass pos_off=1 for the consistent-positions serving
    mode where they match exactly (see decode_steps).
    """
    max_new = gen.max_new_tokens
    # one prefill/state construction for every sampling driver (one-shot,
    # streaming, segmented) — see prefill_decode_state
    state, aux = prefill_decode_state(
        params, cfg, gen, conds, text_tokens, text_lengths, rng,
        temperature=temperature, top_p=top_p, repetition_penalty=repetition_penalty,
        typical_mass=typical_mass, capture_latents=capture_latents,
        quant_kv=quant_kv, input_tokens=input_tokens,
    )
    state = decode_steps(params, cfg, state, max_new - 1, aux["p"], aux["s0"],
                         aux["prefill_valid"], aux["sample_from"], rng,
                         max_new, pos_off=pos_off)
    codes, done = state[1], state[3]

    # lengths: index of first stop + 1 (HF keeps the eos in the sequence)
    is_stop = codes == cfg.stop_mel_token
    any_stop = jnp.any(is_stop, axis=1)
    first_stop = jnp.argmax(is_stop, axis=1)
    lengths = jnp.where(any_stop, first_stop + 1, max_new)
    if capture_latents:
        return codes, lengths, state[6]
    return codes, lengths


def decode_steps(params, cfg, state, n_steps, p, s0, prefill_valid, sample_from, rng, max_new,
                 pos_off: int = 2):
    """Run up to `n_steps` decode iterations from `state`, stopping early when
    every row has emitted stop_mel_token or the code buffer is full. The
    resumable unit behind both full generation and streaming synthesis.

    `state` is (i, codes, cache, done, seen, cur) or, with latent capture,
    (i, codes, cache, done, seen, cur, lat) where lat [B, max_new, D]
    accumulates the final_norm'd hidden that predicted each code (lat[j] =
    the stage-2 latent for code j; lat[0] comes from the prefill).

    `pos_off=2` reproduces the reference inference model's mel positional
    off-by-one (generated token t embeds position t+2 counting from the
    start token; model.py:151-155). `pos_off=1` uses the consistent
    positions of the teacher-forced forward (model.py:555-572) — generation
    then deviates from reference generate() but the captured latents match
    the two-pass latent semantics exactly."""
    s_max = prefill_valid.shape[1]
    cache_positions = jnp.arange(s_max)[None, :]
    start_i = state[0]
    capture = len(state) == 7

    def cond_fn(st):
        i, done = st[0], st[3]
        return jnp.logical_and(
            jnp.logical_and(i < max_new - 1, i < start_i + n_steps), ~jnp.all(done)
        )

    def body_fn(st):
        if capture:
            i, codes, cache, done, seen, cur, lat = st
        else:
            i, codes, cache, done, seen, cur = st
        # decode token g_{i+1} at cache slot p+i; mel position (i+1)+pos_off-1
        # (+s0 when a forced prefix was prefilled)
        write_pos = p + i
        valid = prefill_valid | ((cache_positions >= p) & (cache_positions < write_pos))
        if capture:
            logits, cache, hnorm = _decode_step(
                params, cfg, cur, i + pos_off + s0, cache, write_pos, valid, return_hidden=True
            )
            lat = jax.lax.dynamic_update_slice(
                lat, hnorm[:, None, :].astype(lat.dtype), (0, i + 1, 0)
            )
        else:
            logits, cache = _decode_step(params, cfg, cur, i + pos_off + s0, cache, write_pos, valid)
        nxt = sample_from(logits, seen, rng, i + 1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.stop_mel_token, nxt)
        codes = codes.at[:, i + 1].set(nxt)
        done = done | (nxt == cfg.stop_mel_token)
        seen = seen.at[jnp.arange(codes.shape[0]), nxt].set(True)
        if capture:
            return (i + 1, codes, cache, done, seen, nxt, lat)
        return (i + 1, codes, cache, done, seen, nxt)

    return jax.lax.while_loop(cond_fn, body_fn, state)


def prefill_decode_state(
    params: Params,
    cfg: GPTConfig,
    gen: GenerationConfig,
    conds: jnp.ndarray,
    text_tokens: jnp.ndarray,
    text_lengths: jnp.ndarray,
    rng: jax.Array,
    temperature=1.0,
    top_p=0.8,
    repetition_penalty=10.0,
    typical_mass=0.9,
    cache_len: Optional[int] = None,
    capture_latents: bool = False,
    quant_kv: bool = False,
    input_tokens: Optional[jnp.ndarray] = None,
):
    """Prefill + first token; returns (state, aux) where aux carries the
    static context needed to resume with `decode_steps`. The SINGLE prefill/
    state construction behind one-shot generation (generate_speech), the
    streaming engine path, and segmented decoding (cache_len < p + max_new
    allocates a smaller cache to be grown later with `grow_cache`). With
    `capture_latents` the state carries the [B, max_new, D] latent buffer
    (see decode_steps). `input_tokens` [B, S0] are forced mel-code prefixes
    appended after start_mel at mel positions 1..S0 (model.py:673-688);
    aux["s0"] must be forwarded to decode_steps."""
    b, l = text_tokens.shape
    v = cfg.number_mel_codes
    emb, prefill_mask = prepare_gpt_inputs(params, cfg, conds, text_tokens, text_lengths)
    if input_tokens is not None:
        s0 = input_tokens.shape[1]
        prefix_emb = (
            params["mel_embedding"][input_tokens.astype(jnp.int32)]
            + params["mel_pos_embedding"][1 : s0 + 1][None]
        )
        emb = jnp.concatenate([emb, prefix_emb.astype(emb.dtype)], axis=1)
        prefill_mask = jnp.concatenate([prefill_mask, jnp.ones((b, s0), bool)], axis=1)
    else:
        s0 = 0
    p = emb.shape[1]
    max_new = gen.max_new_tokens
    s_max = cache_len if cache_len is not None else p + max_new
    if capture_latents:
        logits0, cache, h0 = _prefill(params, cfg, emb, prefill_mask, s_max,
                                      return_hidden=True, quant_kv=quant_kv)
    else:
        logits0, cache = _prefill(params, cfg, emb, prefill_mask, s_max, quant_kv=quant_kv)
    # seen-token mask for repetition penalty: HF penalizes over the whole
    # input_ids row — the fake inputs are all 1s with a trailing start_mel
    # (model.py:645-653), so ids {1, start_mel} start out "seen".
    seen0 = jnp.zeros((b, v), bool).at[:, 1].set(True).at[:, cfg.start_mel_token].set(True)
    if input_tokens is not None:
        seen0 = seen0.at[jnp.arange(b)[:, None], input_tokens.astype(jnp.int32)].set(True)
    prefill_valid = jnp.pad(prefill_mask, ((0, 0), (0, s_max - p)))

    def sample_from(logits, seen, key, step):
        lf = process_logits(
            logits, seen_mask=seen, repetition_penalty=repetition_penalty,
            typical_sampling=gen.typical_sampling, typical_mass=typical_mass,
            temperature=temperature, top_k=gen.top_k if gen.do_sample else 0,
            top_p=top_p, do_sample=gen.do_sample,
        )
        if gen.do_sample:
            return sample_token(jax.random.fold_in(key, step), lf)
        return greedy_token(lf)

    tok1 = sample_from(logits0, seen0, rng, 0).astype(jnp.int32)
    done0 = tok1 == cfg.stop_mel_token
    codes0 = jnp.full((b, max_new), cfg.stop_mel_token, jnp.int32).at[:, 0].set(tok1)
    seen1 = seen0.at[jnp.arange(b), tok1].set(True)
    if capture_latents:
        lat0 = jnp.zeros((b, max_new, cfg.model_dim), emb.dtype)
        lat0 = jax.lax.dynamic_update_slice(lat0, h0[:, None, :].astype(lat0.dtype), (0, 0, 0))
        state = (jnp.asarray(0), codes0, cache, done0, seen1, tok1, lat0)
    else:
        state = (jnp.asarray(0), codes0, cache, done0, seen1, tok1)
    aux = {"p": p, "s0": s0, "prefill_valid": prefill_valid, "sample_from": sample_from,
           "rng": rng, "max_new": max_new}
    return state, aux


def grow_cache(state, prefill_valid, extra: int):
    """Extend a decode state's KV cache and validity mask by `extra` slots
    (the segmented-decode transition: each segment runs against the smallest
    cache that fits, so attention never streams unused slots). Handles both
    the bf16 (k2, v2) and int8 (k8, ks, v8, vs) cache forms."""
    i, codes, cache, done, seen, cur, *rest = state
    pads = ((0, 0), (0, 0), (0, 0), (0, extra), (0, 0))
    spads = pads[:-1]
    cache = tuple(jnp.pad(c, pads if c.ndim == 5 else spads) for c in cache)
    prefill_valid = jnp.pad(prefill_valid, ((0, 0), (0, extra)))
    return (i, codes, cache, done, seen, cur, *rest), prefill_valid


def generate_speech_segmented(
    params: Params,
    cfg: GPTConfig,
    gen: GenerationConfig,
    conds: jnp.ndarray,
    text_tokens: jnp.ndarray,
    text_lengths: jnp.ndarray,
    rng: jax.Array,
    temperature=1.0,
    top_p=0.8,
    repetition_penalty=10.0,
    typical_mass=0.9,
    segment: int = 160,
    jit_cache: Optional[Dict[Any, Any]] = None,
    capture_latents: bool = False,
    pos_off: int = 2,
    quant_kv: bool = False,
):
    """generate_speech with segment-growing KV cache (host-side driver).

    Identical sampling state machine and outputs as generate_speech, but the
    cache starts at p + segment and grows by `segment` between device calls,
    so per-step attention reads scale with generated length instead of
    max_new_tokens. Worth it when max_new_tokens >> typical generation
    length; each (segment index) compiles once per shape bucket.
    `capture_latents`/`pos_off` as in generate_speech.

    ALWAYS pass `jit_cache` for repeated calls (the engine passes its
    per-engine dict): the default None builds a FRESH dict per call, so
    every per-segment closure re-traces — minutes of remote compile per
    segment on this platform. It cannot default to a module-level dict:
    the keys carry shapes/gen but NOT the model config, so two models with
    equal shapes would collide.
    """
    b, l = text_tokens.shape
    max_new = gen.max_new_tokens
    n_segments = -(-max_new // segment)
    cache = jit_cache if jit_cache is not None else {}
    # p is static from shapes: c + l + 2 + 1
    p = conds.shape[1] + l + 2 + 1

    def seg_fns(seg_idx: int):
        cache_len = p + min(segment * (seg_idx + 1), max_new)
        # p participates: the closures capture cache_len/p, and p depends on
        # the conditioning length (cond counts can differ across calls under
        # condition_type='conformer_encoder')
        key = ("seg", b, l, p, gen, segment, seg_idx, capture_latents, pos_off, quant_kv)
        if key not in cache:
            if seg_idx == 0:
                @jax.jit
                def prefill_fn(params, conds, text_tokens, text_lengths, rng, temperature, top_p, repetition_penalty, typical_mass):
                    state, aux = prefill_decode_state(
                        params, cfg, gen, conds, text_tokens, text_lengths, rng,
                        temperature=temperature, top_p=top_p, repetition_penalty=repetition_penalty,
                        typical_mass=typical_mass, cache_len=cache_len,
                        capture_latents=capture_latents, quant_kv=quant_kv,
                    )
                    state = decode_steps(
                        params, cfg, state, segment - 1, aux["p"], 0, aux["prefill_valid"],
                        aux["sample_from"], rng, max_new, pos_off=pos_off,
                    )
                    return state, aux["prefill_valid"]

                cache[key] = prefill_fn
            else:
                n_steps = min(segment * (seg_idx + 1), max_new) - segment * seg_idx

                @jax.jit
                def step_fn(params, state, prefill_valid, rng, temperature, top_p, repetition_penalty, typical_mass):
                    def sample_from(logits, seen, key_, step):
                        lf = process_logits(
                            logits, seen_mask=seen, repetition_penalty=repetition_penalty,
                            typical_sampling=gen.typical_sampling, typical_mass=typical_mass,
                            temperature=temperature, top_k=gen.top_k if gen.do_sample else 0,
                            top_p=top_p, do_sample=gen.do_sample,
                        )
                        if gen.do_sample:
                            return sample_token(jax.random.fold_in(key_, step), lf)
                        return greedy_token(lf)

                    state2, prefill_valid2 = grow_cache(state, prefill_valid, cache_len - prefill_valid.shape[1])
                    state2 = decode_steps(
                        params, cfg, state2, n_steps, p, 0, prefill_valid2, sample_from, rng,
                        max_new, pos_off=pos_off,
                    )
                    return state2, prefill_valid2

                cache[key] = step_fn
        return cache[key]

    args = (jnp.float32(temperature), jnp.float32(top_p), jnp.float32(repetition_penalty), jnp.float32(typical_mass))
    state, prefill_valid = seg_fns(0)(params, conds, text_tokens, text_lengths, rng, *args)
    for k_seg in range(1, n_segments):
        done = state[3]
        if bool(jax.device_get(jnp.all(done))):
            break
        state, prefill_valid = seg_fns(k_seg)(params, state, prefill_valid, rng, *args)

    codes = state[1]
    is_stop = codes == cfg.stop_mel_token
    any_stop = jnp.any(is_stop, axis=1)
    first_stop = jnp.argmax(is_stop, axis=1)
    lengths = jnp.where(any_stop, first_stop + 1, max_new)
    if capture_latents:
        return codes, lengths, state[6]
    return codes, lengths


def inference_speech(
    params: Params,
    cfg: GPTConfig,
    speech_conditioning_mel: jnp.ndarray,
    text_inputs: jnp.ndarray,
    text_lengths: jnp.ndarray,
    cond_mel_lengths: Optional[jnp.ndarray] = None,
    input_tokens: Optional[jnp.ndarray] = None,
    num_return_sequences: int = 1,
    max_generate_length: Optional[int] = None,
    typical_sampling: bool = False,
    typical_mass: float = 0.9,
    do_sample: bool = True,
    top_k: int = 30,
    top_p: float = 0.8,
    temperature: float = 1.0,
    num_beams: int = 1,
    repetition_penalty: float = 10.0,
    length_penalty: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """High-level generation mirroring UnifiedVoice.inference_speech
    (model.py:655-708): conditioning -> prepare inputs -> generate, with
    num_return_sequences realized as row tiling (rows sample independently)
    and optional forced `input_tokens` prefixes."""
    from indextts_tpu.models.gpt import get_conditioning

    if speech_conditioning_mel.ndim == 2:
        speech_conditioning_mel = speech_conditioning_mel[None]
    if cond_mel_lengths is None:
        cond_mel_lengths = jnp.asarray([speech_conditioning_mel.shape[1]])
    conds = get_conditioning(params, cfg, speech_conditioning_mel, cond_mel_lengths)
    b = text_inputs.shape[0]
    if conds.shape[0] == 1 and b > 1:
        conds = jnp.broadcast_to(conds, (b,) + conds.shape[1:])
    if num_return_sequences > 1:
        # reference asserts divisibility loudly (model.py:678-681); silent
        # integer division would return too few (or zero) sequences
        if b > 1 and num_return_sequences % b != 0:
            raise ValueError(
                f"num_return_sequences ({num_return_sequences}) must be a "
                f"multiple of the batch size ({b})"
            )
        reps = num_return_sequences // b if b > 1 else num_return_sequences
        conds = jnp.repeat(conds, reps, axis=0)
        text_inputs = jnp.repeat(text_inputs, reps, axis=0)
        text_lengths = jnp.repeat(text_lengths, reps, axis=0)
        if input_tokens is not None:
            if input_tokens.ndim == 1:
                input_tokens = input_tokens[None]
            input_tokens = jnp.repeat(
                input_tokens, conds.shape[0] // input_tokens.shape[0], axis=0
            )
    max_new = max_generate_length if max_generate_length is not None else cfg.max_mel_tokens - 1
    # cap at the mel positional table even WITHOUT a prefix: decode position
    # i+2 for i < max_new needs max_new+1 <= max_mel_tokens+1 table rows;
    # past that the on-device position gather clamps silently (every late
    # token reuses the last positional row — degraded audio, no error),
    # where the torch reference errors out of the embedding lookup. The
    # engine clamps requests upstream (_clamp_mel_tokens); this guards
    # direct callers of this wrapper.
    max_new = min(int(max_new), cfg.max_mel_tokens)
    if input_tokens is not None:
        # a forced prefix of s0 codes shifts every decode mel position by s0;
        # cap max_new so s0 + max_new stays inside the positional table
        # (max_mel_tokens + 2 rows, gpt.py) — the torch reference errors out
        # of the embedding lookup instead of silently clamping the gather
        s0 = input_tokens.shape[-1]
        max_new = min(int(max_new), cfg.max_mel_tokens - 1 - s0)
        if max_new <= 0:
            raise ValueError(
                f"input_tokens prefix ({s0}) leaves no room under "
                f"max_mel_tokens ({cfg.max_mel_tokens})"
            )
    gen = GenerationConfig(
        do_sample=do_sample,
        num_beams=num_beams,
        top_k=int(top_k) if top_k else 0,
        typical_sampling=typical_sampling,
        max_new_tokens=int(max_new),
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if num_beams > 1:
        # forced prefixes ride the per-row shared prefill of the lineage
        # beam (ref model.py:690-703 reaches the same through HF generate's
        # input_ids; round-5 close of the last loud parity delta)
        return generate_speech_beam(
            params, cfg, gen, conds, text_inputs, text_lengths, rng,
            temperature=temperature, top_p=top_p, repetition_penalty=repetition_penalty,
            length_penalty=length_penalty, typical_mass=typical_mass,
            input_tokens=input_tokens,
        )
    return generate_speech(
        params, cfg, gen, conds, text_inputs, text_lengths, rng,
        temperature=temperature, top_p=top_p, repetition_penalty=repetition_penalty,
        typical_mass=typical_mass, input_tokens=input_tokens,
    )


# ---------------------------------------------------------------------------
# beam search (num_beams > 1): HF beam_search / beam_sample semantics
# ---------------------------------------------------------------------------


def _generate_speech_beam_dense(
    params: Params,
    cfg: GPTConfig,
    gen: GenerationConfig,
    conds: jnp.ndarray,
    text_tokens: jnp.ndarray,
    text_lengths: jnp.ndarray,
    rng: jax.Array,
    temperature=1.0,
    top_p=0.8,
    repetition_penalty=10.0,
    length_penalty=0.0,
    typical_mass=0.9,
    input_tokens: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference implementation of beam decode: the whole (prefill +
    generated) KV cache is gathered on every beam reorder (replaces HF
    `_reorder_cache`, model.py:194-207). Superseded as the default by
    `generate_speech_beam` (split-cache), which it oracles in tests.

    With do_sample=True this is HF's beam_sample (warpers on the JOINT
    scores, stochastic successor draw); otherwise deterministic beam search.
    Processor/warper ordering and the length-penalty base follow HF exactly
    — see _beam_joint_scores / _beam_step (score = logprob_sum /
    ((prefill_len + generated_len) ** length_penalty)).

    Returns (codes [B, max_new], lengths [B]) for the best finished beam.
    """
    nb = gen.num_beams
    b, l = text_tokens.shape
    v = cfg.number_mel_codes
    d = cfg.model_dim

    def expand(x):
        return jnp.repeat(x, nb, axis=0)

    conds_e = expand(conds)
    text_e = expand(text_tokens)
    len_e = expand(text_lengths)
    emb, prefill_mask = prepare_gpt_inputs(params, cfg, conds_e, text_e, len_e)
    # forced mel-code prefixes (ref model.py:690-703): expanded per beam
    # like the text, appended at mel positions 1..S0
    if input_tokens is not None:
        s0 = input_tokens.shape[1]
        it_e = expand(input_tokens.astype(jnp.int32))
        prefix_emb = (
            params["mel_embedding"][it_e]
            + params["mel_pos_embedding"][1 : s0 + 1][None]
        )
        emb = jnp.concatenate([emb, prefix_emb.astype(emb.dtype)], axis=1)
        prefill_mask = jnp.concatenate(
            [prefill_mask, jnp.ones((emb.shape[0], s0), bool)], axis=1)
    else:
        s0 = 0
    p = emb.shape[1]
    max_new = gen.max_new_tokens
    s_max = p + max_new
    bb = b * nb

    logits0, cache = _prefill(params, cfg, emb, prefill_mask, s_max)
    seen0 = jnp.zeros((bb, v), bool).at[:, 1].set(True).at[:, cfg.start_mel_token].set(True)
    if input_tokens is not None:
        seen0 = seen0.at[jnp.arange(bb)[:, None], it_e].set(True)

    cache_positions = jnp.arange(s_max)[None, :]
    prefill_valid = jnp.pad(prefill_mask, ((0, 0), (0, s_max - p)))

    def joint_fn(logits, seen, beam_scores):
        return _beam_joint_scores(logits, seen, beam_scores, gen,
                                  temperature, top_p, repetition_penalty, typical_mass)

    def select(cand, key, step):
        return _select_successors(cand, key, step, gen, nb)

    # beam state
    beam_scores0 = jnp.tile(jnp.array([0.0] + [NEG_INF] * (nb - 1), jnp.float32), (b,))  # [bb]
    codes0 = jnp.full((bb, max_new), cfg.stop_mel_token, jnp.int32)

    # best finished hypotheses per batch row
    best_score0 = jnp.full((b,), NEG_INF, jnp.float32)
    best_codes0 = jnp.full((b, max_new), cfg.stop_mel_token, jnp.int32)
    best_len0 = jnp.zeros((b,), jnp.int32)

    def step_beams(i, logits, state):
        codes, beam_scores, seen, done_best = state
        return _beam_step(cfg, gen, i, logits, codes, beam_scores, seen, done_best,
                          joint_fn, select, rng, b, nb, length_penalty, prefill_len=p)

    # first step from prefill logits
    codes, beam_scores, seen, done_best, flat_src, cur = step_beams(
        0, logits0, (codes0, beam_scores0, seen0, (best_score0, best_codes0, best_len0))
    )
    cache = jax.tree_util.tree_map(lambda t: t[:, flat_src], cache)

    def cond_fn(state):
        i, codes, beam_scores, cache, seen, cur, (best_score, _, _) = state
        if not gen.early_stopping:
            return i < max_new - 1
        # optimistic continuing score cannot beat best finished -> stop
        base = _beam_stop_bound_base(length_penalty, p, max_new, i)
        best_possible = jnp.max(beam_scores.reshape(b, nb), axis=1) / base**jnp.asarray(length_penalty, jnp.float32)
        return jnp.logical_and(i < max_new - 1, jnp.any(best_possible > best_score))

    def body_fn(state):
        i, codes, beam_scores, cache, seen, cur, done_best = state
        write_pos = p + i
        # prefill masks are identical across beams of one batch row, so the
        # pre-gather mask stays valid after beam reordering
        valid = prefill_valid | ((cache_positions >= p) & (cache_positions < write_pos))
        logits, cache2 = _decode_step(params, cfg, cur, i + 2 + s0, cache, write_pos, valid)
        codes, beam_scores, seen, done_best, flat_src, nxt = step_beams(
            i + 1, logits, (codes, beam_scores, seen, done_best)
        )
        cache2 = jax.tree_util.tree_map(lambda t: t[:, flat_src], cache2)
        return (i + 1, codes, beam_scores, cache2, seen, nxt, done_best)

    # counter semantics match the greedy loop: body iteration i consumes the
    # (i+1)-th generated token, writes its K/V at cache slot p+i with mel
    # position i+2, and step_beams(i+1) records the successor at codes[:, i+1]
    state = (jnp.asarray(0), codes, beam_scores, cache, seen, cur, done_best)
    i, codes, beam_scores, cache, seen, cur, (best_score, best_codes, best_len) = jax.lax.while_loop(
        cond_fn, body_fn, state
    )

    return _beam_finalize(codes, beam_scores, (best_score, best_codes, best_len),
                          b, nb, max_new, length_penalty, p)


def _roll_beams(t: jnp.ndarray, delta: int, nb: int) -> jnp.ndarray:
    """Static sibling-rotation within each row's beam group of a flat
    [B*nb, ...] tensor: result[(b, m)] = t[(b, (m + delta) % nb)]."""
    if delta % nb == 0:
        return t
    bn = t.shape[0]
    g = t.reshape(bn // nb, nb, *t.shape[1:])
    idx = tuple((m + delta) % nb for m in range(nb))
    return jnp.concatenate([g[:, m : m + 1] for m in idx], axis=1).reshape(t.shape)


def _decode_block_beam_lineage(layer_p, x, kvp, kvg, lin_masks, bias_p, bias_g, heads, nb):
    # x: [B*nb, D] (beams row-major: row*nb + beam, matching jnp.repeat).
    # kvp: shared HEAD-PAIRED prefill cache (k2, v2) each [B, H/2, P, 2*Dh]
    # (identical for all beams of a row, never gathered). kvg: generated-
    # region cache (k2, v2) each [B*nb, H/2, N, 2*Dh]. bias_p: [B, P]
    # additive; bias_g: [1, N] additive. Returns (out [B*nb, D],
    # (k2_new, v2_new) each [B*nb, H/2, 2*Dh]).
    """Beam decode block with an UNPERMUTED split cache: beam ancestry is
    resolved inside attention instead of physically reordering the
    [B*nb, H, N, Dh] generated cache every step. The physical reorder
    measured ~16 of the 21 ms/step beam loop (tools/trace_beam.py) — both
    as a gather and as a one-hot matmul, because any re-layout of the
    lane-padded 590 MB cache pays ~6 ms. Formulations that reshaped or
    sliced the cache per source beam made XLA flip the cache layout to
    N-in-lanes, which turned the per-step column write into a ~2.6 ms
    full-buffer copy; so kg/vg appear ONLY in the exact einsum forms the
    greedy path uses, and the lineage selection happens on the SMALL
    tensors: queries / scores / attention rows are rotated within each
    beam group (sibling rows share a batch row) and masked per rotation.

    lin_masks[delta][r, 1, s] = 1 iff query row r takes position s from the
    sibling cache row rotated by -delta (delta = (m - j) % nb for query
    beam m and source beam j). Exact: each selected score is the identical
    dot product the permuted cache would produce, and each discarded term
    is an exact zero, which cannot perturb float accumulation. Semantics of
    HF _reorder_cache (reference model.py:194-207).
    """
    from indextts_tpu.ops.quant import matmul_maybe_quantized

    # bf16 caches are 2-tuples (k2, v2); int8 caches (quant_kv beams) are
    # 4-tuples (k8, ks, v8, vs) with per-column scales — the dequant factors
    # out of both contractions exactly as in _decode_block_q (scores: scale
    # AFTER the int8 contraction; values: fold the scale into the attention
    # weights BEFORE it), so the lineage machinery is untouched.
    qp = len(kvp) == 4
    qg = len(kvg) == 4
    if qp:
        k8p, ksp, v8p, vsp = kvp
    else:
        k2p, v2p = kvp
    if qg:
        k8g, ksg, v8g, vsg = kvg
    else:
        k2g, v2g = kvg
    bn, d = x.shape
    b = bn // nb
    dh = d // heads
    g2 = heads // 2
    h = layer_norm(x, layer_p["ln_1"]["weight"], layer_p["ln_1"]["bias"])
    qkv = matmul_maybe_quantized(h, layer_p["attn_qkv"])
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(bn, heads, dh)
    k_new = k_new.reshape(bn, heads, dh)
    v_new = v_new.reshape(bn, heads, dh)
    scale = 1.0 / math.sqrt(dh)

    p_len = (k8p if qp else k2p).shape[2]
    n_len = (k8g if qg else k2g).shape[2]
    qb2 = _qpad2(q, heads).reshape(b, nb, g2, 2, 2 * dh)
    if qp:
        sp = jnp.einsum("bngtd,bgpd->bngtp", qb2, k8p.astype(x.dtype)).astype(jnp.float32)
        sp = sp * ksp[:, None, :, None, :] * scale
    else:
        sp = jnp.einsum("bngtd,bgpd->bngtp", qb2, k2p).astype(jnp.float32) * scale
    sp = (sp + bias_p[:, None, None, None, :]).reshape(bn, heads, p_len)

    # scores: s_d[c, s] = q[sibling(c, +delta)] . kg[c, s]; rotate back to
    # query rows and lineage-select. (Stacking the rotated queries on an
    # extra einsum dim to read the cache once instead of nb times flips the
    # cache layout and nets out SLOWER: 9.8 vs 7.6 ms/step — the per-delta
    # form keeps the greedy path's operand shapes and cheap column write.)
    kg_op = k8g.astype(x.dtype) if qg else k2g
    sg = None
    for delta in range(nb):
        qd = _roll_beams(_qpad2(q, heads), delta, nb)
        s_d = jnp.einsum("bgtd,bgsd->bgts", qd, kg_op).astype(jnp.float32)
        if qg:
            s_d = s_d * ksg[:, :, None, :]
        s_d = s_d.reshape(bn, heads, n_len)
        term = _roll_beams(s_d, -delta, nb) * lin_masks[delta]
        sg = term if sg is None else sg + term
    sg = sg * scale + bias_g[:, None, :]
    ss = jnp.sum(q * k_new, axis=-1, keepdims=True).astype(jnp.float32) * scale
    scores = jnp.concatenate([sp, sg, ss], axis=-1)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ap2 = attn[..., :p_len].reshape(b, nb, g2, 2, p_len)
    if qp:
        ap2 = (ap2.astype(jnp.float32) * vsp[:, None, :, None, :]).astype(x.dtype)
        op_v = jnp.einsum("bngtp,bgpd->bngtd", ap2, v8p.astype(x.dtype))
    else:
        op_v = jnp.einsum("bngtp,bgpd->bngtd", ap2, v2p)
    op = _select_paired(op_v, dh).reshape(bn, heads, dh)
    # values: mask the attention rows to the positions sourced at this
    # rotation, rotate them onto their cache rows, contract, rotate back
    ag = attn[..., p_len:-1]
    vg_op = v8g.astype(x.dtype) if qg else v2g
    og = None
    for delta in range(nb):
        a_d = _roll_beams(ag * lin_masks[delta].astype(x.dtype), delta, nb).reshape(bn, g2, 2, n_len)
        if qg:
            a_d = (a_d.astype(jnp.float32) * vsg[:, :, None, :]).astype(x.dtype)
        o_d = _select_paired(jnp.einsum("bgts,bgsd->bgtd", a_d, vg_op), dh)
        term = _roll_beams(o_d, -delta, nb)
        og = term if og is None else og + term
    out = op + og + attn[..., -1:] * v_new
    a = matmul_maybe_quantized(out.reshape(bn, d), layer_p["attn_proj"])
    x = x + a
    h = layer_norm(x, layer_p["ln_2"]["weight"], layer_p["ln_2"]["bias"])
    h = gelu_new(matmul_maybe_quantized(h, layer_p["mlp_fc"]))
    h = matmul_maybe_quantized(h, layer_p["mlp_proj"])
    return x + h, (_pair_heads_new(k_new), _pair_heads_new(v_new))


def _write_beam_cache(kvg, kv_news, i):
    """Write this step's per-layer (k_new, v_new) columns into the generated
    beam cache at slot i — bf16 2-tuple or int8 4-tuple (quant_kv), same
    column-write shapes as the greedy _decode_step."""
    k2n, v2n = kv_news
    if len(kvg) == 4:
        k8, ks, v8, vs = kvg
        k8n, ksn = _quant_cols(k2n)
        v8n, vsn = _quant_cols(v2n)
        return (
            jax.lax.dynamic_update_slice(k8, k8n[:, :, :, None, :], (0, 0, 0, i, 0)),
            jax.lax.dynamic_update_slice(ks, ksn[:, :, :, None], (0, 0, 0, i)),
            jax.lax.dynamic_update_slice(v8, v8n[:, :, :, None, :], (0, 0, 0, i, 0)),
            jax.lax.dynamic_update_slice(vs, vsn[:, :, :, None], (0, 0, 0, i)),
        )
    return tuple(
        jax.lax.dynamic_update_slice(c, n[:, :, :, None, :], (0, 0, 0, i, 0))
        for c, n in zip(kvg, kv_news)
    )


def _empty_beam_cache(layers, bb, g2, n, dh2, dtype, quant_kv):
    """Zero generated-region cache (positions are bias-masked until written)."""
    if quant_kv:
        return (
            jnp.zeros((layers, bb, g2, n, dh2), jnp.int8),
            jnp.ones((layers, bb, g2, n), jnp.float32),
            jnp.zeros((layers, bb, g2, n, dh2), jnp.int8),
            jnp.ones((layers, bb, g2, n), jnp.float32),
        )
    return (
        jnp.zeros((layers, bb, g2, n, dh2), dtype),
        jnp.zeros((layers, bb, g2, n, dh2), dtype),
    )


def generate_speech_beam(
    params: Params,
    cfg: GPTConfig,
    gen: GenerationConfig,
    conds: jnp.ndarray,
    text_tokens: jnp.ndarray,
    text_lengths: jnp.ndarray,
    rng: jax.Array,
    temperature=1.0,
    top_p=0.8,
    repetition_penalty=10.0,
    length_penalty=0.0,
    typical_mass=0.9,
    quant_kv: bool = False,
    capture_latents: bool = False,
    pos_off: int = 2,
    input_tokens: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam decode with a split, NEVER-REORDERED KV cache: the prefill runs
    once per batch row (not per beam) and is shared read-only across beams;
    the head-paired generated-region cache (k2, v2 each
    [L, B*nb, H/2, max_new, 2*Dh]) stays where each
    physical row wrote it, and beam ancestry is resolved inside attention
    from a small per-position lineage map (_decode_block_beam_lineage) —
    the HF `_reorder_cache` equivalent (model.py:194-207) with zero
    per-step cache movement (physical reorders measured 16 of 21 ms/step,
    tools/trace_beam.py; this runs at ~7.6 ms/step). Sampling semantics
    identical to `_generate_speech_beam_dense` (the oracle in
    tests/test_beam_oracle.py).

    `capture_latents`/`pos_off` as in generate_speech: with capture the
    per-step final_norm'd hiddens stay in their PHYSICAL rows (the latent
    buffer is never reordered, same rule as the cache) and the winner's
    latents are resolved by ONE lineage gather at finalize
    (_gather_beam_latents) — the serving mode that skips the engine's
    teacher-forced latent pass for beams too (pos_off=1 for two-pass
    latent parity; ref infer.py:196-200).

    Returns (codes [B, max_new], lengths [B]) for the best finished beam,
    plus latents [B, max_new, D] under capture_latents.
    """
    nb = gen.num_beams
    b, l = text_tokens.shape
    v = cfg.number_mel_codes
    bb = b * nb
    max_new = gen.max_new_tokens
    d = cfg.model_dim
    heads = cfg.heads
    dh = d // heads
    layers = cfg.layers

    emb, prefill_mask = prepare_gpt_inputs(params, cfg, conds, text_tokens, text_lengths)
    # forced mel-code prefixes (ref model.py:690-703, HF generate input_ids):
    # the prefix rides the per-ROW prefill — it is identical across a row's
    # beams, exactly like the text, so the shared read-only prefill cache
    # covers it with no per-beam duplication
    if input_tokens is not None:
        s0 = input_tokens.shape[1]
        prefix_emb = (
            params["mel_embedding"][input_tokens.astype(jnp.int32)]
            + params["mel_pos_embedding"][1 : s0 + 1][None]
        )
        emb = jnp.concatenate([emb, prefix_emb.astype(emb.dtype)], axis=1)
        prefill_mask = jnp.concatenate([prefill_mask, jnp.ones((b, s0), bool)], axis=1)
    else:
        s0 = 0
    p = emb.shape[1]
    # prefill on B rows only; packed cache stays [L, B, H, P, 2*Dh]
    # (int8 + per-column scales under quant_kv)
    if capture_latents:
        logits0_b, kvp, h0 = _prefill(params, cfg, emb, prefill_mask, p,
                                      return_hidden=True, quant_kv=quant_kv)
    else:
        logits0_b, kvp = _prefill(params, cfg, emb, prefill_mask, p, quant_kv=quant_kv)
    logits0 = jnp.repeat(logits0_b, nb, axis=0)  # [bb, V]

    kvg = _empty_beam_cache(layers, bb, heads // 2, max_new, 2 * dh, emb.dtype, quant_kv)

    seen0 = jnp.zeros((bb, v), bool).at[:, 1].set(True).at[:, cfg.start_mel_token].set(True)
    if input_tokens is not None:
        it_bb = jnp.repeat(input_tokens.astype(jnp.int32), nb, axis=0)
        seen0 = seen0.at[jnp.arange(bb)[:, None], it_bb].set(True)
    bias_p = jnp.where(prefill_mask, 0.0, NEG_INF).astype(jnp.float32)  # [B, P]
    gen_positions = jnp.arange(max_new)[None, :]

    def joint_fn(logits, seen, beam_scores):
        return _beam_joint_scores(logits, seen, beam_scores, gen,
                                  temperature, top_p, repetition_penalty, typical_mass)

    def select(cand, key, step):
        return _select_successors(cand, key, step, gen, nb)

    beam_scores0 = jnp.tile(jnp.array([0.0] + [NEG_INF] * (nb - 1), jnp.float32), (b,))
    codes0 = jnp.full((bb, max_new), cfg.stop_mel_token, jnp.int32)
    best0 = (jnp.full((b,), NEG_INF, jnp.float32), jnp.full((b, max_new), cfg.stop_mel_token, jnp.int32),
             jnp.zeros((b,), jnp.int32))
    # nothing written to kg/vg yet -> the lineage map starts empty (zeros)
    lin0 = jnp.zeros((bb, max_new), jnp.int32)
    if capture_latents:
        best0 = best0 + (jnp.zeros((b, max_new), jnp.int32),)

    def step_beams(si, logits, codes, beam_scores, seen, done_best, lin_c=None):
        # the shared successor-selection step (one definition for every beam
        # driver — _beam_step with the shared joint/select helpers)
        return _beam_step(
            cfg, gen, si, logits, codes, beam_scores, seen, done_best, joint_fn,
            select, rng, b, nb, length_penalty, prefill_len=p, lin_c=lin_c,
        )

    codes, beam_scores, seen, done_best, flat_src, cur = step_beams(
        0, logits0, codes0, beam_scores0, seen0, best0,
        lin_c=lin0 if capture_latents else None,
    )
    own_local = (jnp.arange(bb) % nb).astype(jnp.int32)

    def cond_fn(state):
        i, beam_scores, best_score = state[0], state[2], state[7][0]
        if not gen.early_stopping:
            return i < max_new - 1
        base = _beam_stop_bound_base(length_penalty, p, max_new, i)
        best_possible = jnp.max(beam_scores.reshape(b, nb), axis=1) / base**jnp.asarray(length_penalty, jnp.float32)
        return jnp.logical_and(i < max_new - 1, jnp.any(best_possible > best_score))

    def body_fn(state):
        i, codes, beam_scores, kvg, lin, seen, cur, done_best, *lat_s = state
        x = params["mel_embedding"][cur] + params["mel_pos_embedding"][i + pos_off + s0]
        bias_g = jnp.where(gen_positions < i, 0.0, NEG_INF).astype(jnp.float32)  # [1, N]
        # lin_masks[delta][r, 1, s]: 1 iff query row r = (b, m) takes
        # position s from the sibling cache row with beam (m - delta) % nb
        # (positions >= i are bias-masked; their lineage value is irrelevant)
        m_idx = (jnp.arange(bb, dtype=jnp.int32) % nb)[:, None]  # [bb, 1]
        lin_masks = [
            (((m_idx - lin) % nb) == delta).astype(jnp.float32)[:, None, :]
            for delta in range(nb)
        ]

        def scan_body(x, layer):
            layer_p, kvgl, kvpl = layer
            out, kv_new = _decode_block_beam_lineage(
                layer_p, x, kvpl, kvgl, lin_masks, bias_p, bias_g, heads, nb
            )
            return out, kv_new

        x, kv_news = jax.lax.scan(scan_body, x, (params["gpt"]["blocks"], kvg, kvp))
        kvg2 = _write_beam_cache(kvg, kv_news, i)
        x = layer_norm(x, params["gpt"]["ln_f"]["weight"], params["gpt"]["ln_f"]["bias"])
        # compose this step's write into the lineage BEFORE successor
        # selection so a finishing hypothesis snapshots its full ancestry
        lin_c = jax.lax.dynamic_update_slice(lin, own_local[:, None], (0, i))
        if lat_s:
            # PHYSICAL-row latent store (never reordered, like the cache);
            # the latent is the final_norm'd hidden (the same normed tensor
            # _mel_logits feeds the mel head — greedy capture convention)
            logits, hnorm = _mel_logits(params, x, return_normed=True)
            lat = jax.lax.dynamic_update_slice(
                lat_s[0], hnorm[:, None, :].astype(lat_s[0].dtype), (0, i, 0)
            )
        else:
            logits = _mel_logits(params, x)
        codes, beam_scores, seen, done_best, flat_src, nxt = step_beams(
            i + 1, logits, codes, beam_scores, seen, done_best,
            lin_c=lin_c if lat_s else None,
        )
        # no cache reorder: position i was just written by each beam's own
        # physical row; permute only the SMALL per-position map
        # (bb x max_new int32) by the successor choice
        lin2 = lin_c[flat_src]
        out = (i + 1, codes, beam_scores, kvg2, lin2, seen, nxt, done_best)
        return out + (lat,) if lat_s else out

    state = (jnp.asarray(0), codes, beam_scores, kvg, lin0, seen, cur, done_best)
    if capture_latents:
        state = state + (jnp.zeros((bb, max_new, emb.shape[-1]), emb.dtype),)
    state = jax.lax.while_loop(cond_fn, body_fn, state)
    codes, beam_scores, lin, done_best = state[1], state[2], state[4], state[7]

    if capture_latents:
        final_codes, final_len, final_lin = _beam_finalize(
            codes, beam_scores, done_best, b, nb, max_new, length_penalty, p,
            lin_live=lin,
        )
        lat_sel = _gather_beam_latents(state[8], h0, final_lin, nb, max_new)
        return final_codes, final_len, lat_sel
    return _beam_finalize(codes, beam_scores, done_best,
                          b, nb, max_new, length_penalty, p)


def generate_speech_beam_segmented(
    params: Params,
    cfg: GPTConfig,
    gen: GenerationConfig,
    conds: jnp.ndarray,
    text_tokens: jnp.ndarray,
    text_lengths: jnp.ndarray,
    rng: jax.Array,
    temperature=1.0,
    top_p=0.8,
    repetition_penalty=10.0,
    length_penalty=0.0,
    typical_mass=0.9,
    segment: int = 160,
    jit_cache: Optional[Dict[Any, Any]] = None,
    quant_kv: bool = False,
    capture_latents: bool = False,
    pos_off: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split-cache beam decode with segment-growing generated cache:
    lineage-resolved attention (no physical cache reorder) against a
    generated cache that only holds the slots writable so far. Host-driven
    like generate_speech_segmented; identical sampling state machine to
    generate_speech_beam (which it matches bit-exactly — see tests).
    `capture_latents`/`pos_off` as in generate_speech_beam (the latent
    buffer grows with the cache; one lineage gather at finalize).
    ALWAYS pass `jit_cache` for repeated calls (see
    generate_speech_segmented's docstring — a fresh default dict re-traces
    every per-segment closure on every call)."""
    nb = gen.num_beams
    b, l = text_tokens.shape
    bb = b * nb
    max_new = gen.max_new_tokens
    n_segments = -(-max_new // segment)
    cache = jit_cache if jit_cache is not None else {}

    def seg_fn(seg_idx: int):
        key = ("bseg", b, l, gen, segment, seg_idx, quant_kv, capture_latents, pos_off)
        if key in cache:
            return cache[key]
        cache_len = min(segment * (seg_idx + 1), max_new)
        if seg_idx == 0:
            n_steps = cache_len - 1

            @jax.jit
            def first_fn(params, conds, text_tokens, text_lengths, rng, temperature, top_p, repetition_penalty, length_penalty, typical_mass):
                return _beam_segment_run(
                    params, cfg, gen, conds, text_tokens, text_lengths, rng,
                    temperature, top_p, repetition_penalty, length_penalty, typical_mass,
                    cache_len=cache_len, n_steps=n_steps, init=True, state=None,
                    quant_kv=quant_kv, capture_latents=capture_latents, pos_off=pos_off,
                )

            cache[key] = first_fn
        else:
            n_steps = cache_len - segment * seg_idx

            @jax.jit
            def step_fn(params, state, aux_arrays, rng, temperature, top_p, repetition_penalty, length_penalty, typical_mass):
                return _beam_segment_run(
                    params, cfg, gen, None, None, None, rng,
                    temperature, top_p, repetition_penalty, length_penalty, typical_mass,
                    cache_len=cache_len, n_steps=n_steps, init=False,
                    state=(state, aux_arrays),
                    capture_latents=capture_latents, pos_off=pos_off,
                )

            cache[key] = step_fn
        return cache[key]

    import numpy as np

    f32 = lambda v: jnp.asarray(v, jnp.float32)
    args = (f32(temperature), f32(top_p), f32(repetition_penalty),
            f32(length_penalty), f32(typical_mass))
    state, aux_arrays = seg_fn(0)(params, conds, text_tokens, text_lengths, rng, *args)
    p_len = int(aux_arrays[1].shape[1])  # bias_p [B, P] -> prefill length
    for k_seg in range(1, n_segments):
        i, beam_scores, best_score = state[0], state[2], state[7][0]
        # host-side early exit mirroring the device cond (length_penalty may
        # be per-row [b] under continuous batching); same ADMISSIBLE base as
        # _beam_stop_bound_base — shortest reachable finish for lp <= 0
        lpv = np.asarray(length_penalty, np.float32)
        base = np.where(lpv > 0, np.float32(p_len + max_new),
                        np.float32(p_len + int(i) + 1))
        bp = np.max(np.asarray(beam_scores).reshape(b, nb), axis=1) / base**lpv
        if gen.early_stopping and not bool((bp > np.asarray(best_score)).any()):
            break
        if int(i) >= max_new - 1:
            break
        state, aux_arrays = seg_fn(k_seg)(params, state, aux_arrays, rng, *args)

    codes, beam_scores, lin, done_best = state[1], state[2], state[4], state[7]
    if capture_latents:
        final_codes, final_len, final_lin = _beam_finalize(
            codes, beam_scores, done_best, b, nb, max_new, length_penalty, p_len,
            lin_live=lin,
        )
        lat_sel = _gather_beam_latents(state[8], aux_arrays[2], final_lin, nb, max_new)
        return final_codes, final_len, lat_sel
    return _beam_finalize(codes, beam_scores, done_best,
                          b, nb, max_new, length_penalty, p_len)


def _beam_segment_run(params, cfg, gen, conds, text_tokens, text_lengths, rng,
                      temperature, top_p, repetition_penalty, length_penalty, typical_mass, *,
                      cache_len, n_steps, init, state, quant_kv=False,
                      capture_latents=False, pos_off=2):
    """One jitted beam segment: optionally prefill+first-token, then up to
    n_steps decode iterations against a generated cache of size cache_len.
    With `capture_latents` the state gains a physical-row latent buffer
    [bb, cache_len, D] (grows with the cache) and aux gains the prefill
    hidden h0 [B, D]; done_best gains the finished-winner lineage row."""
    nb = gen.num_beams
    max_new = gen.max_new_tokens
    heads = cfg.heads
    d = cfg.model_dim
    dh = d // heads
    layers = cfg.layers
    v = cfg.number_mel_codes

    def joint_fn(logits, seen, beam_scores):
        return _beam_joint_scores(logits, seen, beam_scores, gen,
                                  temperature, top_p, repetition_penalty, typical_mass)

    def select(cand, key, step):
        return _select_successors(cand, key, step, gen, nb)

    if init:
        b = text_tokens.shape[0]
        bb = b * nb
        emb, prefill_mask = prepare_gpt_inputs(params, cfg, conds, text_tokens, text_lengths)
        p = emb.shape[1]
        if capture_latents:
            logits0_b, kvp, h0 = _prefill(params, cfg, emb, prefill_mask, p,
                                          return_hidden=True, quant_kv=quant_kv)
        else:
            logits0_b, kvp = _prefill(params, cfg, emb, prefill_mask, p, quant_kv=quant_kv)
        logits0 = jnp.repeat(logits0_b, nb, axis=0)
        kvg = _empty_beam_cache(layers, bb, heads // 2, cache_len, 2 * dh, emb.dtype, quant_kv)
        seen0 = jnp.zeros((bb, v), bool).at[:, 1].set(True).at[:, cfg.start_mel_token].set(True)
        bias_p = jnp.where(prefill_mask, 0.0, NEG_INF).astype(jnp.float32)
        beam_scores0 = jnp.tile(jnp.array([0.0] + [NEG_INF] * (nb - 1), jnp.float32), (b,))
        codes0 = jnp.full((bb, max_new), cfg.stop_mel_token, jnp.int32)
        best0 = (jnp.full((b,), NEG_INF, jnp.float32),
                 jnp.full((b, max_new), cfg.stop_mel_token, jnp.int32),
                 jnp.zeros((b,), jnp.int32))
        # nothing written to kg/vg yet -> the lineage map starts empty; it is
        # NOT permuted by step 0's flat_src (all cache rows are still empty)
        lin = jnp.zeros((bb, cache_len), jnp.int32)
        if capture_latents:
            best0 = best0 + (jnp.zeros((b, max_new), jnp.int32),)
        codes, beam_scores, seen, done_best, flat_src, cur = _beam_step(
            cfg, gen, 0, logits0, codes0, beam_scores0, seen0, best0, joint_fn,
            select, rng, b, nb, length_penalty, prefill_len=p,
            lin_c=lin if capture_latents else None,
        )
        st = (jnp.asarray(0), codes, beam_scores, kvg, lin, seen, cur, done_best)
        if capture_latents:
            st = st + (jnp.zeros((bb, cache_len, d), emb.dtype),)
            aux = (kvp, bias_p, h0)
        else:
            aux = (kvp, bias_p)
    else:
        st, aux = state
        i, codes, beam_scores, kvg, lin, seen, cur, done_best, *lat_s = st
        extra = cache_len - kvg[0].shape[3]
        # axis 3 is the position axis for k8/v8 (rank 5) AND the scale
        # tensors (rank 4, position-minor) under quant_kv
        kvg = tuple(
            jnp.pad(c, ((0, 0),) * 3 + ((0, extra),) + ((0, 0),) * (c.ndim - 4))
            for c in kvg
        )
        # grow the lineage map with the cache; new positions are bias-masked
        # until written, so their lineage value (0) is irrelevant
        lin = jnp.pad(lin, ((0, 0), (0, extra)))
        st = (i, codes, beam_scores, kvg, lin, seen, cur, done_best)
        if lat_s:
            st = st + (jnp.pad(lat_s[0], ((0, 0), (0, extra), (0, 0))),)
        bb = kvg[0].shape[1]
        b = bb // nb

    kvp, bias_p = aux[0], aux[1]
    p_len = bias_p.shape[1]  # prefill length, for the HF length-penalty base
    gen_positions = jnp.arange(cache_len)[None, :]
    start_i = st[0]
    own_local = (jnp.arange(bb) % nb).astype(jnp.int32)
    m_idx = (jnp.arange(bb, dtype=jnp.int32) % nb)[:, None]  # [bb, 1]

    def cond_fn(s):
        i, beam_scores, best_score = s[0], s[2], s[7][0]
        bound = jnp.logical_and(i < max_new - 1, i < start_i + n_steps)
        bound = jnp.logical_and(bound, i < cache_len)  # cache capacity
        if not gen.early_stopping:
            return bound
        base = _beam_stop_bound_base(length_penalty, p_len, max_new, i)
        best_possible = jnp.max(beam_scores.reshape(b, nb), axis=1) / base**jnp.asarray(length_penalty, jnp.float32)
        return jnp.logical_and(bound, jnp.any(best_possible > best_score))

    def body_fn(s):
        i, codes, beam_scores, kvg, lin, seen, cur, done_best, *lat_s = s
        x = params["mel_embedding"][cur] + params["mel_pos_embedding"][i + pos_off]
        bias_g = jnp.where(gen_positions < i, 0.0, NEG_INF).astype(jnp.float32)
        # lineage-resolved attention (same machinery as generate_speech_beam):
        # the generated cache is NEVER physically reordered — beam ancestry is
        # selected inside attention from the small [bb, cache_len] int32 map
        lin_masks = [
            (((m_idx - lin) % nb) == delta).astype(jnp.float32)[:, None, :]
            for delta in range(nb)
        ]

        def scan_body(x, layer):
            layer_p, kvgl, kvpl = layer
            out, kv_new = _decode_block_beam_lineage(
                layer_p, x, kvpl, kvgl, lin_masks, bias_p, bias_g, heads, nb
            )
            return out, kv_new

        x, kv_news = jax.lax.scan(scan_body, x, (params["gpt"]["blocks"], kvg, kvp))
        kvg2 = _write_beam_cache(kvg, kv_news, i)
        x = layer_norm(x, params["gpt"]["ln_f"]["weight"], params["gpt"]["ln_f"]["bias"])
        # compose this step's write into the lineage BEFORE successor
        # selection (finishing hypotheses snapshot their full ancestry)
        lin_c = jax.lax.dynamic_update_slice(lin, own_local[:, None], (0, i))
        if lat_s:
            # final_norm'd hidden — the greedy capture convention
            logits, hnorm = _mel_logits(params, x, return_normed=True)
            lat = jax.lax.dynamic_update_slice(
                lat_s[0], hnorm[:, None, :].astype(lat_s[0].dtype), (0, i, 0)
            )
        else:
            logits = _mel_logits(params, x)
        codes, beam_scores, seen, done_best, flat_src, nxt = _beam_step(
            cfg, gen, i + 1, logits, codes, beam_scores, seen, done_best, joint_fn,
            select, rng, b, nb, length_penalty, prefill_len=p_len,
            lin_c=lin_c if lat_s else None,
        )
        # no cache reorder: position i was just written by each beam's own
        # physical row; permute only the SMALL per-position map
        lin2 = lin_c[flat_src]
        out = (i + 1, codes, beam_scores, kvg2, lin2, seen, nxt, done_best)
        return out + (lat,) if lat_s else out

    st = jax.lax.while_loop(cond_fn, body_fn, st)
    return st, aux


def _beam_finalize(codes, beam_scores, done_best, b, nb, max_new, length_penalty, prefill_len, lin_live=None):
    """HF finalize semantics: the live beams join the hypothesis pool
    (normalized by the FULL final length like BeamHypotheses.add) and
    compete with the finished hypotheses — a live beam whose normalized
    score beats every finished one wins, not just when nothing finished.
    Consistent with the early-stop bound: when the bound fired, no live
    beam can beat the best finished one, so the pick is unchanged there.

    Latent capture (4-tuple done_best + `lin_live` [bb, N], the
    hypothesis-ordered lineage at loop exit): also returns the WINNING
    hypothesis's lineage row [b, max_new] for _gather_beam_latents."""
    if len(done_best) == 4:
        best_score, best_codes, best_len, best_lin = done_best
    else:
        best_score, best_codes, best_len = done_best
        best_lin = None
    lpv = jnp.asarray(length_penalty, jnp.float32)
    base = jnp.float32(prefill_len + max_new)
    denom = base ** (lpv[:, None] if lpv.ndim == 1 else lpv)
    live = beam_scores.reshape(b, nb) / denom
    live_val = jnp.max(live, axis=1)
    live_idx = jnp.argmax(live, axis=1)
    live_flat = jnp.arange(b) * nb + live_idx
    pick_live = live_val > best_score
    final_codes = jnp.where(pick_live[:, None], codes[live_flat], best_codes)
    final_len = jnp.where(pick_live, max_new, best_len)
    if best_lin is None:
        return final_codes, final_len
    lv = lin_live[live_flat]
    if lv.shape[1] < max_new:
        lv = jnp.pad(lv, ((0, 0), (0, max_new - lv.shape[1])))
    final_lin = jnp.where(pick_live[:, None], lv, best_lin)
    return final_codes, final_len, final_lin


def _gather_beam_latents(lat_phys, h0, win_lin, nb, max_new):
    """Resolve the PHYSICAL-ROW latent buffer into the winning hypothesis's
    latents, greedy-capture convention (slot j = latent that predicted code
    j; slot 0 = the prefill hidden, shared across a row's beams).

    lat_phys [bb, N, D]: slot i holds the final_norm'd hidden computed by
    physical row r at decode step i (the hidden that wrote cache position i
    and predicted the code at position i+1). win_lin [b, max_new]: position
    s of the winner was written by sibling row win_lin[:, s] — the same
    lineage map attention uses, so latent j (j >= 1) lives at
    lat_phys[b*nb + win_lin[:, j-1], j-1]. One gather per CALL (the
    per-step buffer is never reordered — the beam-cache rule)."""
    b = h0.shape[0]
    n = lat_phys.shape[1]
    rows = jnp.arange(b)[:, None] * nb + win_lin[:, :n]  # [b, N]
    tail = lat_phys[rows, jnp.arange(n)[None, :]]  # [b, N, D]
    out = jnp.concatenate([h0[:, None, :].astype(tail.dtype), tail], axis=1)
    return out[:, :max_new]


def _beam_step(cfg, gen, si, logits, codes, beam_scores, seen, done_best, joint_fn, select, rng, b, nb, length_penalty=0.0, prefill_len=0, lin_c=None):
    """One beam-successor selection step (shared by ALL beam drivers).
    joint_fn(logits, seen, beam_scores) -> [bb, V] joint scores (HF order,
    _beam_joint_scores); prefill_len: prompt length for the HF
    length-penalty base (BeamHypotheses.add normalizes by the FULL
    hypothesis length including the prompt, not generated count alone).

    Latent capture (done_best is a 4-tuple ending in best_lin [b, max_new]):
    `lin_c` [bb, N] is the COMPOSED lineage at this step (the driver's
    `lin` with position si-1 already set to own_local); when a hypothesis
    finishes, its lineage row is snapshotted alongside its codes so the
    winning latents can be gathered at finalize — the selection math is
    bit-identical with or without capture."""
    bb = b * nb
    v = cfg.number_mel_codes
    best_lin = None
    if len(done_best) == 4:
        best_score, best_codes, best_len, best_lin = done_best
    else:
        best_score, best_codes, best_len = done_best
    cand = joint_fn(logits, seen, beam_scores).reshape(b, nb * v)
    vals, idx = select(cand, rng, si)
    src_beam = idx // v
    tok = (idx % v).astype(jnp.int32)
    is_eos = tok == cfg.stop_mel_token
    # HF base: input_ids rows hold prefill_len + si tokens when the eos
    # candidate is scored (the eos itself is not appended before add())
    base = jnp.asarray(prefill_len + si, jnp.float32)
    lp = jnp.where(base > 0, base**_lp_col(length_penalty), 1.0)
    # HF rank filter (BeamSearchScorer.process): only eos candidates among
    # the TOP nb ranks become finished hypotheses; lower-ranked eos
    # candidates are discarded entirely. vals is rank-sorted (descending
    # true score) by _select_successors in both modes.
    ranks = jnp.arange(2 * nb)[None, :]
    finished_scores = jnp.where(is_eos & (ranks < nb), vals / lp, NEG_INF)
    fbest = jnp.max(finished_scores, axis=1)
    fargmax = jnp.argmax(finished_scores, axis=1)
    improve = fbest > best_score
    fin_beam = jnp.take_along_axis(src_beam, fargmax[:, None], axis=1)[:, 0]
    fin_tok = jnp.take_along_axis(tok, fargmax[:, None], axis=1)[:, 0]
    flat_fin = jnp.arange(b) * nb + fin_beam
    fin_codes = codes[flat_fin].at[:, si].set(fin_tok)
    best_codes = jnp.where(improve[:, None], fin_codes, best_codes)
    best_len = jnp.where(improve, si + 1, best_len)
    best_score = jnp.where(improve, fbest, best_score)
    if best_lin is not None:
        fin_lin = lin_c[flat_fin]
        if fin_lin.shape[1] < best_lin.shape[1]:  # segmented: cache < max_new
            fin_lin = jnp.pad(fin_lin, ((0, 0), (0, best_lin.shape[1] - fin_lin.shape[1])))
        best_lin = jnp.where(improve[:, None], fin_lin, best_lin)
    cont_scores = jnp.where(is_eos, NEG_INF, vals)
    cont_vals, cont_pick = jax.lax.top_k(cont_scores, nb)
    new_beam = jnp.take_along_axis(src_beam, cont_pick, axis=1)
    new_tok = jnp.take_along_axis(tok, cont_pick, axis=1).astype(jnp.int32)
    flat_src = (jnp.arange(b)[:, None] * nb + new_beam).reshape(-1)
    codes = codes[flat_src].at[:, si].set(new_tok.reshape(-1))
    seen = seen[flat_src].at[jnp.arange(bb), new_tok.reshape(-1)].set(True)
    new_best = (
        (best_score, best_codes, best_len, best_lin)
        if best_lin is not None
        else (best_score, best_codes, best_len)
    )
    return codes, cont_vals.reshape(-1), seen, new_best, flat_src, new_tok.reshape(-1)
