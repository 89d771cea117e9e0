"""Slot-based continuous decoding: rolling admission into a live batch.

No reference analog. The reference's web server serializes whole requests
(webui.py:232) and this repo's `--batch-requests` gather-window batcher
runs each merged batch to COMPLETION before admitting the next wave — under
sustained load a new request waits for the slowest row of the running batch
(head-of-line blocking). Slot decoding removes that wait: a fixed-shape
decode state holds `n_slots` independent rows; whenever a row finishes, the
host harvests it and admits a queued request's prefill into the free slot
WHILE the other rows keep decoding (the vLLM/Orca "continuous batching"
idea, shaped for XLA's static-shape compilation model).

Why rolling admission is exact AND stays on the fast decode path here:

- K/V cache entries carry their absolute position at write time: the GPT-2
  stack adds the learned mel positional embedding to the INPUT embedding
  (reference model.py:591-654, 151-155), so cached K/V are
  position-stamped values and attention over them is a set reduction —
  invariant to WHERE in the cache buffer a position physically lives. Only
  the per-row validity mask matters.
- Therefore all rows share ONE scalar write cursor, advancing mod S over a
  circular cache. Every step is the SAME one-column dynamic_update_slice
  the linear decode uses (docs/PERF.md: any per-row scatter or cache
  re-layout is the slow form) — rows at different ages need no per-row
  cache indexing at all.
- A row admitted at cursor c gets its prefill scattered into columns
  [(c - p) mod S, c) of ITS OWN row plane (a one-time per-admission
  scatter, amortized over the row's lifetime); its generated K/V then land
  wherever the shared cursor goes next. Since a row's live span is at most
  p + max_new - 1 < S, the cursor can never lap a row's own still-valid
  content, and rows never touch each other's planes.
- Per-row progress (mel position, codes index, latent-capture index) rides
  [n_slots] int vectors; the writes they need are one-element scatters on
  SMALL per-row buffers (codes/latents), never on the KV cache.

Greedy slot decode equals `generate_speech` token-for-token per row —
including rows admitted mid-flight, across the cache wrap, and after slot
reuse (tests/test_slots.py). Sampling rows draw from the session's joint
rng (same caveat as engine.infer_batch). Forced mel prefixes
(`input_tokens`) and beams are not supported in slot mode; the
gather-window batcher covers those.
"""

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu.config import GPTConfig
from indextts_tpu.models.gpt_decode import (
    GenerationConfig,
    Params,
    _decode_step,
    prefill_decode_state,
)
from indextts_tpu.ops.sampling import greedy_token, process_logits, sample_token


class SlotState(NamedTuple):
    """Fixed-shape rolling decode state ([B] = n_slots, [S] = cache_len).

    `active`: row is mid-decode. `done`: row finished (stop token or codes
    buffer full) and awaits host harvest; inert until re-admitted. A slot
    that is neither is empty. Inactive rows still receive the shared
    cursor-column cache write each step (garbage), but their mask bit stays
    False so the garbage is never attended and costs nothing."""

    tick: jnp.ndarray      # [] int32 — global step counter (joint rng folds)
    cursor: jnp.ndarray    # [] int32 — shared circular write cursor in [0, S)
    i_b: jnp.ndarray       # [B] int32 — per-row generated-token index
    codes: jnp.ndarray     # [B, max_new] int32 — stop-token padded
    cache: Tuple[jnp.ndarray, ...]  # bf16 (k2, v2) or int8 (k8, ks, v8, vs)
    active: jnp.ndarray    # [B] bool
    done: jnp.ndarray      # [B] bool
    seen: jnp.ndarray      # [B, V] bool — repetition-penalty seen set
    cur: jnp.ndarray       # [B] int32 — last emitted token
    mask: jnp.ndarray      # [B, S] bool — per-row cache validity
    lat: Optional[jnp.ndarray]  # [B, max_new, D] captured latents, or None


def slot_state_init(
    cfg: GPTConfig,
    gen: GenerationConfig,
    n_slots: int,
    cache_len: int,
    dtype,
    capture_latents: bool = False,
    quant_kv: bool = False,
) -> SlotState:
    """Empty state. `cache_len` (S) must be >= the largest admitted prefill
    length + gen.max_new_tokens (slot_admit asserts per admission)."""
    b = n_slots
    g2 = cfg.heads // 2
    dh2 = 2 * (cfg.model_dim // cfg.heads)
    shape5 = (cfg.layers, b, g2, cache_len, dh2)
    if quant_kv:
        cache = (
            jnp.zeros(shape5, jnp.int8),
            jnp.zeros(shape5[:-1], jnp.float32),
            jnp.zeros(shape5, jnp.int8),
            jnp.zeros(shape5[:-1], jnp.float32),
        )
    else:
        cache = (jnp.zeros(shape5, dtype), jnp.zeros(shape5, dtype))
    return SlotState(
        tick=jnp.asarray(0, jnp.int32),
        cursor=jnp.asarray(0, jnp.int32),
        i_b=jnp.zeros((b,), jnp.int32),
        codes=jnp.full((b, gen.max_new_tokens), cfg.stop_mel_token, jnp.int32),
        cache=cache,
        active=jnp.zeros((b,), bool),
        done=jnp.zeros((b,), bool),
        seen=jnp.zeros((b, cfg.number_mel_codes), bool),
        cur=jnp.full((b,), cfg.stop_mel_token, jnp.int32),
        mask=jnp.zeros((b, cache_len), bool),
        lat=(jnp.zeros((b, gen.max_new_tokens, cfg.model_dim), dtype)
             if capture_latents else None),
    )


def slot_prefill(
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
    capture_latents: bool = False,
    quant_kv: bool = False,
) -> Dict[str, Any]:
    """Prefill ONE request (b=1) for later admission. Delegates to
    prefill_decode_state with cache_len=p, so slot admission shares the ONE
    pinned prefill/first-token definition (inputs-mask construction, the
    HF "ids {1, start_mel} start out seen" contract, fold_in(rng, 0)
    sampling) with one-shot/streaming/segmented decoding — the cache comes
    back at its own length p (no max_new padding; slot_admit scatters it
    into the shared circular cache). Returns a dict of device-resident
    products."""
    # prepare_gpt_inputs emits [cond latents | text+start/stop | start_mel]
    p = conds.shape[1] + text_tokens.shape[1] + 3
    state, aux = prefill_decode_state(
        params, cfg, gen, conds, text_tokens, text_lengths, rng,
        temperature=temperature, top_p=top_p,
        repetition_penalty=repetition_penalty, typical_mass=typical_mass,
        cache_len=p, capture_latents=capture_latents, quant_kv=quant_kv,
    )
    assert aux["p"] == p, f"prefill length drifted: {aux['p']} != {p}"
    _i, _codes, cache, done0, seen1, tok1, *lat = state
    out = {
        "cache": cache,
        "prefill_mask": aux["prefill_valid"],  # [1, p] bool (no padding at cache_len=p)
        "tok1": tok1,                          # [1]
        "done0": done0,
        "seen1": seen1,
    }
    if capture_latents:
        out["h0"] = lat[0][:, 0]
    return out


def slot_admit(state: SlotState, prod: Dict[str, Any], slot, cfg: GPTConfig) -> SlotState:
    """Write a prefilled request into slot `slot` (traced scalar), placing
    its prefill so it ENDS at the shared cursor: columns
    [(cursor - p) mod S, cursor). One-time per-admission scatter on the
    slot's own cache plane; every subsequent step stays on the shared
    one-column DUS. Jit per (p, state shapes)."""
    p = prod["prefill_mask"].shape[1]
    s_len = state.mask.shape[1]
    max_new = state.codes.shape[1]
    assert p + max_new <= s_len, (
        f"cache_len {s_len} < prefill {p} + max_new {max_new}: the cursor "
        f"would lap this row's own content"
    )
    # column s receives prefill position j = (s - start) mod S when j < p.
    # Dense forms only: a per-index scatter here lowered to a serialized
    # XLA scatter that cost ~0.5 s per admission on TPU (measured,
    # tools/profile_slots.py); zero-pad + jnp.roll (concat + dynamic_slice
    # under a traced shift) + where + one row DUS is pure streaming.
    start = jnp.remainder(state.cursor - p, s_len)
    valid = jnp.remainder(jnp.arange(s_len) - start, s_len) < p  # [S]

    def place(big, small):
        # big [L, B, g2, S(, D2)]; small [L, 1, g2, p(, D2)]
        pads = [(0, 0)] * small.ndim
        pads[3] = (0, s_len - p)
        rolled = jnp.roll(jnp.pad(small, pads), start, axis=3)[:, 0]
        v = valid[None, None, :, None] if big.ndim == 5 else valid[None, None, :]
        row = jnp.where(v, rolled, big[:, slot])
        return big.at[:, slot].set(row)

    cache = tuple(place(b, s) for b, s in zip(state.cache, prod["cache"]))
    mask_row = valid & jnp.roll(
        jnp.pad(prod["prefill_mask"][0], (0, s_len - p)), start
    )
    tok1 = prod["tok1"][0]
    lat = state.lat
    if lat is not None:
        lat_row = jnp.zeros_like(lat[slot]).at[0].set(prod["h0"][0].astype(lat.dtype))
        lat = lat.at[slot].set(lat_row)
    return state._replace(
        cache=cache,
        mask=state.mask.at[slot].set(mask_row),
        codes=state.codes.at[slot].set(
            jnp.full((max_new,), cfg.stop_mel_token, jnp.int32).at[0].set(tok1)
        ),
        seen=state.seen.at[slot].set(prod["seen1"][0]),
        cur=state.cur.at[slot].set(tok1),
        i_b=state.i_b.at[slot].set(0),
        active=state.active.at[slot].set(~prod["done0"][0]),
        done=state.done.at[slot].set(prod["done0"][0]),
        lat=lat,
    )


def slot_steps(
    params: Params,
    cfg: GPTConfig,
    gen: GenerationConfig,
    state: SlotState,
    n_steps: int,
    rng: jax.Array,
    temperature=1.0,
    top_p=0.8,
    repetition_penalty=10.0,
    typical_mass=0.9,
    pos_off: int = 2,
) -> SlotState:
    """Run up to `n_steps` shared-cursor decode steps (early exit when no
    row is active). Sampling params may be scalars or [n_slots] per-row
    columns (ops/sampling._colp) — the engine updates a row's column at
    admission so requests with different knobs share the batch.

    Per-row mel position i_b + pos_off rides a [B] gather into the
    positional table; codes/seen/latent writes are dense masked selects
    (per-row-index scatters serialize on XLA:TPU — see body comment). The
    KV write is the shared one-column DUS at cursor (mod S applied
    in-loop)."""
    b = state.i_b.shape[0]
    s_len = state.mask.shape[1]
    max_new = state.codes.shape[1]
    stop = cfg.stop_mel_token

    def sample_from(logits, seen, key, tick):
        lf = process_logits(
            logits, seen_mask=seen, repetition_penalty=repetition_penalty,
            typical_sampling=gen.typical_sampling, typical_mass=typical_mass,
            temperature=temperature, top_k=gen.top_k if gen.do_sample else 0,
            top_p=top_p, do_sample=gen.do_sample,
        )
        if gen.do_sample:
            return sample_token(jax.random.fold_in(key, tick), lf)
        return greedy_token(lf)

    def cond_fn(carry):
        j, st = carry
        return jnp.logical_and(j < n_steps, jnp.any(st.active))

    def body_fn(carry):
        j, st = carry
        wp = jnp.remainder(st.cursor, s_len)
        # positions at the cursor are invalid by invariant (a row's span
        # never laps the cursor) — _decode_step needs mask[., wp] False
        if st.lat is not None:
            logits, cache, hnorm = _decode_step(
                params, cfg, st.cur, st.i_b + pos_off, st.cache, wp, st.mask,
                return_hidden=True,
            )
        else:
            logits, cache = _decode_step(
                params, cfg, st.cur, st.i_b + pos_off, st.cache, wp, st.mask
            )
        nxt = sample_from(logits, st.seen, rng, st.tick).astype(jnp.int32)
        nxt = jnp.where(st.active, nxt, stop)
        # per-row writes as DENSE masked selects. The index differs PER ROW
        # (rows admitted at different times sit at different i_b), so an
        # .at[rows, widx] form is a true scatter — and XLA:TPU serializes
        # scatters (the same pathology as the measured ~0.5 s per-admission
        # cache scatter, tools/profile_slots.py). The dense selects stream
        # the small codes/seen/lat buffers once, which is noise next to the
        # step's weight reads.
        wsel = st.active[:, None] & (
            jnp.arange(max_new)[None, :] == (st.i_b + 1)[:, None]
        )  # [B, max_new]
        codes = jnp.where(wsel, nxt[:, None], st.codes)
        seen = st.seen | (
            st.active[:, None]
            & (jnp.arange(st.seen.shape[1])[None, :] == nxt[:, None])
        )
        lat = st.lat
        if lat is not None:
            lat = jnp.where(wsel[:, :, None], hnorm[:, None, :].astype(lat.dtype), lat)
        # the cursor column becomes attendable for rows that really wrote
        mask = st.mask.at[:, wp].set(st.active)
        newly_done = st.active & (
            (nxt == stop) | (st.i_b + 1 >= max_new - 1)
        )
        return j + 1, SlotState(
            tick=st.tick + 1,
            cursor=jnp.remainder(st.cursor + 1, s_len),
            i_b=jnp.where(st.active, st.i_b + 1, st.i_b),
            codes=codes,
            cache=cache,
            active=st.active & ~newly_done,
            done=st.done | newly_done,
            seen=seen,
            cur=jnp.where(st.active, nxt, st.cur),
            mask=mask,
            lat=lat,
        )

    _, state = jax.lax.while_loop(cond_fn, body_fn, (jnp.asarray(0, jnp.int32), state))
    return state


def slot_lengths(codes: jnp.ndarray, stop_token: int) -> jnp.ndarray:
    """Per-row generated length: first stop + 1, or max_new (same semantics
    as generate_speech, gpt_decode.py)."""
    is_stop = codes == stop_token
    any_stop = jnp.any(is_stop, axis=1)
    return jnp.where(any_stop, jnp.argmax(is_stop, axis=1) + 1, codes.shape[1])
