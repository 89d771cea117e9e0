"""SlotSession: continuous-batching serving loop over models/gpt_slots.

No reference analog (the reference serializes whole requests through one
web worker, webui.py:232). This is the LATENCY-ORIENTED serving mode: a
persistent decode batch with rolling admission — a request submitted while
others are mid-decode starts on the next chunk boundary (~chunk_steps *
step-cost, default tens of ms) instead of waiting for the running batch to
finish (engine.infer_batch, the THROUGHPUT mode, keeps the gather-window
semantics; see docs/SERVING.md for when to use which).

The trade slots pay for admission latency: the circular KV cache is sized
for the worst row (p_max + max_new), so every step streams the full
static-shape cache — a solo/batch decode with a segment-grown cache
(gpt_decode.generate_speech_segmented) reads less on young sequences.
quant_kv halves that read; measured numbers in docs/SERVING.md.

Greedy outputs equal engine.infer per request (tests/test_slot_session.py;
the row-wise contract is pinned at the model level in tests/test_slots.py).
Static generation knobs are fixed per session (one compiled step graph);
per-request dynamic knobs ride per-row traced columns exactly like
infer_batch's BATCH_DYNAMIC_PARAMS.
"""

import time
import warnings
from collections import deque
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from indextts_tpu.models.gpt_slots import (
    slot_admit,
    slot_prefill,
    slot_state_init,
    slot_steps,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


#: dynamic knobs a slot row can override per request: the subset of
#: engine.BATCH_DYNAMIC_PARAMS the slot step graph actually consumes.
#: length_penalty is excluded — it only shapes beam scores and slot mode
#: is num_beams=1, so accepting it would be a silent no-op.
SLOT_DYNAMIC_PARAMS = ("temperature", "top_p", "repetition_penalty", "typical_mass")


class SlotSession:
    """One live slot-decoding session bound to an IndexTTS engine.

    submit() enqueues a request (its text may split into several sentence
    rows); tick() admits pending rows into free slots, runs one decode
    chunk, harvests finished rows, and returns any requests completed this
    tick as (request_id, result) pairs — result matching engine.infer's
    return shape ((sr, wav int16 [S, 1]) or the written output path).
    drain() ticks until everything submitted has completed."""

    def __init__(
        self,
        engine,
        n_slots: int = 8,
        chunk_steps: int = 25,
        max_text_tokens_per_sentence: int = 120,
        stream_overlap_codes: int = 8,
        seed: int = 0,
        verbose: bool = False,
        **generation_kwargs,
    ):
        if generation_kwargs.get("num_beams", 1) not in (None, 1):
            raise ValueError("slot mode decodes with num_beams=1 "
                             "(use infer/infer_batch for beam search)")
        if engine.cfg.gpt.condition_type == "conformer_encoder":
            # get_conditioning returns frame-count-dependent conds for this
            # type (gpt.py get_conditioning), so the fixed p_max sizing
            # below (condition_num_latent) would under-size the circular
            # cache and trip slot_admit's capacity assert mid-serving.
            raise ValueError(
                "slot mode requires a fixed conditioning-latent count; "
                "condition_type='conformer_encoder' produces frame-dependent "
                "conds (use infer/infer_batch)")
        gen, base_dyn, self.max_mel_tokens = engine._parse_generation_kwargs(
            generation_kwargs, force_num_beams=1
        )
        self.engine = engine
        self.gen = gen
        self.base_dyn = base_dyn
        self.n_slots = n_slots
        self.chunk_steps = chunk_steps
        self.stream_overlap = max(0, int(stream_overlap_codes))
        self.verbose = verbose
        self.max_split = engine._clamp_split_len(max_text_tokens_per_sentence)
        self.pos_off = 1 if engine.fast_latents else 2
        cfg = engine.cfg.gpt
        # worst prefill: cond latents + the largest text bucket + start/stop
        # text tokens + start_mel (prepare_gpt_inputs); the bucket MUST be
        # engine._text_bucket's — admission sizes against it
        p_max = cfg.condition_num_latent + engine._text_bucket(self.max_split) + 3
        self.cache_len = _round_up(p_max + gen.max_new_tokens, 64)
        self.state = slot_state_init(
            cfg, gen, n_slots, self.cache_len, engine.dtype,
            capture_latents=engine.fast_latents, quant_kv=engine.quant_kv,
        )
        self.rng = jax.random.PRNGKey(seed)
        # jitted entry points, cached ON THE ENGINE (same dict as
        # _decode_fn) so the server's evict-and-recreate cycle reuses the
        # traced graphs instead of recompiling them — first compile is
        # minutes on this platform. The big state is donated so the
        # circular cache updates in place instead of double-buffering.
        jit_key = ("slot", gen, chunk_steps, self.pos_off,
                   engine.quant_kv, engine.fast_latents)
        if jit_key not in engine._decode_cache:
            engine._decode_cache[jit_key] = (
                jax.jit(
                    partial(slot_steps, cfg=cfg, gen=gen, n_steps=chunk_steps,
                            pos_off=self.pos_off),
                    donate_argnames=("state",),
                ),
                jax.jit(partial(slot_admit, cfg=cfg), donate_argnames=("state",)),
                jax.jit(partial(
                    slot_prefill, cfg=cfg, gen=gen,
                    capture_latents=engine.fast_latents, quant_kv=engine.quant_kv,
                )),
            )
        self._steps_fn, self._admit_fn, self._prefill_fn = engine._decode_cache[jit_key]
        # fixed-width latent window extractor for STREAMING rows: one
        # compiled shape wherever the window sits; positions >= n_valid are
        # zeroed to match _vocode_many's own zero-padding semantics (the
        # caller clamps start host-side so the slice never clips)
        self._win_w = min(chunk_steps + self.stream_overlap + 1, gen.max_new_tokens)
        skey = ("slot_snap",)
        if skey not in engine._decode_cache:
            # identity jit = device-side copy of the scheduler's tiny
            # snapshot (done/i_b/codes): jit outputs are fresh buffers, so
            # the snapshot survives the next chunk's donation of the state
            # (holding the state leaves themselves raises "Array has been
            # deleted" after the donating dispatch)
            engine._decode_cache[skey] = jax.jit(lambda d, i, c: (d, i, c))
        self._snap_fn = engine._decode_cache[skey]
        wkey = ("slot_win", self._win_w)
        if wkey not in engine._decode_cache:
            def _win(lat, slot, start, n_valid, _w=self._win_w):
                row = jax.lax.dynamic_slice_in_dim(lat[slot], start, _w, axis=0)
                mask = (jnp.arange(_w) < n_valid)[:, None]
                return jnp.where(mask, row, 0)[None]

            engine._decode_cache[wkey] = jax.jit(_win)
        self._win_fn = engine._decode_cache[wkey]
        # per-row dynamic sampling columns (host copies, uploaded per chunk)
        self.dyn_cols = {
            name: np.full((n_slots,), float(base_dyn[name]), np.float32)
            for name in SLOT_DYNAMIC_PARAMS
        }
        self.pending: deque = deque()
        self.slots: List[Optional[Dict[str, Any]]] = [None] * n_slots
        self.requests: Dict[int, Dict[str, Any]] = {}
        self._next_rid = 0
        self._warned_max = False
        # one-chunk scheduler pipeline (round 4): handles to the PREVIOUS
        # chunk's done/i_b/codes, whose host copies were started at dispatch
        # so the ~30 ms tunnel round trip hides behind the next chunk's
        # execution (tools/trace_slots.py: chunk exec 55 ms, measured tick
        # wall 85 ms — the gap was one synchronous fetch per tick).
        # _seq counts dispatched chunks; a row records the seq of the first
        # chunk that includes it, and a fetch only harvests rows with
        # admit_seq <= its seq — a stale done flag from before a slot was
        # REUSED must never harvest the new occupant.
        self._fetch = None  # (seq, done_dev, i_b_dev, codes_dev)
        self._seq = 0

    # ------------------------------------------------------------------

    def submit(self, prompt, text: str, output_path: Optional[str] = None,
               on_chunk=None, **per_request_kwargs) -> int:
        """Enqueue one request. Returns its id; the result arrives from a
        later tick()/drain(). per_request_kwargs: SLOT_DYNAMIC_PARAMS only
        (same normalization as infer_batch's per_request_kwargs).

        `on_chunk(rid, wav_chunk)` makes the request STREAMING: each tick
        delivers the newly decoded audio (int16 [samples] mono, 24 kHz,
        infer_stream's window/overlap-trim semantics) while the request is
        still decoding — streaming TTFA under sustained load, which solo
        `infer_stream` (one request owns the device) cannot give. The
        concatenated chunks ARE the final result (sample count equals the
        non-streamed slot output; window boundaries may differ within
        vocoder-edge tolerance, the infer_stream contract). Requirements:
        a fast_latents engine (chunk latents are captured during decode);
        silence removal is skipped (audio has already left the building,
        matching infer_stream); a multi-sentence streaming request decodes
        its rows SEQUENTIALLY (row j+1 is queued when row j finishes) so
        chunks always arrive in playback order. on_chunk must not raise —
        an exception propagates out of tick() and aborts the scheduler
        cycle mid-harvest."""
        eng = self.engine
        bad = set(per_request_kwargs) - set(SLOT_DYNAMIC_PARAMS)
        if bad:
            raise ValueError(
                f"per-request overrides in slot mode are allowed only for "
                f"{SLOT_DYNAMIC_PARAMS} (length_penalty only affects beams "
                f"and slot mode is num_beams=1); got {sorted(bad)}"
            )
        if on_chunk is not None and self.state.lat is None:
            raise ValueError(
                "streaming slot requests need a fast_latents=True engine "
                "(chunk latents are captured during decode)"
            )
        mel = eng._resolve_prompt(prompt)
        conds = eng._conds_for(mel)
        sents = eng.tokenizer.split_sentences(
            eng.tokenizer.tokenize(text), self.max_split
        )
        if not sents:
            raise ValueError("text is empty (nothing to synthesize)")
        rid = self._next_rid
        self._next_rid += 1
        dyn = {k: float(per_request_kwargs.get(k, self.base_dyn[k]))
               for k in SLOT_DYNAMIC_PARAMS}
        token_rows = [
            np.asarray(eng.tokenizer.convert_tokens_to_ids(s), np.int32)[None, :]
            for s in sents
        ]
        self.requests[rid] = {
            "mel": mel, "n_rows": len(sents), "rows": {},
            "output_path": output_path, "submitted": time.perf_counter(),
            "on_chunk": on_chunk, "chunks": [],
            "row_tokens": token_rows, "next_row": 1, "conds": conds, "dyn": dyn,
        }
        # streaming rows decode sequentially (chunks must arrive in playback
        # order); non-streaming rows all enter the queue at once
        for j in range(1 if on_chunk is not None else len(token_rows)):
            self.pending.append(self._row_job(rid, j))
        return rid

    def _row_job(self, rid: int, j: int) -> Dict[str, Any]:
        """The per-sentence-row work item (ONE literal — submit() and the
        harvest's queue-next-row path must stay in sync)."""
        req = self.requests[rid]
        return {"rid": rid, "row": j, "tokens": req["row_tokens"][j],
                "conds": req["conds"], "dyn": req["dyn"],
                "stream": req["on_chunk"] is not None, "emitted": 0}

    # ------------------------------------------------------------------

    def _admit_one(self, row: Dict[str, Any], slot: int) -> None:
        eng = self.engine
        cfg = eng.cfg.gpt
        t = row["tokens"]
        l = eng._text_bucket(t.shape[1])  # the one shared bucketing
        padded = np.full((1, l), cfg.stop_text_token, np.int32)
        padded[:, : t.shape[1]] = t
        self.rng, sub = jax.random.split(self.rng)
        prod = self._prefill_fn(
            params=eng.gpt_params, conds=row["conds"].astype(eng.dtype),
            text_tokens=jnp.asarray(padded),
            text_lengths=jnp.asarray([t.shape[1]]), rng=sub,
            temperature=jnp.float32(row["dyn"]["temperature"]),
            top_p=jnp.float32(row["dyn"]["top_p"]),
            repetition_penalty=jnp.float32(row["dyn"]["repetition_penalty"]),
            typical_mass=jnp.float32(row["dyn"]["typical_mass"]),
        )
        self.state = self._admit_fn(self.state, prod, slot)
        for k, col in self.dyn_cols.items():
            col[slot] = row["dyn"][k]
        row["admit_seq"] = self._seq + 1  # first chunk that includes this row
        self.slots[slot] = row

    def _harvest(self, fetch) -> List[Tuple[int, Any]]:
        """Read finished rows off the device, resolve their latents
        (captured or a batched teacher-forced pass), vocode every request
        completed this tick in one batched call, and return the results.

        `fetch` is the pipelined (seq, done, i_b, codes) host copies from a
        PREVIOUS dispatch (or None on the first tick of a burst). Reading a
        one-chunk-old snapshot is exact for finished rows: a done row is
        inert — later chunks never touch its codes or captured latents —
        and the admit_seq guard skips slots reused since that snapshot."""
        eng = self.engine
        fin: List[int] = []
        if fetch is not None:
            seq, done, _ib, codes_all = fetch
            fin = [i for i, r in enumerate(self.slots)
                   if r is not None and done[i] and r["admit_seq"] <= seq]
        if not fin and not any(
            len(req["rows"]) == req["n_rows"] for req in self.requests.values()
        ):
            # nothing finished this tick and nothing completable (a
            # cancelled request can become completable with no live rows)
            return []
        if fetch is None:
            codes_all = np.asarray(self.state.codes)
        # lengths from the pipelined host copy (a synchronous device fetch
        # here cost the ~30 ms tunnel round trip every harvesting tick)
        is_stop = codes_all == eng.stop_mel_token
        lens_all = np.where(is_stop.any(axis=1),
                            is_stop.argmax(axis=1) + 1, codes_all.shape[1])
        pending_tf = []  # (slot, row, codes, code_lens) for teacher-forced
        stream_fin = []  # (slot, row, n) — streaming rows finalize by chunk
        for slot in fin:
            row = self.slots[slot]
            n = max(int(lens_all[slot]), 1)
            if (not self._warned_max and n >= self.gen.max_new_tokens
                    and codes_all[slot, -1] != eng.stop_mel_token):
                warnings.warn(
                    "WARN: generation stopped due to exceeding `max_mel_tokens` "
                    f"({self.max_mel_tokens}).", category=RuntimeWarning)
                self._warned_max = True
            if row.get("stream"):
                # streaming rows skip silence removal (the audio has already
                # left the building — infer_stream's contract) and finalize
                # from the captured latents below. The stop code itself is
                # NOT vocoded — remove_long_silence trims AT the stop
                # (engine.py len_ = stop_idx[0]) and infer_stream stops at
                # stop_pos, so the streamed sample count must match both.
                n_voc = n - 1 if codes_all[slot, n - 1] == eng.stop_mel_token else n
                stream_fin.append((slot, row, n_voc))
                self.slots[slot] = None
                continue
            code_row = codes_all[slot : slot + 1, :n]
            codes, code_lens = eng.remove_long_silence(
                code_row, silent_token=52, max_consecutive=30
            )
            if (self.state.lat is not None
                    and np.array_equal(codes, code_row[:, : codes.shape[1]])):
                latent = self.state.lat[slot][None, : codes.shape[1]]
                self.requests[row["rid"]]["rows"][row["row"]] = (
                    latent, int(code_lens[0]))
            else:
                pending_tf.append((slot, row, codes, code_lens))
            self.slots[slot] = None  # slot free; device flags reset on admit
        if pending_tf:
            lats = eng._gpt_latent_many(
                [(row["conds"], row["tokens"], cd, cl)
                 for _s, row, cd, cl in pending_tf]
            )
            for (_s, row, cd, cl), lat in zip(pending_tf, lats):
                self.requests[row["rid"]]["rows"][row["row"]] = (
                    lat, int(np.asarray(cl).reshape(-1)[0]))
        if stream_fin:
            # final window (covers codes since the last emission, incl. the
            # stop-length semantics the non-streamed harvest vocodes), then
            # queue the request's next sentence row — sequential admission
            # keeps a multi-row streaming request's chunks in playback order
            todo = [(slot, row, self._win_start(row["emitted"]), n)
                    for slot, row, n in stream_fin if n > row["emitted"]]
            if todo:
                self._emit_stream_chunks(todo)
            for _slot, row, _n in stream_fin:
                req = self.requests[row["rid"]]
                req["rows"][row["row"]] = True  # audio already in req["chunks"]
                if not req.get("cancelled") and req["next_row"] < req["n_rows"]:
                    j = req["next_row"]
                    req["next_row"] += 1
                    self.pending.append(self._row_job(row["rid"], j))
        # assemble + vocode every request completed this tick (one batched
        # vocoder pass across requests — engine._vocode_many)
        completed = [
            rid for rid, req in self.requests.items()
            if len(req["rows"]) == req["n_rows"]
        ]
        results: List[Tuple[int, Any]] = []
        if completed:
            latent_done = [r for r in completed
                           if self.requests[r]["on_chunk"] is None]
            chunk_list, chunk_rid = [], []
            for rid in latent_done:
                req = self.requests[rid]
                rows = [req["rows"][j] for j in range(req["n_rows"])]
                for k in range(0, len(rows), 2):  # chunk_size=2, as infer_batch
                    part = rows[k : k + 2]
                    latent = jnp.concatenate([l for l, _ in part], axis=1)
                    chunk_list.append((latent, sum(nv for _, nv in part), req["mel"]))
                    chunk_rid.append(rid)
            wavs = eng._vocode_many(chunk_list) if chunk_list else []
            for rid in completed:
                req = self.requests.pop(rid)
                if req["on_chunk"] is not None:
                    # streamed: the delivered chunks ARE the result (empty
                    # when every row stopped instantly — zero codes vocoded,
                    # matching the non-streamed harvest's empty wav)
                    wav = (np.concatenate(req["chunks"])[None, :]
                           if req["chunks"] else np.zeros((1, 0), np.int16))
                else:
                    # zero chunks is legal: a request cancelled before any
                    # row was admitted completes with empty audio (same as
                    # the streaming branch's zero-chunk guard above)
                    parts = [w for w, r in zip(wavs, chunk_rid) if r == rid]
                    wav = (np.concatenate(parts, axis=1) if parts
                           else np.zeros((1, 0), np.int16))
                results.append(
                    (rid, eng._emit(wav, req["output_path"], 24000)))
                if self.verbose:
                    print(f">> slot request {rid} done in "
                          f"{time.perf_counter() - req['submitted']:.2f}s "
                          f"({wav.shape[-1] / 24000:.2f}s audio)")
        return results

    # ------------------------------------------------------------------

    def cancel(self, rid: int) -> None:
        """Abandon a request (e.g. a streaming client disconnected):
        unqueued rows are dropped, live rows stop decoding at the next tick
        boundary (their device flags flip to done; the slot is harvested
        and freed like any finished row), and no further sentence rows are
        queued. The request still completes through tick() with whatever
        audio was produced — callers that no longer care simply drop it."""
        if rid not in self.requests:
            return
        self.pending = deque(r for r in self.pending if r["rid"] != rid)
        req = self.requests[rid]
        req["cancelled"] = True
        live = 0
        for slot, row in enumerate(self.slots):
            if row is not None and row["rid"] == rid:
                live += 1
                self.state = self.state._replace(
                    active=self.state.active.at[slot].set(False),
                    done=self.state.done.at[slot].set(True),
                )
        # completion now requires only the rows already harvested + live
        req["n_rows"] = len(req["rows"]) + live
        if req["n_rows"] == 0:
            # nothing ever admitted: finish the request immediately
            req["n_rows"] = len(req["rows"])  # 0 -> completes on next tick

    def _win_start(self, emitted: int) -> int:
        """Window start for a streaming emission: overlap context behind the
        last emitted code, clamped host-side so the fixed-width device
        slice (self._win_w) never clips at the buffer end."""
        start = max(emitted - self.stream_overlap, 0)
        return max(min(start, self.gen.max_new_tokens - self._win_w), 0)

    def _emit_stream_chunks(self, todo) -> None:
        """Vocode streaming windows (slot, row, start, n_now) in ONE batched
        vocoder call and deliver each trimmed chunk via the request's
        on_chunk callback (int16 [samples], infer_stream trim semantics)."""
        eng = self.engine
        spc = eng._samples_per_code()
        wins = [
            (self._win_fn(self.state.lat, slot, start, n_now - start),
             n_now - start, self.requests[row["rid"]]["mel"])
            for slot, row, start, n_now in todo
        ]
        wavs = eng._vocode_many(wins)
        for (slot, row, start, n_now), wav in zip(todo, wavs):
            chunk = wav[0, (row["emitted"] - start) * spc:]
            req = self.requests[row["rid"]]
            req["chunks"].append(chunk)
            req["on_chunk"](row["rid"], chunk)
            row["emitted"] = n_now

    def _stream_emit(self, fetch) -> None:
        """Interim streaming pass, once per tick: vocode every ACTIVE
        streaming row's newly decoded window (rows that finished are
        finalized by _harvest with stop-length semantics). Works off the
        pipelined (seq, done, i_b, codes) snapshot: positions below a row's
        fetched i_b were each written exactly once and never change, so the
        window content read from the LIVE latent buffer is exact even while
        the next chunk advances the row."""
        rows = [(s, r) for s, r in enumerate(self.slots)
                if r is not None and r.get("stream")]
        if not rows or fetch is None:
            return
        seq, done, i_b, _codes = fetch
        todo = []
        for slot, row in rows:
            if done[slot] or row["admit_seq"] > seq:
                continue
            n_now = int(i_b[slot]) + 1
            if n_now <= row["emitted"]:
                continue
            todo.append((slot, row, self._win_start(row["emitted"]), n_now))
        if todo:
            self._emit_stream_chunks(todo)

    # ------------------------------------------------------------------

    def tick(self) -> List[Tuple[int, Any]]:
        """One scheduler cycle: admit pending rows into free slots, DISPATCH
        one decode chunk (without waiting for it), then process the PREVIOUS
        chunk's pipelined host snapshot — stream emission and harvest. The
        one-chunk pipeline hides the ~30 ms host round trip behind the next
        chunk's device execution (measured: tick wall 85 ms for 55 ms of
        chunk exec before; see docs/SERVING.md). Completion/stream delivery
        lags one chunk; admission latency is unchanged (a row admitted this
        tick is in this tick's chunk)."""
        free = [i for i, r in enumerate(self.slots) if r is None]
        while free and self.pending:
            self._admit_one(self.pending.popleft(), free.pop(0))
        prev = self._fetch
        self._fetch = None
        if any(r is not None for r in self.slots):
            cols = {k: jnp.asarray(v) for k, v in self.dyn_cols.items()}
            self.rng, sub = jax.random.split(self.rng)
            self.state = self._steps_fn(
                params=self.engine.gpt_params, state=self.state, rng=sub,
                temperature=cols["temperature"], top_p=cols["top_p"],
                repetition_penalty=cols["repetition_penalty"],
                typical_mass=cols["typical_mass"],
            )
            self._seq += 1
            handles = self._snap_fn(self.state.done, self.state.i_b,
                                    self.state.codes)
            for a in handles:
                try:
                    a.copy_to_host_async()  # overlap with the chunk's exec
                except Exception:
                    pass  # backends without async host copies still work
            self._fetch = (self._seq,) + handles
        if prev is not None:
            # materialize the previous dispatch's snapshot (the transfer has
            # been in flight since that dispatch)
            prev = (prev[0], np.asarray(prev[1]), np.asarray(prev[2]),
                    np.asarray(prev[3]))
            self._stream_emit(prev)
        return self._harvest(prev)

    @property
    def busy(self) -> bool:
        # self.requests covers the cancel edge: a fully-cancelled request
        # with no live rows still needs one tick to flush its result
        return (bool(self.pending) or any(r is not None for r in self.slots)
                or bool(self.requests))

    def drain(self) -> Dict[int, Any]:
        """tick() until every submitted request has completed."""
        out: Dict[int, Any] = {}
        guard = 0
        while self.busy:
            for rid, res in self.tick():
                out[rid] = res
            guard += 1
            if guard > 100000:
                raise RuntimeError("slot session failed to drain")
        return out
