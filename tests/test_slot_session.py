"""SlotSession / engine.infer_slots (continuous-batching serving loop).

Contract: greedy slot-mode output == engine.infer per request (the same
transparency bar as infer_batch, tests/test_infer_batch.py), including
requests submitted WHILE the session is mid-decode, multi-sentence
requests, per-request dynamic knobs, and the serving engine (fast_latents +
quant_kv)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from indextts_tpu.config import save_config
    from indextts_tpu.engine import IndexTTS
    from tests.test_engine import tiny_config

    d = tmp_path_factory.mktemp("ckpt_slots")
    cfg_path = str(d / "config.yaml")
    save_config(tiny_config(), cfg_path)
    return IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False,
                    allow_random_init=True)


def _prompt(seed, frames=40):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((1, 100, frames)).astype(np.float32) * 0.1


GREEDY = dict(do_sample=False, num_beams=1, max_mel_tokens=8, repetition_penalty=1.0)


class TestInferSlots:
    def test_matches_per_request_infer(self, engine):
        mel_a, mel_b = _prompt(0), _prompt(1)
        text_a, text_b = "HI THERE.", "HELLO WORLD AGAIN."
        solo = [
            engine.infer(mel_a, text_a, None, **GREEDY),
            engine.infer(mel_b, text_b, None, **GREEDY),
        ]
        out = engine.infer_slots([(mel_a, text_a), (mel_b, text_b)],
                                 n_slots=2, **GREEDY)
        for (sr_s, wav_s), (sr_o, wav_o) in zip(solo, out):
            assert sr_s == sr_o == 24000
            assert wav_s.shape == wav_o.shape
            np.testing.assert_allclose(
                wav_s.astype(np.float32), wav_o.astype(np.float32), atol=2.0
            )  # int16 scale; bf16/f32 rounding across batch shapes

    def test_multi_sentence_request_order(self, engine):
        mel = _prompt(2)
        text = "ONE. TWO THREE FOUR. FIVE."
        solo = engine.infer(mel, text, None, **GREEDY)
        out = engine.infer_slots([(mel, text)], n_slots=2, **GREEDY)
        assert out[0][1].shape == solo[1].shape
        np.testing.assert_allclose(
            out[0][1].astype(np.float32), solo[1].astype(np.float32), atol=2.0
        )

    def test_output_paths(self, engine, tmp_path):
        mel = _prompt(3)
        paths = [str(tmp_path / "a.wav"), str(tmp_path / "b.wav")]
        out = engine.infer_slots([(mel, "HI."), (mel, "YO.")],
                                 output_paths=paths, n_slots=2, **GREEDY)
        assert out == paths
        assert all(os.path.getsize(p) > 44 for p in paths)

    def test_rejects_beams(self, engine):
        with pytest.raises(ValueError, match="num_beams=1"):
            engine.slot_session(num_beams=3)

    def test_rejects_frame_dependent_conditioning(self, engine, monkeypatch):
        """condition_type='conformer_encoder' yields frame-dependent cond
        counts; the fixed circular-cache sizing can't hold them, so the
        session must refuse up front rather than trip a device assert."""
        monkeypatch.setattr(engine.cfg.gpt, "condition_type", "conformer_encoder")
        with pytest.raises(ValueError, match="conformer_encoder"):
            engine.slot_session()

    def test_per_request_kwargs_length_mismatch(self, engine):
        mel = _prompt(5)
        with pytest.raises(ValueError, match="per_request_kwargs"):
            engine.infer_slots([(mel, "HI."), (mel, "YO.")], n_slots=2,
                               per_request_kwargs=[{}], **GREEDY)

    def test_per_request_dynamics(self, engine):
        """Requests with different repetition penalties share the session;
        each equals its solo run with that scalar."""
        mel = _prompt(4)
        kw = dict(do_sample=False, num_beams=1, max_mel_tokens=8)
        solo_1 = engine.infer(mel, "HI THERE.", None, repetition_penalty=1.0, **kw)
        solo_10 = engine.infer(mel, "HI THERE.", None, repetition_penalty=10.0, **kw)
        out = engine.infer_slots(
            [(mel, "HI THERE."), (mel, "HI THERE.")], n_slots=2,
            per_request_kwargs=[{"repetition_penalty": 1.0},
                                {"repetition_penalty": 10.0}],
            repetition_penalty=5.0, **kw,
        )
        np.testing.assert_allclose(out[0][1].astype(np.float32),
                                   solo_1[1].astype(np.float32), atol=2.0)
        np.testing.assert_allclose(out[1][1].astype(np.float32),
                                   solo_10[1].astype(np.float32), atol=2.0)


class TestRollingAdmission:
    def test_submit_mid_decode(self, engine):
        """A request submitted after the session has started decoding joins
        on the next tick and neither output is perturbed."""
        mel_a, mel_b = _prompt(5), _prompt(6)
        solo_a = engine.infer(mel_a, "HI THERE.", None, **GREEDY)
        solo_b = engine.infer(mel_b, "HELLO AGAIN.", None, **GREEDY)
        sess = engine.slot_session(n_slots=2, chunk_steps=2, **GREEDY)
        ra = sess.submit(mel_a, "HI THERE.")
        got = {}
        got.update(sess.tick())  # A decodes its first chunk alone
        rb = sess.submit(mel_b, "HELLO AGAIN.")
        while sess.busy:
            got.update(sess.tick())
        np.testing.assert_allclose(got[ra][1].astype(np.float32),
                                   solo_a[1].astype(np.float32), atol=2.0)
        np.testing.assert_allclose(got[rb][1].astype(np.float32),
                                   solo_b[1].astype(np.float32), atol=2.0)

    def test_more_requests_than_slots_reuses_slots(self, engine):
        """5 requests through 2 slots: the scheduler must harvest and
        re-admit (slot reuse + circular cursor at the engine level)."""
        mels = [_prompt(10 + i) for i in range(5)]
        texts = ["HI.", "YO.", "HELLO.", "HEY.", "SUP."]
        solo = [engine.infer(m, t, None, **GREEDY) for m, t in zip(mels, texts)]
        out = engine.infer_slots(list(zip(mels, texts)), n_slots=2, **GREEDY)
        for (sr_s, wav_s), (sr_o, wav_o) in zip(solo, out):
            assert wav_s.shape == wav_o.shape
            np.testing.assert_allclose(wav_s.astype(np.float32),
                                       wav_o.astype(np.float32), atol=2.0)


class TestSlotServingMode:
    """fast_latents + quant_kv engine: the slot path must keep the captured
    latents (skip the teacher-forced pass) and the int8 cache."""

    @pytest.fixture(scope="class")
    def serving_engine(self, tmp_path_factory):
        from indextts_tpu.config import save_config
        from indextts_tpu.engine import IndexTTS
        from tests.test_engine import tiny_config

        d = tmp_path_factory.mktemp("ckpt_slots_srv")
        cfg_path = str(d / "config.yaml")
        save_config(tiny_config(), cfg_path)
        return IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False,
                        allow_random_init=True, fast_latents=True, quant_kv=True)

    def test_matches_solo_serving(self, serving_engine):
        eng = serving_engine
        mel = _prompt(20)
        solo = eng.infer(mel, "HI THERE.", None, **GREEDY)
        out = eng.infer_slots([(mel, "HI THERE."), (mel, "HELLO WORLD.")],
                              n_slots=2, **GREEDY)
        np.testing.assert_allclose(out[0][1].astype(np.float32),
                                   solo[1].astype(np.float32), atol=2.0)

    def test_captured_latents_skip_teacher_forced(self, serving_engine, monkeypatch):
        """When silence removal changes nothing (tiny decode), the slot
        harvest must use captured latents — the teacher-forced batch helper
        must not run."""
        eng = serving_engine
        calls = []
        orig = eng._gpt_latent_many

        def spy(rows):
            calls.append(len(rows))
            return orig(rows)

        monkeypatch.setattr(eng, "_gpt_latent_many", spy)
        out = eng.infer_slots([(_prompt(21), "HI.")], n_slots=1, **GREEDY)
        assert len(out) == 1
        assert calls == []

    def test_compacted_codes_fall_back_to_teacher_forced(self, serving_engine, monkeypatch):
        """When silence removal MODIFIES a row's codes, its captured latents
        no longer describe the vocoded sequence: the harvest must take the
        batched teacher-forced fallback (serving.py pending_tf), and the
        result must still match solo infer under the same modification."""
        eng = serving_engine
        orig_rls = eng.remove_long_silence.__func__

        def compact(self, codes, silent_token=52, max_consecutive=30):
            out, lens = orig_rls(self, codes, silent_token=silent_token,
                                 max_consecutive=max_consecutive)
            out = np.asarray(out).copy()
            # flip the last code's VALUE (not a prefix trim — prefix-
            # preserving trims keep the captured latents valid by design)
            out[:, -1] = np.where(out[:, -1] == 3, 4, 3)
            return out, lens

        monkeypatch.setattr(type(eng), "remove_long_silence", compact)
        calls = []
        orig_lat = eng._gpt_latent_many

        def spy(rows):
            calls.append(len(rows))
            return orig_lat(rows)

        monkeypatch.setattr(eng, "_gpt_latent_many", spy)
        mel = _prompt(22)
        out = eng.infer_slots([(mel, "HI THERE.")], n_slots=2, **GREEDY)
        assert calls, "modified codes must take the teacher-forced fallback"
        solo = eng.infer(mel, "HI THERE.", None, **GREEDY)
        assert out[0][1].shape == solo[1].shape
        np.testing.assert_allclose(out[0][1].astype(np.float32),
                                   solo[1].astype(np.float32), atol=2.0)


class TestSlotStreaming:
    """Streaming slot requests (submit(..., on_chunk=...)): chunked audio
    from a live rolling batch. Chunks concatenated ARE the final result
    (sample-count-exact vs the non-streamed slot output; interior within
    vocoder window-edge tolerance — the infer_stream contract)."""

    @pytest.fixture(scope="class")
    def serving_engine(self, tmp_path_factory):
        from indextts_tpu.config import save_config
        from indextts_tpu.engine import IndexTTS
        from tests.test_engine import tiny_config

        d = tmp_path_factory.mktemp("ckpt_slots_stream")
        cfg_path = str(d / "config.yaml")
        save_config(tiny_config(), cfg_path)
        return IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False,
                        allow_random_init=True, fast_latents=True, quant_kv=True)

    def test_chunks_concatenate_to_result(self, serving_engine):
        eng = serving_engine
        got = []
        sess = eng.slot_session(n_slots=2, chunk_steps=3, **GREEDY)
        mel = _prompt(30)
        rid_s = sess.submit(mel, "HI THERE.",
                            on_chunk=lambda r, c: got.append((r, c.copy())))
        sess.submit(mel, "HELLO.")  # plain request shares the batch
        out = sess.drain()
        assert len(out) == 2
        wav = out[rid_s][1]
        assert got and all(r == rid_s for r, _ in got)
        cat = np.concatenate([c for _, c in got])
        np.testing.assert_array_equal(cat, wav.reshape(-1))

    def test_sample_count_matches_non_streamed(self, serving_engine):
        eng = serving_engine
        mel = _prompt(31)
        got = []
        sess = eng.slot_session(n_slots=2, chunk_steps=3, **GREEDY)
        rid = sess.submit(mel, "HI THERE.",
                          on_chunk=lambda r, c: got.append(c.copy()))
        wav = sess.drain()[rid][1]
        base = eng.infer_slots([(mel, "HI THERE.")], n_slots=2, **GREEDY)[0][1]
        assert wav.shape == base.shape
        # matches within vocoder window-edge tolerance: a streamed chunk's
        # right edge is vocoded without future context the one-shot vocode
        # has (measured 4/256 samples off by <=4 at int16 scale here)
        np.testing.assert_allclose(wav.astype(np.float32),
                                   base.astype(np.float32), atol=8.0)

    def test_multi_sentence_rows_stream_sequentially(self, serving_engine):
        eng = serving_engine
        mel = _prompt(32)
        got = []
        sess = eng.slot_session(n_slots=2, chunk_steps=2, **GREEDY)
        rid = sess.submit(mel, "ONE TWO. THREE FOUR FIVE.",
                          on_chunk=lambda r, c: got.append(c.copy()))
        wav = sess.drain()[rid][1]
        assert len(got) >= 2
        cat = np.concatenate(got)
        np.testing.assert_array_equal(cat, wav.reshape(-1))
        base = eng.infer_slots([(mel, "ONE TWO. THREE FOUR FIVE.")],
                               n_slots=2, **GREEDY)[0][1]
        assert wav.shape == base.shape

    def test_streaming_requires_fast_latents(self, tmp_path_factory):
        from indextts_tpu.config import save_config
        from indextts_tpu.engine import IndexTTS
        from tests.test_engine import tiny_config

        d = tmp_path_factory.mktemp("ckpt_slots_plain")
        cfg_path = str(d / "config.yaml")
        save_config(tiny_config(), cfg_path)
        eng = IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False,
                       allow_random_init=True)
        sess = eng.slot_session(n_slots=1, **GREEDY)
        with pytest.raises(ValueError, match="fast_latents"):
            sess.submit(_prompt(33), "HI.", on_chunk=lambda r, c: None)

    def test_stop_terminated_stream_matches_non_streamed(self, serving_engine):
        """A row that terminates via a SAMPLED stop token: the streamed
        result must not vocode the stop code's latent (remove_long_silence
        and infer_stream both trim AT the stop). Two identically-seeded
        sessions — identical rng draw sequences, streaming adds only
        vocoder calls — must produce identical-shape results."""
        eng = serving_engine
        rng = np.random.default_rng(5)
        mel = (rng.standard_normal((1, 100, 40)) * 0.1).astype(np.float32)
        kw = dict(do_sample=True, top_k=30, max_mel_tokens=24, num_beams=1,
                  temperature=1.0, top_p=0.9, repetition_penalty=1.5)
        spc = eng._samples_per_code()

        plain = eng.slot_session(n_slots=2, chunk_steps=3, seed=4, **kw)
        rid = plain.submit(mel, "HI THERE.")
        base = plain.drain()[rid][1]
        assert base.size < 24 * spc, "seed must exercise the stop path"

        got = []
        stream = eng.slot_session(n_slots=2, chunk_steps=3, seed=4, **kw)
        rid = stream.submit(mel, "HI THERE.",
                            on_chunk=lambda r, c: got.append(c.copy()))
        wav = stream.drain()[rid][1]
        assert wav.shape == base.shape
        np.testing.assert_array_equal(np.concatenate(got), wav.reshape(-1))
        np.testing.assert_allclose(wav.astype(np.float32),
                                   base.astype(np.float32), atol=8.0)

    def test_cancel_mid_decode_frees_slot_and_truncates(self, serving_engine):
        """cancel(rid) mid-decode: the row stops at the next tick boundary,
        its request completes with the audio produced so far (delivered
        chunks == result), and other requests are unaffected."""
        eng = serving_engine
        mel = _prompt(40)
        # greedy on random weights runs to the max_mel cap (no sampled
        # stop), so the cancel deterministically lands mid-decode
        kw = dict(do_sample=False, max_mel_tokens=24, num_beams=1,
                  repetition_penalty=1.0)
        spc = eng._samples_per_code()
        sess = eng.slot_session(n_slots=2, chunk_steps=3, **kw)
        got = []
        rid_c = sess.submit(mel, "HI THERE.",
                            on_chunk=lambda r, c: got.append(c.copy()))
        rid_k = sess.submit(mel, "HELLO WORLD.")
        out = dict(sess.tick())
        assert rid_c not in out, "premise: still decoding after one tick"
        sess.cancel(rid_c)
        out.update(sess.drain())
        assert set(out) == {rid_c, rid_k}
        wav_c = out[rid_c][1]
        # truncated: at most the codes decoded before the cancel tick + one
        # final boundary chunk; far less than a full 24-code decode
        assert 0 < wav_c.size < 24 * spc
        np.testing.assert_array_equal(np.concatenate(got), wav_c.reshape(-1))
        assert out[rid_k][1].size > 0

    @pytest.mark.parametrize("streaming", [True, False], ids=["stream", "plain"])
    def test_cancel_before_admission_completes_empty(self, serving_engine, streaming):
        """cancel(rid) while every row is still queued: the request
        completes with empty audio and never occupies a slot — for BOTH
        the streaming and non-streaming harvest branches (the latter must
        not hit np.concatenate on zero chunks)."""
        eng = serving_engine
        mel = _prompt(41)
        sess = eng.slot_session(n_slots=1, chunk_steps=2, **GREEDY)
        rid_a = sess.submit(mel, "HI THERE.")
        over = {"on_chunk": (lambda r, c: None)} if streaming else {}
        rid_b = sess.submit(mel, "HELLO.", **over)
        sess.cancel(rid_b)  # still queued behind rid_a (1 slot)
        out = sess.drain()
        assert out[rid_b][1].size == 0
        assert out[rid_a][1].size > 0


class TestSlotSchedulerFuzz:
    """Randomized submit/tick/cancel interleavings: every non-cancelled
    request must equal its solo run regardless of admission order, slot
    reuse, or cancellations happening around it; cancelled requests must
    complete (possibly truncated/empty) without wedging the session."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_schedule_matches_solo(self, engine, seed):
        rng = np.random.default_rng(seed)
        texts = ["HI.", "YO THERE.", "HELLO WORLD.", "HEY NOW.", "SUP."]
        sess = engine.slot_session(n_slots=2, chunk_steps=2, **GREEDY)
        submitted = {}
        cancelled = set()
        results = {}
        n_target = 5
        ops = 0
        while (len(results) < len(submitted) or len(submitted) < n_target) and ops < 200:
            ops += 1
            roll = rng.random()
            if len(submitted) < n_target and roll < 0.4:
                i = len(submitted)
                mel, text = _prompt(50 + i), texts[i % len(texts)]
                rid = sess.submit(mel, text)
                submitted[rid] = (mel, text)
            elif roll < 0.5 and submitted and rng.random() < 0.3:
                victim = int(rng.choice(list(submitted)))
                if victim not in results:
                    sess.cancel(victim)
                    cancelled.add(victim)
            else:
                results.update(sess.tick())
        assert ops < 200, "scheduler failed to converge"
        assert set(results) == set(submitted)
        for rid, (mel, text) in submitted.items():
            wav = results[rid][1]
            if rid in cancelled:
                # truncated or empty, but emitted and well-formed int16
                assert wav.dtype == np.int16
                continue
            solo = engine.infer(mel, text, None, **GREEDY)
            assert wav.shape == solo[1].shape
            np.testing.assert_allclose(wav.astype(np.float32),
                                       solo[1].astype(np.float32), atol=2.0)
