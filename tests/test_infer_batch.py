"""Cross-request batched synthesis (engine.infer_batch).

The serving-mode contract: batching rows from different requests into one
decode must not change any request's output. Greedy decode is
padding/batch-invariant (tests/test_gpt.py, the reference padding_test.py
contract), the latent pass is per-row, and the vocoder runs per request —
so `infer_batch` in greedy mode must reproduce `infer` bit-for-bit-ish
(float tolerance) per request. The reference has no such mode (its web
server serializes requests, webui.py:232)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from indextts_tpu.config import save_config
    from indextts_tpu.engine import IndexTTS
    from tests.test_engine import tiny_config

    d = tmp_path_factory.mktemp("ckpt_batch")
    cfg_path = str(d / "config.yaml")
    save_config(tiny_config(), cfg_path)
    return IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False,
                    allow_random_init=True)


def _prompt(engine, seed, frames=40):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((1, 100, frames)).astype(np.float32) * 0.1


GREEDY = dict(do_sample=False, num_beams=1, max_mel_tokens=8, repetition_penalty=1.0)


class TestInferBatch:
    def test_matches_per_request_infer(self, engine):
        """Two requests, different prompts and texts: batched == solo."""
        mel_a, mel_b = _prompt(engine, 0), _prompt(engine, 1)
        text_a, text_b = "HI THERE.", "HELLO WORLD AGAIN."
        solo = [
            engine.infer(mel_a, text_a, None, **GREEDY),
            engine.infer(mel_b, text_b, None, **GREEDY),
        ]
        batched = engine.infer_batch([(mel_a, text_a), (mel_b, text_b)], **GREEDY)
        assert len(batched) == 2
        for (sr_s, wav_s), (sr_b, wav_b) in zip(solo, batched):
            assert sr_s == sr_b == 24000
            assert wav_s.shape == wav_b.shape
            np.testing.assert_allclose(
                wav_s.astype(np.float32), wav_b.astype(np.float32), atol=2.0
            )  # int16 scale; bf16/f32 rounding across batch shapes

    def test_multi_sentence_requests_order(self, engine):
        """Requests with several sentences each keep per-request assembly in
        sentence order (rows are shuffled across buckets internally)."""
        mel_a, mel_b = _prompt(engine, 2), _prompt(engine, 3, frames=52)
        text_a = "ONE. TWO THREE FOUR. FIVE."
        text_b = "ALPHA BETA. GAMMA."
        solo_a = engine.infer(mel_a, text_a, None, **GREEDY)
        solo_b = engine.infer(mel_b, text_b, None, **GREEDY)
        out = engine.infer_batch([(mel_a, text_a), (mel_b, text_b)], **GREEDY)
        assert out[0][1].shape == solo_a[1].shape
        assert out[1][1].shape == solo_b[1].shape
        np.testing.assert_allclose(
            out[0][1].astype(np.float32), solo_a[1].astype(np.float32), atol=2.0
        )
        np.testing.assert_allclose(
            out[1][1].astype(np.float32), solo_b[1].astype(np.float32), atol=2.0
        )

    def test_output_paths(self, engine, tmp_path):
        mel = _prompt(engine, 4)
        paths = [str(tmp_path / "a.wav"), str(tmp_path / "b.wav")]
        out = engine.infer_batch(
            [(mel, "HI."), (mel, "YO.")], output_paths=paths, **GREEDY
        )
        assert out == paths
        assert all(os.path.getsize(p) > 44 for p in paths)

    def test_empty_text_raises_with_request_index(self, engine):
        mel = _prompt(engine, 5)
        with pytest.raises(ValueError, match="Request 1"):
            engine.infer_batch([(mel, "HI."), (mel, "")], **GREEDY)

    def test_sampling_mode_runs(self, engine):
        """do_sample batch smoke test (no parity claim — the batch draws a
        joint key, so per-row samples differ from solo runs by design)."""
        mel = _prompt(engine, 6)
        out = engine.infer_batch(
            [(mel, "HI."), (mel, "HELLO.")],
            do_sample=True, top_k=5, num_beams=1, max_mel_tokens=8,
        )
        assert len(out) == 2 and all(sr == 24000 for sr, _ in out)


class TestPerRequestParams:
    """per_request_kwargs: requests with DIFFERENT sampling knobs share one
    decode batch via per-row traced vectors; each request's output must
    equal its solo run with those knobs."""

    def test_greedy_rep_penalty_per_request(self, engine):
        mel_a, mel_b = _prompt(engine, 10), _prompt(engine, 11)
        text = "HELLO WORLD."
        base = dict(do_sample=False, num_beams=1, max_mel_tokens=8)
        solo = [
            engine.infer(mel_a, text, None, repetition_penalty=1.0, **base),
            engine.infer(mel_b, text, None, repetition_penalty=8.0, **base),
        ]
        out = engine.infer_batch(
            [(mel_a, text), (mel_b, text)],
            per_request_kwargs=[{"repetition_penalty": 1.0}, {"repetition_penalty": 8.0}],
            repetition_penalty=5.0,  # base value, overridden per request
            **base,
        )
        for (sr_s, w_s), (sr_b, w_b) in zip(solo, out):
            assert w_s.shape == w_b.shape
            np.testing.assert_allclose(w_s.astype(np.float32), w_b.astype(np.float32), atol=2.0)

    def test_beam_length_penalty_per_request(self, engine):
        mel = _prompt(engine, 12)
        base = dict(do_sample=False, num_beams=2, max_mel_tokens=8, repetition_penalty=1.0)
        solo = [
            engine.infer(mel, "HI THERE.", None, length_penalty=0.0, **base),
            engine.infer(mel, "HI THERE.", None, length_penalty=2.0, **base),
        ]
        out = engine.infer_batch(
            [(mel, "HI THERE."), (mel, "HI THERE.")],
            per_request_kwargs=[{"length_penalty": 0.0}, {"length_penalty": 2.0}],
            **base,
        )
        for (sr_s, w_s), (sr_b, w_b) in zip(solo, out):
            assert w_s.shape == w_b.shape
            np.testing.assert_allclose(w_s.astype(np.float32), w_b.astype(np.float32), atol=2.0)

    def test_static_override_rejected(self, engine):
        mel = _prompt(engine, 13)
        with pytest.raises(ValueError, match="static"):
            engine.infer_batch(
                [(mel, "HI."), (mel, "YO.")],
                per_request_kwargs=[{"num_beams": 1}, {}],
                **GREEDY,
            )


class TestInferBatchServingMode:
    """infer_batch on the production serving engine (fast_latents latent
    capture + int8 quant_kv cache): batched serving must still match the
    solo path, and the decode-captured latents must eliminate the
    teacher-forced pass for unmodified codes (engine.infer_batch's
    cap_lat branch) — across greedy AND beam batches."""

    @pytest.fixture(scope="class")
    def fast_engine(self, tmp_path_factory):
        from indextts_tpu.config import save_config
        from indextts_tpu.engine import IndexTTS
        from tests.test_engine import tiny_config

        d = tmp_path_factory.mktemp("ckpt_batch_serving")
        cfg_path = str(d / "config.yaml")
        save_config(tiny_config(), cfg_path)
        return IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False,
                        allow_random_init=True, fast_latents=True, quant_kv=True)

    def test_matches_solo_infer(self, fast_engine):
        """Captured-latent rows are sliced per batch row (cap_lat[i:i+1]);
        batched output must equal the solo fast-path output per request."""
        mel_a, mel_b = _prompt(fast_engine, 20), _prompt(fast_engine, 21)
        text_a, text_b = "HI THERE.", "HELLO WORLD AGAIN."
        solo = [
            fast_engine.infer(mel_a, text_a, None, **GREEDY),
            fast_engine.infer(mel_b, text_b, None, **GREEDY),
        ]
        batched = fast_engine.infer_batch([(mel_a, text_a), (mel_b, text_b)], **GREEDY)
        for (sr_s, wav_s), (sr_b, wav_b) in zip(solo, batched):
            assert sr_s == sr_b == 24000
            assert wav_s.shape == wav_b.shape
            np.testing.assert_allclose(
                wav_s.astype(np.float32), wav_b.astype(np.float32), atol=2.0
            )

    def test_skips_teacher_forced_pass(self, fast_engine, monkeypatch):
        """Clean greedy codes: every row's latents come from the decode
        capture; neither _gpt_latent nor _gpt_latent_many may run."""
        calls = []
        monkeypatch.setattr(fast_engine, "_gpt_latent",
                            lambda *a, **k: calls.append("solo"))
        monkeypatch.setattr(fast_engine, "_gpt_latent_many",
                            lambda *a, **k: calls.append("many"))
        mel = _prompt(fast_engine, 22)
        out = fast_engine.infer_batch([(mel, "HI."), (mel, "HELLO WORLD.")], **GREEDY)
        assert len(out) == 2 and all(w.shape[1] > 0 for _, w in out)
        assert calls == []

    def test_beam_batch_skips_pass(self, fast_engine, monkeypatch):
        """Beam batches capture too (winner's latents lineage-gathered at
        finalize): the teacher-forced pass stays skipped for num_beams>1."""
        calls = []
        monkeypatch.setattr(fast_engine, "_gpt_latent",
                            lambda *a, **k: calls.append("solo"))
        monkeypatch.setattr(fast_engine, "_gpt_latent_many",
                            lambda *a, **k: calls.append("many"))
        mel = _prompt(fast_engine, 23)
        out = fast_engine.infer_batch(
            [(mel, "HI."), (mel, "YO.")],
            do_sample=False, num_beams=2, max_mel_tokens=8, repetition_penalty=1.0,
        )
        assert len(out) == 2 and all(np.isfinite(w).all() for _, w in out)
        assert calls == []


class TestBatchedHelpers:
    """Direct parity pins for the cross-row batching helpers.

    Both helpers exist purely as execution-shape optimizations: the
    reference runs the latent re-encode one sequence at a time
    (infer.py:446-477) and the vocoder one chunk at a time
    (infer.py:485-503). Batched == per-row is the contract that makes the
    batched forms legal."""

    def test_gpt_latent_many_matches_per_row(self, engine):
        """Rows spanning several (text, code) buckets + a non-pow2 group."""
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        g = engine.cfg.gpt
        rows = []
        for i, (lt, lc) in enumerate([(5, 6), (9, 6), (5, 20), (12, 18), (3, 3)]):
            conds = engine._conds_for(_prompt(engine, 30 + i))
            tt = rng.integers(0, g.number_text_tokens - 1, (1, lt)).astype(np.int32)
            cd = rng.integers(0, g.start_mel_token, (1, lc)).astype(np.int32)
            rows.append((conds, tt, cd, np.array([lc], np.int64)))
        many = engine._gpt_latent_many(rows)
        assert len(many) == len(rows)
        for (conds, tt, cd, cl), lat in zip(rows, many):
            assert lat.shape == (1, cd.shape[1], g.model_dim)
            solo = engine._gpt_latent(conds, tt, cd, cl)[:, : cd.shape[1]]
            np.testing.assert_allclose(
                np.asarray(lat, np.float32), np.asarray(solo, np.float32),
                rtol=2e-5, atol=2e-5,
            )

    def test_conds_for_many_matches_solo(self, engine):
        """Batched conditioning == solo _conds_for per prompt. Misses are
        grouped by the SAME per-prompt frame bucket the solo path pads to
        (the conformer conv module is deliberately not pad-invariant,
        matching the reference conformer_encoder.py:133-165 — see
        tests/test_conditioning.py — so a larger shared bucket would change
        latents); a bucket with one miss falls back to the solo path."""
        # frames 40 and 46 share bucket 100 (batched pair); 140 -> bucket 200
        mels = [
            _prompt(engine, 60, frames=40),
            _prompt(engine, 61, frames=46),
            _prompt(engine, 62, frames=140),
        ]
        solo = [np.asarray(engine._conds_for(m), np.float32) for m in mels]
        for k in [k for k in engine._cond_cache if k[0] == "condval"]:
            del engine._cond_cache[k]
        many = engine._conds_for_many(mels)
        for s, m in zip(solo, many):
            assert m.shape == s.shape
            np.testing.assert_allclose(np.asarray(m, np.float32), s,
                                       rtol=2e-5, atol=2e-5)

    def test_conds_for_many_dedup_and_cache(self, engine):
        """Duplicate prompts compute once; value-cache hits are returned
        as-is (no device call) and misses land in the shared cache."""
        for k in [k for k in engine._cond_cache if k[0] == "condval"]:
            del engine._cond_cache[k]
        a, b = _prompt(engine, 63), _prompt(engine, 64, frames=46)
        pre = engine._conds_for(a)  # warm the value cache for `a`
        out = engine._conds_for_many([a, b, a])
        assert out[0] is pre and out[2] is pre
        assert out[1].shape == pre.shape
        # b's latents were stored: a second call is all cache hits
        again = engine._conds_for_many([b])
        assert again[0] is out[1]

    def test_vocode_many_matches_per_chunk(self, engine):
        """Chunks with differing latent lengths and prompt frame counts;
        expected = per-chunk _vocode + the host-side int16 WAV cast."""
        import jax.numpy as jnp

        rng = np.random.default_rng(8)
        d = engine.cfg.gpt.model_dim
        chunks = []
        for i, (tc, nv, fr) in enumerate([(6, 5, 40), (9, 9, 40), (6, 6, 52), (17, 16, 40)]):
            lat = jnp.asarray(rng.standard_normal((1, tc, d)).astype(np.float32) * 0.1)
            chunks.append((lat, nv, _prompt(engine, 40 + i, frames=fr)))
        many = engine._vocode_many(chunks)
        assert len(many) == len(chunks)
        spc = engine._samples_per_code()
        for (lat, nv, mel), wav in zip(chunks, many):
            assert wav.dtype == np.int16
            assert wav.shape == (1, nv * spc)
            solo = engine._vocode(lat, nv, mel)
            expected = np.clip(32767.0 * solo, -32767.0, 32767.0).astype(np.int16)
            np.testing.assert_allclose(
                wav.astype(np.float32), expected.astype(np.float32), atol=2.0
            )
