"""Decode-time latent capture (SURVEY §7 hard-part 3).

The reference computes vocoder latents by a SECOND teacher-forced forward
over the generated codes (infer.py:196-200 -> model.py:521-578). That pass
uses consistent mel positions 0..L+1, while its own decode loop gives
generated token t mel position t+2 (the GPT2InferenceModel off-by-one,
model.py:151-155) — the reference is internally inconsistent, and the
second pass is the price of that inconsistency.

Capture contract pinned here:
  * pos_off=1 (consistent-positions serving mode): the final_norm'd hiddens
    captured during decode MATCH the teacher-forced two-pass latents for the
    same codes (the positions now agree; only bf16 step-vs-batch accumulation
    differs).
  * pos_off=2 (reference parity mode): captured latents deviate from the
    two-pass latents (different positional rows) — asserted so nobody
    silently ships them as equivalent.
  * default path unchanged: generate_speech without capture still matches
    the capture run's codes token-for-token at the same pos_off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.models.gpt import unified_voice_forward
from indextts_tpu.models.gpt_decode import GenerationConfig, generate_speech, generate_speech_segmented
from tests.test_gpt import setup, tiny_cfg  # noqa: F401  (fixture reuse)


def _teacher_forced(cfg, params, conds_b, text, lens, codes, n):
    """The engine's stage-2 latent pass (engine._latent_fn semantics)."""
    wav_lens = jnp.asarray([n * cfg.mel_length_compression] * codes.shape[0])
    return unified_voice_forward(
        params, cfg, None, text, lens, codes, wav_lens, None,
        return_latent=True, conds=conds_b, mask_pad_keys=True,
    )


def _run_capture(cfg, params, conds, pos_off, seg=False):
    text = jnp.asarray([[3, 5, 7, 9, 11, 2], [4, 6, 8, 10, 12, 2]], jnp.int32)
    lens = jnp.asarray([6, 6])
    conds_b = jnp.broadcast_to(conds, (2,) + conds.shape[1:])
    gen = GenerationConfig(do_sample=False, max_new_tokens=16)
    if seg:
        codes, lengths, lat = generate_speech_segmented(
            params, cfg, gen, conds_b, text, lens, jax.random.PRNGKey(5),
            segment=6, capture_latents=True, pos_off=pos_off,
        )
    else:
        codes, lengths, lat = generate_speech(
            params, cfg, gen, conds_b, text, lens, jax.random.PRNGKey(5),
            capture_latents=True, pos_off=pos_off,
        )
    return text, lens, conds_b, np.asarray(codes), np.asarray(lengths), np.asarray(lat)


@pytest.mark.parametrize("seg", [False, True])
def test_captured_match_teacher_forced_consistent_positions(setup, seg):
    cfg, params, conds = setup
    text, lens, conds_b, codes, lengths, lat = _run_capture(cfg, params, conds, pos_off=1, seg=seg)
    for b in range(2):
        # non-stop codes, as the engine trims before the latent pass
        stop = np.nonzero(codes[b] == cfg.stop_mel_token)[0]
        n = int(stop[0]) if stop.size else codes.shape[1]
        if n == 0:
            continue
        tf = np.asarray(
            _teacher_forced(cfg, params, conds_b[b : b + 1], text[b : b + 1],
                            lens[b : b + 1], jnp.asarray(codes[b : b + 1, :n]), n)
        )
        np.testing.assert_allclose(lat[b, :n], tf[0, :n], atol=2e-2, rtol=0)


def test_captured_deviate_under_reference_positions(setup):
    cfg, params, conds = setup
    text, lens, conds_b, codes, lengths, lat = _run_capture(cfg, params, conds, pos_off=2)
    stop = np.nonzero(codes[0] == cfg.stop_mel_token)[0]
    n = int(stop[0]) if stop.size else codes.shape[1]
    if n < 2:
        pytest.skip("decode stopped immediately")
    tf = np.asarray(
        _teacher_forced(cfg, params, conds_b[:1], text[:1], lens[:1],
                        jnp.asarray(codes[:1, :n]), n)
    )
    # positions differ from index 1 on -> latents genuinely differ
    assert np.max(np.abs(lat[0, 1:n] - tf[0, 1:n])) > 5e-2


@pytest.mark.parametrize("pos_off", [1, 2])
def test_capture_does_not_change_codes(setup, pos_off):
    cfg, params, conds = setup
    text = jnp.asarray([[3, 5, 7, 9, 11, 2]], jnp.int32)
    lens = jnp.asarray([6])
    conds_b = jnp.broadcast_to(conds, (1,) + conds.shape[1:])
    gen = GenerationConfig(do_sample=False, max_new_tokens=12)
    a, la = generate_speech(params, cfg, gen, conds_b, text, lens, jax.random.PRNGKey(7),
                            pos_off=pos_off)
    b, lb, _ = generate_speech(params, cfg, gen, conds_b, text, lens, jax.random.PRNGKey(7),
                               capture_latents=True, pos_off=pos_off)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_segmented_capture_matches_monolithic(setup):
    cfg, params, conds = setup
    text, lens, conds_b, codes_m, lengths_m, lat_m = _run_capture(cfg, params, conds, pos_off=1)
    _, _, _, codes_s, lengths_s, lat_s = _run_capture(cfg, params, conds, pos_off=1, seg=True)
    np.testing.assert_array_equal(codes_m, codes_s)
    n = int(min(lengths_m.max(), lat_m.shape[1]))
    np.testing.assert_allclose(lat_m[:, :n], lat_s[:, :n], atol=2e-2, rtol=0)


def _run_capture_beam(cfg, params, conds, pos_off, seg=False, nb=3, key=5):
    from indextts_tpu.models.gpt_decode import (
        generate_speech_beam,
        generate_speech_beam_segmented,
    )

    text = jnp.asarray([[3, 5, 7, 9, 11, 2], [4, 6, 8, 10, 12, 2]], jnp.int32)
    lens = jnp.asarray([6, 6])
    conds_b = jnp.broadcast_to(conds, (2,) + conds.shape[1:])
    gen = GenerationConfig(do_sample=False, num_beams=nb, max_new_tokens=16)
    if seg:
        codes, lengths, lat = generate_speech_beam_segmented(
            params, cfg, gen, conds_b, text, lens, jax.random.PRNGKey(key),
            segment=6, capture_latents=True, pos_off=pos_off, jit_cache={},
        )
    else:
        codes, lengths, lat = generate_speech_beam(
            params, cfg, gen, conds_b, text, lens, jax.random.PRNGKey(key),
            capture_latents=True, pos_off=pos_off,
        )
    return text, lens, conds_b, np.asarray(codes), np.asarray(lengths), np.asarray(lat)


class TestBeamCapture:
    """Latent capture under BEAM decode: per-step hiddens stay in their
    physical rows (never reordered — the beam-cache rule) and the winning
    hypothesis's latents are resolved by ONE lineage gather at finalize
    (_gather_beam_latents). Contract mirrors the sampling capture above:
    pos_off=1 captured == teacher-forced on the winning codes; capture
    never perturbs token selection."""

    @pytest.mark.parametrize("seg", [False, True])
    def test_captured_match_teacher_forced(self, setup, seg):
        cfg, params, conds = setup
        text, lens, conds_b, codes, lengths, lat = _run_capture_beam(
            cfg, params, conds, pos_off=1, seg=seg
        )
        assert lengths.min() >= 1
        for b in range(2):
            n = int(lengths[b])
            tf = np.asarray(
                _teacher_forced(cfg, params, conds_b[b : b + 1], text[b : b + 1],
                                lens[b : b + 1], jnp.asarray(codes[b : b + 1, :n]), n)
            )
            np.testing.assert_allclose(lat[b, :n], tf[0, :n], atol=2e-2, rtol=0)

    def test_finished_winner_lineage_snapshot(self, setup):
        """When the winner is a FINISHED hypothesis (len < max_new), its
        lineage rows come from the snapshot taken at finish time inside
        _beam_step — exercised by seeds where some row stops early; parity
        on those rows validates the snapshot, not just the live path."""
        from indextts_tpu.models.gpt_decode import generate_speech_beam

        cfg, params, conds = setup
        text = jnp.asarray([[3, 5, 7, 9, 11, 2], [4, 6, 8, 10, 12, 2]], jnp.int32)
        lens = jnp.asarray([6, 6])
        conds_b = jnp.broadcast_to(conds, (2,) + conds.shape[1:])
        # beam_sample (key-sensitive; greedy would finish — or not — the
        # same way for every key) until some row's winner finishes early
        gen = GenerationConfig(do_sample=True, num_beams=3, top_k=8, max_new_tokens=16)
        hit = False
        for key in range(1, 25):
            codes, lengths, lat = generate_speech_beam(
                params, cfg, gen, conds_b, text, lens, jax.random.PRNGKey(key),
                capture_latents=True, pos_off=1,
            )
            codes, lengths, lat = np.asarray(codes), np.asarray(lengths), np.asarray(lat)
            for b in range(2):
                n = int(lengths[b])
                if n >= 2 and n < codes.shape[1]:
                    hit = True
                    tf = np.asarray(
                        _teacher_forced(cfg, params, conds_b[b : b + 1], text[b : b + 1],
                                        lens[b : b + 1], jnp.asarray(codes[b : b + 1, :n]), n)
                    )
                    np.testing.assert_allclose(lat[b, :n], tf[0, :n], atol=2e-2, rtol=0)
            if hit:
                break
        assert hit, "no seed produced a finished winner; widen the seed list"

    @pytest.mark.parametrize("pos_off", [1, 2])
    def test_capture_does_not_change_codes(self, setup, pos_off):
        from indextts_tpu.models.gpt_decode import generate_speech_beam

        cfg, params, conds = setup
        text = jnp.asarray([[3, 5, 7, 9, 11, 2]], jnp.int32)
        lens = jnp.asarray([6])
        conds_b = jnp.broadcast_to(conds, (1,) + conds.shape[1:])
        gen = GenerationConfig(do_sample=False, num_beams=3, max_new_tokens=12)
        a, la = generate_speech_beam(params, cfg, gen, conds_b, text, lens,
                                     jax.random.PRNGKey(7), pos_off=pos_off)
        b, lb, _ = generate_speech_beam(params, cfg, gen, conds_b, text, lens,
                                        jax.random.PRNGKey(7),
                                        capture_latents=True, pos_off=pos_off)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_segmented_capture_matches_monolithic(self, setup):
        cfg, params, conds = setup
        _, _, _, codes_m, lengths_m, lat_m = _run_capture_beam(cfg, params, conds, pos_off=1)
        _, _, _, codes_s, lengths_s, lat_s = _run_capture_beam(cfg, params, conds, pos_off=1, seg=True)
        np.testing.assert_array_equal(codes_m, codes_s)
        np.testing.assert_array_equal(lengths_m, lengths_s)
        for b in range(2):
            n = int(lengths_m[b])
            np.testing.assert_allclose(lat_m[b, :n], lat_s[b, :n], atol=2e-2, rtol=0)

    def test_sampled_beam_capture(self, setup):
        """beam_sample (do_sample=True) rides the same lineage machinery."""
        from indextts_tpu.models.gpt_decode import generate_speech_beam

        cfg, params, conds = setup
        text = jnp.asarray([[3, 5, 7, 9, 11, 2]], jnp.int32)
        lens = jnp.asarray([6])
        conds_b = jnp.broadcast_to(conds, (1,) + conds.shape[1:])
        gen = GenerationConfig(do_sample=True, num_beams=2, top_k=12, max_new_tokens=12)
        codes, lengths, lat = generate_speech_beam(
            params, cfg, gen, conds_b, text, lens, jax.random.PRNGKey(3),
            capture_latents=True, pos_off=1,
        )
        n = int(np.asarray(lengths)[0])
        if n < 2:
            pytest.skip("sampled decode stopped immediately")
        tf = np.asarray(
            _teacher_forced(cfg, params, conds_b, text, lens,
                            jnp.asarray(np.asarray(codes)[:, :n]), n)
        )
        np.testing.assert_allclose(np.asarray(lat)[0, :n], tf[0, :n], atol=2e-2, rtol=0)


class TestEngineFastLatents:
    """Engine wiring: fast_latents skips the stage-2 pass when silence
    removal is a no-op, and falls back to it otherwise (and for beams)."""

    @pytest.fixture(scope="class")
    def engine(self, tmp_path_factory):
        from indextts_tpu.config import save_config
        from indextts_tpu.engine import IndexTTS
        from tests.test_engine import tiny_config

        d = tmp_path_factory.mktemp("ckpt_fastlat")
        cfg_path = str(d / "config.yaml")
        save_config(tiny_config(), cfg_path)
        return IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False,
                        allow_random_init=True, fast_latents=True)

    def test_skips_second_pass_on_clean_codes(self, engine, monkeypatch, tmp_path):
        calls = []
        orig = engine._gpt_latent
        monkeypatch.setattr(engine, "_gpt_latent", lambda *a, **k: calls.append(1) or orig(*a, **k))
        import os as _os

        from tests.test_engine import prompt_mel as _  # noqa: F401

        mel = engine.extract_features(_os.path.join(_os.path.dirname(__file__), "sample_prompt.wav"))
        sr, wav = engine.infer(mel, "HI THERE.", None, do_sample=False, num_beams=1,
                               max_mel_tokens=8, repetition_penalty=1.0)
        assert sr == 24000 and wav.shape[1] > 0
        assert calls == []  # captured latents used, no teacher-forced pass

    def test_beam_path_skips_second_pass(self, engine, monkeypatch):
        """Beams capture too (round 3): the winner's per-step hiddens are
        lineage-gathered at finalize, so the engine default decode config
        (num_beams>1) also skips the teacher-forced pass under fast_latents."""
        calls = []
        orig = engine._gpt_latent
        monkeypatch.setattr(engine, "_gpt_latent", lambda *a, **k: calls.append(1) or orig(*a, **k))
        import os as _os

        mel = engine.extract_features(_os.path.join(_os.path.dirname(__file__), "sample_prompt.wav"))
        sr, wav = engine.infer(mel, "HI.", None, do_sample=False, num_beams=2,
                               max_mel_tokens=8, repetition_penalty=1.0)
        assert sr == 24000 and wav.shape[1] > 0
        assert np.isfinite(wav).all()
        assert calls == []  # captured latents used on the beam path too

    def test_streaming_uses_captured_latents(self, engine, monkeypatch):
        calls = []
        orig = engine._gpt_latent
        monkeypatch.setattr(engine, "_gpt_latent", lambda *a, **k: calls.append(1) or orig(*a, **k))
        import os as _os

        mel = engine.extract_features(_os.path.join(_os.path.dirname(__file__), "sample_prompt.wav"))
        chunks = list(engine.infer_stream(
            prompt_mel=mel, text="HELLO STREAMING WORLD.", do_sample=True, top_k=10,
            max_mel_tokens=12, first_chunk_codes=4, chunk_codes=4,
        ))
        assert calls == []  # every chunk's latents came from the decode loop
        assert all(c.dtype == np.float32 for c in chunks)


class TestServingModeCombined:
    """The production serving configuration — quant_kv (int8 KV cache) AND
    fast_latents (decode-time latent capture) together, through the ENGINE
    (bench.py's serving_mode extra uses exactly these flags; the individual
    features are covered by test_quant.py / the class above, but the flag
    plumbing engine.__init__ -> _gpt_generate jit-key -> generate_speech
    is only exercised in combination here)."""

    @pytest.fixture(scope="class")
    def engine(self, tmp_path_factory):
        from indextts_tpu.config import save_config
        from indextts_tpu.engine import IndexTTS
        from tests.test_engine import tiny_config

        d = tmp_path_factory.mktemp("ckpt_serving")
        cfg_path = str(d / "config.yaml")
        save_config(tiny_config(), cfg_path)
        return IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False,
                        allow_random_init=True, fast_latents=True, quant_kv=True)

    def test_infer_greedy_skips_second_pass(self, engine, monkeypatch):
        calls = []
        orig = engine._gpt_latent
        monkeypatch.setattr(engine, "_gpt_latent", lambda *a, **k: calls.append(1) or orig(*a, **k))
        import os as _os

        mel = engine.extract_features(_os.path.join(_os.path.dirname(__file__), "sample_prompt.wav"))
        sr, wav = engine.infer(mel, "HI THERE.", None, do_sample=False, num_beams=1,
                               max_mel_tokens=8, repetition_penalty=1.0)
        assert sr == 24000 and wav.shape[1] > 0
        assert np.isfinite(wav).all()
        assert calls == []  # captured latents used despite the int8 cache

    def test_jit_key_carries_quant_kv(self, engine):
        """The decode jit cache key must distinguish quant_kv engines, or a
        process serving both modes would silently reuse the wrong graph."""
        keys = [k for k in engine._decode_cache if k and k[0] == "dec"]
        assert keys, "greedy infer above must have populated the decode cache"
        assert all(k[-1] is True for k in keys), keys

    def test_streaming_uses_int8_cache(self, engine, monkeypatch):
        """--quant-kv must apply to the streaming path too (review finding:
        it was silently ignored there). The first-chunk prefill must build
        the int8 (k8, ks, v8, vs) cache, not the bf16 (k2, v2) pair."""
        import indextts_tpu.models.gpt_decode as gd

        seen_struct = []
        orig = gd.prefill_decode_state

        def spy(*a, **k):
            state, aux = orig(*a, **k)
            seen_struct.append(len(state[2]))  # arrays in the cache tuple
            return state, aux

        monkeypatch.setattr(gd, "prefill_decode_state", spy)
        # the engine caches jitted graphs; use a fresh bucket via a distinct
        # chunk size so the spy-wrapped trace actually runs
        import os as _os

        mel = engine.extract_features(_os.path.join(_os.path.dirname(__file__), "sample_prompt.wav"))
        chunks = list(engine.infer_stream(
            prompt_mel=mel, text="QUANT STREAM CHECK.", do_sample=True, top_k=10,
            max_mel_tokens=12, first_chunk_codes=5, chunk_codes=5,
        ))
        assert chunks and all(np.isfinite(c).all() for c in chunks)
        assert seen_struct and seen_struct[0] == 4  # int8 cache: k8, ks, v8, vs
