"""End-to-end engine tests on a tiny random-init config: text -> tokens ->
conditioning -> AR decode -> latents -> vocoder -> wav file, for both infer()
and infer_fast() (reference pipeline: infer.py:101-241, 332-537)."""

import os

import numpy as np
import pytest

from indextts_tpu.config import (
    BigVGANConfig,
    ConditionModuleConfig,
    DVAEConfig,
    GPTConfig,
    IndexTTSConfig,
    save_config,
)
from indextts_tpu.engine import IndexTTS


def tiny_config() -> IndexTTSConfig:
    return IndexTTSConfig(
        gpt=GPTConfig(
            layers=2,
            model_dim=64,
            heads=4,
            max_text_tokens=60,
            max_mel_tokens=48,
            number_text_tokens=50,
            number_mel_codes=66,
            start_mel_token=64,
            stop_mel_token=65,
            condition_num_latent=8,
            condition_type="conformer_perceiver",
            condition_module=ConditionModuleConfig(
                output_size=32, linear_units=64, attention_heads=4, num_blocks=1,
                input_layer="conv2d2", perceiver_mult=2,
            ),
        ),
        bigvgan=BigVGANConfig(
            gpt_dim=64,
            upsample_initial_channel=32,
            upsample_rates=(4, 2),
            upsample_kernel_sizes=(8, 4),
            resblock="1",
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            activation="snakebeta",
            snake_logscale=True,
            feat_upsample=True,
            cond_d_vector_in_each_upsampling_layer=True,
            num_mels=100,
            speaker_embedding_dim=32,
            sampling_rate=24000,
            discriminator_channel_mult=0.25,
            mpd_reshapes=(2, 3),
            resolutions=((128, 20, 80), (256, 40, 160), (64, 10, 40)),
        ),
        dvae=DVAEConfig(
            channels=80, num_tokens=32, codebook_dim=16, hidden_dim=16,
            num_resnet_blocks=1, kernel_size=3, num_layers=2,
            use_transposed_convs=False, activation="relu",
        ),
    )


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    cfg_path = str(d / "config.yaml")
    save_config(tiny_config(), cfg_path)
    return IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False, allow_random_init=True)


@pytest.fixture(scope="module")
def prompt_mel():
    rng = np.random.default_rng(0)
    return rng.standard_normal((1, 100, 60)).astype(np.float32)


class TestEngine:
    def test_infer_writes_wav(self, engine, prompt_mel, tmp_path):
        out = str(tmp_path / "out.wav")
        result = engine.infer(
            prompt_mel,
            "HELLO WORLD.",
            out,
            do_sample=False,
            num_beams=1,
            max_mel_tokens=12,
            repetition_penalty=1.0,
        )
        assert result == out
        assert os.path.exists(out)
        from indextts_tpu.utils.audio import read_wav

        wav, sr = read_wav(out)
        assert sr == 24000
        assert wav.shape[1] > 0
        # samples per code = 4 * prod(upsample_rates) = 32
        assert wav.shape[1] % 32 == 0

    def test_infer_returns_tuple_without_path(self, engine, prompt_mel):
        sr, wav = engine.infer(
            prompt_mel, "HELLO.", None, do_sample=False, num_beams=1, max_mel_tokens=8, repetition_penalty=1.0
        )
        assert sr == 24000
        assert wav.dtype == np.int16

    def test_full_capacity_sentence_bucket_clamp(self, engine, prompt_mel):
        """A sentence split to exactly max_text_tokens must decode: the
        8-token shape-bucket rounding (60 -> 64 here) used to overrun the
        text positional table (max_text_tokens+2 rows) and crash in
        prepare_gpt_inputs. The clamp trims bucket padding only."""
        cap = engine.cfg.gpt.max_text_tokens
        text = " ".join(["HELLO"] * (3 * cap))  # splitter hard-chunks at cap
        sr, wav = engine.infer(
            prompt_mel, text + ".", None, do_sample=False, num_beams=1,
            max_mel_tokens=6, repetition_penalty=1.0,
            max_text_tokens_per_sentence=cap,
        )
        assert sr == 24000

    def test_empty_text_raises_cleanly(self, engine, prompt_mel):
        """Empty text raises ValueError with a clear message instead of the
        bare np.concatenate error (the reference crashes on torch.cat,
        infer.py:215)."""
        with pytest.raises(ValueError, match="empty"):
            engine.infer(prompt_mel, "", None, do_sample=False, num_beams=1,
                         max_mel_tokens=6, repetition_penalty=1.0)
        with pytest.raises(ValueError, match="empty"):
            list(engine.infer_stream(prompt_mel, "", do_sample=False,
                                     max_mel_tokens=6, repetition_penalty=1.0))

    def test_unknown_generation_kwarg_raises(self, engine, prompt_mel):
        """A misspelled sampling knob must raise loudly, like HF generate()'s
        unused-model_kwargs check — silently running with defaults hands the
        user wrong-knob audio with no signal."""
        with pytest.raises(ValueError, match="unknown generation kwargs.*max_mel_token"):
            engine.infer(prompt_mel, "HELLO.", None, do_sample=False,
                         num_beams=1, max_mel_token=6)  # sic: missing 's'
        with pytest.raises(ValueError, match="unknown generation kwargs"):
            list(engine.infer_stream(prompt_mel, "HELLO.", do_sample=False,
                                     repetition_penality=5.0))  # sic

    def test_max_mel_tokens_clamped_to_capacity(self, engine, prompt_mel):
        """A max_mel_tokens request above the model's mel positional table
        (max_mel_tokens+2 rows) must be clamped, not crash the latent pass
        or silently decode with clamped position gathers."""
        with pytest.warns(RuntimeWarning, match="mel *capacity|clamping"):
            sr, wav = engine.infer(
                prompt_mel, "HELLO.", None, do_sample=False, num_beams=1,
                max_mel_tokens=600, repetition_penalty=1.0,
            )
        assert sr == 24000

    def test_infer_fast(self, engine, prompt_mel, tmp_path):
        out = str(tmp_path / "fast.wav")
        result = engine.infer_fast(
            prompt_mel,
            "HELLO WORLD. GOOD DAY. SEE YOU.",
            out,
            do_sample=False,
            num_beams=1,
            max_mel_tokens=8,
            repetition_penalty=1.0,
            max_text_tokens_per_sentence=12,
        )
        assert result == out
        assert os.path.exists(out)

    def test_progress_callback(self, engine, prompt_mel):
        calls = []
        engine.set_gr_progress_callback(lambda v, d: calls.append((v, d)))
        engine.infer(prompt_mel, "HI.", None, do_sample=False, num_beams=1, max_mel_tokens=6, repetition_penalty=1.0)
        engine.set_gr_progress_callback(None)
        assert len(calls) >= 2
        assert any("save audio" in d for _, d in calls)

    def test_audio_prompt_path(self, engine, tmp_path):
        from indextts_tpu.utils.audio import write_wav

        wav_path = str(tmp_path / "prompt.wav")
        t = np.linspace(0, 0.5, 12000, endpoint=False)
        write_wav(wav_path, (0.3 * np.sin(2 * np.pi * 220 * t) * 32767)[None, :], 24000)
        sr, wav = engine.infer(
            audio_prompt=wav_path, text="HI.", output_path=None,
            do_sample=False, num_beams=1, max_mel_tokens=6, repetition_penalty=1.0,
        )
        assert sr == 24000

    def test_remove_long_silence(self, engine):
        stop = engine.stop_mel_token
        row = np.asarray([[5] * 3 + [52] * 40 + [7] * 3 + [stop] + [stop] * 3], dtype=np.int32)
        out, lens = engine.remove_long_silence(row, silent_token=52, max_consecutive=30)
        assert int(lens[0]) == 3 + 10 + 3  # silence run shrunk to 10
        assert (out[0, : int(lens[0])] != stop).all()

    def test_remove_long_silence_no_change(self, engine):
        stop = engine.stop_mel_token
        row = np.asarray([[5, 6, 7, 52, 52, 8, stop, stop]], dtype=np.int32)
        out, lens = engine.remove_long_silence(row)
        assert int(lens[0]) == 6
        np.testing.assert_array_equal(out[0, :6], [5, 6, 7, 52, 52, 8])

    def test_bucket_sentences(self, engine):
        sents = [["a"] * n for n in (5, 3, 9, 1, 7, 2)]
        buckets = engine.bucket_sentences(sents, bucket_max_size=2)
        assert all(len(b) <= 2 for b in buckets)
        got = sorted(item["idx"] for b in buckets for item in b)
        assert got == list(range(6))

    def test_bucket_sentences_small_input(self, engine):
        sents = [["a"], ["b", "b"]]
        buckets = engine.bucket_sentences(sents, bucket_max_size=4)
        assert len(buckets) == 1 and len(buckets[0]) == 2

    def test_infer_with_beams(self, engine, prompt_mel):
        """Default reference sampling config uses num_beams=3 (infer.py:122)."""
        sr, wav = engine.infer(
            prompt_mel, "HI.", None, do_sample=False, num_beams=2, max_mel_tokens=8,
            repetition_penalty=1.0,
        )
        assert sr == 24000
        assert wav.shape[0] >= 0  # beam may legally finish immediately

    def test_infer_stream_entrypoint_exists(self, engine):
        assert hasattr(engine, "infer_stream")


def _graph_keys(eng):
    """Every jit-graph cache key on the engine (condval/melref entries are
    VALUE caches keyed by prompt digest, not compiled graphs — excluded)."""
    return (
        set(eng._decode_cache), set(eng._latent_cache),
        set(eng._vocoder_cache),
        {k for k in eng._cond_cache if k[0] not in ("condval", "melref")},
    )


class TestWarmup:
    """engine.warmup pre-compiles serving graphs: a follow-up request with
    the same static generation config, text bucket, and prompt frame bucket
    must add NO new jit cache keys (the server --warmup contract)."""

    KW = dict(do_sample=False, num_beams=1, max_mel_tokens=8,
              repetition_penalty=1.0)

    def _fresh_engine(self, tmp_path, **eng_kwargs):
        cfg_path = str(tmp_path / "config.yaml")
        save_config(tiny_config(), cfg_path)
        return IndexTTS(cfg_path=cfg_path, model_dir=str(tmp_path),
                        is_fp16=False, allow_random_init=True, **eng_kwargs)

    def test_solo_and_stream_covered(self, tmp_path):
        eng = self._fresh_engine(tmp_path)
        dt = eng.warmup(texts=("HI THERE.",), streaming=True,
                        verbose=False, **self.KW)
        assert dt > 0
        before = _graph_keys(eng)
        prompt = np.random.default_rng(7).standard_normal(
            (1, 100, 100)).astype(np.float32)  # same frame bucket as warmup
        eng.infer(prompt, "HI THERE.", None, **self.KW)
        for _ in eng.infer_stream(prompt, "HI THERE.",
                                  **{k: v for k, v in self.KW.items()
                                     if k != "num_beams"}):
            pass
        assert _graph_keys(eng) == before

    def test_slot_mode_covered(self, tmp_path):
        eng = self._fresh_engine(tmp_path)
        eng.warmup(texts=("HI THERE.",), n_slots=2, verbose=False, **self.KW)
        before = _graph_keys(eng)
        prompt = np.random.default_rng(8).standard_normal(
            (1, 100, 100)).astype(np.float32)
        eng.infer_slots([(prompt, "HI THERE.")], n_slots=2,
                        **{k: v for k, v in self.KW.items()
                           if k != "num_beams"})
        assert _graph_keys(eng) == before

    def test_slot_stream_burst_covered(self, tmp_path):
        """A warmed slot+streaming server's FIRST concurrent stream burst
        (n_slots streams at once) must add zero new jit keys: the interim
        window vocoder batches across active streams and pads sub-batches
        to powers of 2 — shapes a sequential warmup never compiles (the
        round-3 gap where each power-of-2 stream count paid ~70 s at
        flagship scale on first use, docs/SERVING.md)."""
        eng = self._fresh_engine(tmp_path, fast_latents=True)
        eng.warmup(texts=("HI THERE.",), n_slots=4, streaming=True,
                   verbose=False, **self.KW)
        before = _graph_keys(eng)
        prompt = np.random.default_rng(10).standard_normal(
            (1, 100, 100)).astype(np.float32)
        sess = eng.slot_session(
            n_slots=4, **{k: v for k, v in self.KW.items()
                          if k != "num_beams"})
        for _ in range(4):  # concurrent burst: all four stream at once
            sess.submit(prompt, "HI THERE.", on_chunk=lambda r, c: None)
        sess.drain()
        assert _graph_keys(eng) == before

    @pytest.mark.parametrize("batch", [2, 9], ids=["small", "over8"])
    def test_batch_mode_covered(self, tmp_path, batch):
        """batch=9 pins the serving-wave bucket contract: warmup must use
        the server's max(8, batch_requests) row bucket, not the infer_batch
        default of 8, or waves larger than 8 hit a cold decode graph."""
        eng = self._fresh_engine(tmp_path)
        eng.warmup(texts=("HI THERE.",), batch=batch, verbose=False, **self.KW)
        before = _graph_keys(eng)
        prompt = np.random.default_rng(9).standard_normal(
            (1, 100, 100)).astype(np.float32)
        eng.infer_batch([(prompt, "HI THERE.")] * batch,
                        sentences_bucket_max_size=max(8, batch), **self.KW)
        assert _graph_keys(eng) == before


class TestExtractFeatures:
    def test_memoized_by_path(self, engine):
        """A batch TSV reusing one voice featurizes it once — the second
        call returns the cached mel, not a recomputed one."""
        a = engine.extract_features("tests/sample_prompt.wav")
        b = engine.extract_features("tests/sample_prompt.wav")
        assert a is b
        assert a.shape[0] == 1 and a.shape[1] == 100

    def test_clear_error_on_non_audio(self, engine, tmp_path):
        from indextts_tpu.utils.audio import UnsupportedAudioFormat

        p = tmp_path / "not_audio.mp3"
        p.write_bytes(b"definitely not audio")
        with pytest.raises(UnsupportedAudioFormat):
            engine.extract_features(str(p))


class TestCompileCache:
    def test_compile_cache_dir_populated(self, tmp_path):
        """compile_cache_dir routes XLA executables into a persistent
        on-disk cache (the restart-speed half of the --warmup story)."""
        cache = tmp_path / "xla_cache"
        cfg_path = str(tmp_path / "config.yaml")
        save_config(tiny_config(), cfg_path)
        eng = IndexTTS(cfg_path=cfg_path, model_dir=str(tmp_path),
                       is_fp16=False, allow_random_init=True,
                       compile_cache_dir=str(cache))
        assert cache.is_dir()
        import jax

        # tiny-config graphs compile in < 1 s, under the persistent cache's
        # default min-compile-time threshold — lower it for this test only
        prev = jax.config.jax_persistent_cache_min_compile_time_secs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        try:
            prompt = np.random.default_rng(11).standard_normal(
                (1, 100, 100)).astype(np.float32)
            eng.infer(prompt, "HI THERE.", None, do_sample=False, num_beams=1,
                      max_mel_tokens=8, repetition_penalty=1.0)
        finally:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", prev)
        assert any(cache.iterdir()), "no cache entries written"


class TestRemoveLongSilence:
    """Direct case-table tests for remove_long_silence (reference semantics:
    infer.py:244-298). Key behaviors pinned: (a) the COMPACTION TRIGGER is the
    total silent-token COUNT over the pre-stop region exceeding
    max_consecutive (30), not the longest run; (b) once triggered, each run
    is capped at 10 kept silences; (c) rows are first trimmed at the first
    stop token; (d) multi-row output re-pads with stop_mel_token to the new
    max length. STOP=65, SILENT=52 in the tiny config."""

    STOP = 65
    SIL = 52

    def _codes(self, *rows):
        width = max(len(r) for r in rows)
        out = np.full((len(rows), width), self.STOP, np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out

    def test_run_of_exactly_30_untouched(self, engine):
        row = [7] + [self.SIL] * 30 + [9]
        codes, lens = engine.remove_long_silence(self._codes(row))
        assert lens[0] == 32
        assert codes[0, :32].tolist() == row

    def test_run_of_31_compacted_to_10(self, engine):
        row = [7] + [self.SIL] * 31 + [9]
        codes, lens = engine.remove_long_silence(self._codes(row))
        # 31-run -> 10 kept; total 1 + 10 + 1 = 12
        assert lens[0] == 12
        assert codes[0, :12].tolist() == [7] + [self.SIL] * 10 + [9]

    def test_scattered_silences_trigger_but_keep_short_runs(self, engine):
        # 31 isolated silences: count > 30 triggers compaction, but every
        # run is < 10 so nothing is removed (reference's count-based trigger)
        row = []
        for _ in range(31):
            row += [7, self.SIL]
        codes, lens = engine.remove_long_silence(self._codes(row))
        assert lens[0] == 62
        assert codes[0, :62].tolist() == row

    def test_trim_at_stop_token(self, engine):
        row = [7, 8, 9, self.STOP, 11, 12]
        codes, lens = engine.remove_long_silence(self._codes(row))
        assert lens[0] == 3
        assert codes.shape[1] == 3
        assert codes[0].tolist() == [7, 8, 9]

    def test_mixed_runs_capped_per_run(self, engine):
        # 15-run + 20-run = 35 > 30 triggers; each capped at 10
        row = [1] + [self.SIL] * 15 + [2] + [self.SIL] * 20 + [3]
        codes, lens = engine.remove_long_silence(self._codes(row))
        expect = [1] + [self.SIL] * 10 + [2] + [self.SIL] * 10 + [3]
        assert lens[0] == len(expect)
        assert codes[0, : len(expect)].tolist() == expect

    def test_multirow_padding_and_lens(self, engine):
        r0 = [7] + [self.SIL] * 31 + [9]          # compacts to 12
        r1 = [4, 5, 6, self.STOP]                  # trims to 3
        codes, lens = engine.remove_long_silence(self._codes(r0, r1))
        assert lens.tolist() == [12, 3]
        assert codes.shape == (2, 12)
        assert codes[0].tolist() == [7] + [self.SIL] * 10 + [9]
        # shorter row re-padded with stop tokens
        assert codes[1].tolist() == [4, 5, 6] + [self.STOP] * 9

    def test_no_stop_no_silence_passthrough(self, engine):
        row = [3, 4, 5, 6]
        codes, lens = engine.remove_long_silence(self._codes(row))
        assert lens[0] == 4
        assert codes[0].tolist() == row
