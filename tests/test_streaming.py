"""Streaming synthesis tests: chunked decode + vocode yields audio
incrementally and matches the non-streamed pipeline in the chunk interiors."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from indextts_tpu.config import save_config
    from indextts_tpu.engine import IndexTTS
    from tests.test_engine import tiny_config

    d = tmp_path_factory.mktemp("ckpt_stream")
    cfg_path = str(d / "config.yaml")
    save_config(tiny_config(), cfg_path)
    return IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False, allow_random_init=True)


@pytest.fixture(scope="module")
def prompt_mel():
    rng = np.random.default_rng(0)
    return rng.standard_normal((1, 100, 60)).astype(np.float32)


class TestStreaming:
    def test_yields_multiple_chunks(self, engine, prompt_mel):
        chunks = list(
            engine.infer_stream(
                prompt_mel,
                "HELLO WORLD HOW ARE YOU.",
                do_sample=False,
                max_mel_tokens=20,
                repetition_penalty=1.0,
                first_chunk_codes=4,
                chunk_codes=6,
                overlap_codes=2,
            )
        )
        assert len(chunks) >= 2
        total = np.concatenate(chunks)
        assert total.size > 0
        # samples per code = 4 * prod(rates) = 32 for the tiny config
        assert total.size % 32 == 0

    def test_full_capacity_sentence_bucket_clamp(self, engine, prompt_mel):
        """A cap-length sentence must stream: the 8-token bucket rounding
        used to overrun the text positional table (same contract as
        tests/test_engine.py::test_full_capacity_sentence_bucket_clamp)."""
        cap = engine.cfg.gpt.max_text_tokens
        text = " ".join(["HELLO"] * (2 * cap)) + "."
        chunks = list(
            engine.infer_stream(
                prompt_mel, text, do_sample=False, max_mel_tokens=6,
                repetition_penalty=1.0, first_chunk_codes=4, chunk_codes=6,
                max_text_tokens_per_sentence=cap,
            )
        )
        assert sum(c.size for c in chunks) >= 0  # reaching here is the test

    def test_first_chunk_wider_than_max_mel_tokens(self, engine, prompt_mel):
        """first_chunk_codes > max_mel_tokens must clamp to the codes buffer,
        not shape-error inside jit (default path) or emit zero-latent
        garbage audio past the generated codes (fast_latents path)."""
        kwargs = dict(do_sample=False, max_mel_tokens=6, repetition_penalty=1.0)
        chunks = list(
            engine.infer_stream(prompt_mel, "HELLO WORLD.",
                                first_chunk_codes=24, chunk_codes=6, **kwargs)
        )
        total = int(sum(c.size for c in chunks))
        sr, full = engine.infer(prompt_mel, "HELLO WORLD.", None, num_beams=1, **kwargs)
        assert total == full.shape[0]

    def test_tiny_max_mel_tokens_one(self, engine, prompt_mel):
        """max_mel_tokens=1: the prefill's single code IS the synthesis;
        the fused first chunk must take zero extra steps."""
        chunks = list(
            engine.infer_stream(prompt_mel, "HELLO.", do_sample=False,
                                max_mel_tokens=1, repetition_penalty=1.0)
        )
        assert sum(c.size for c in chunks) >= 0  # terminates without error

    def test_nonpositive_chunk_codes_terminates(self, engine, prompt_mel):
        """chunk_codes <= 0 used to make decode_steps a no-op and spin the
        emit loop forever; it must clamp to 1 and terminate."""
        chunks = list(
            engine.infer_stream(prompt_mel, "HELLO.", do_sample=False,
                                max_mel_tokens=6, repetition_penalty=1.0,
                                first_chunk_codes=2, chunk_codes=0)
        )
        assert sum(c.size for c in chunks) >= 0

    def test_streamed_token_count_matches_batch(self, engine, prompt_mel):
        """The streamed decode must emit the same greedy codes as the
        non-streaming path (identical sampling state machine)."""
        text = "HELLO WORLD."
        kwargs = dict(do_sample=False, max_mel_tokens=12, repetition_penalty=1.0)
        chunks = list(
            engine.infer_stream(
                prompt_mel, text, first_chunk_codes=3, chunk_codes=5, overlap_codes=2, **kwargs
            )
        )
        streamed = np.concatenate(chunks)
        sr, full = engine.infer(prompt_mel, text, None, num_beams=1, **kwargs)
        # infer() returns Gradio-format [samples, channels]
        assert streamed.size == full.shape[0]

    def test_interior_matches_full_pipeline(self, engine, prompt_mel):
        text = "HELLO WORLD."
        kwargs = dict(do_sample=False, max_mel_tokens=12, repetition_penalty=1.0)
        chunks = list(
            engine.infer_stream(
                prompt_mel, text, first_chunk_codes=4, chunk_codes=4, overlap_codes=3, **kwargs
            )
        )
        streamed = np.concatenate(chunks)
        sr, full = engine.infer(prompt_mel, text, None, num_beams=1, **kwargs)
        full_f = full.astype(np.float32)[:, 0]
        streamed_i = np.clip(streamed * 32767, -32767, 32767)
        # compare the first chunk region exactly (same latents, same vocode window)
        n = min(4 * 32, streamed_i.size, full_f.size)
        np.testing.assert_allclose(streamed_i[:n], full_f[:n], atol=3.0)
