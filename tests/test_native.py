"""Native C++ BPE engine: build, load, and exact parity with the Python
merge loop (including tie-breaking and unknown handling)."""

import numpy as np
import pytest

from indextts_tpu.native import load_native_lib
from indextts_tpu.utils.spm import SentencePieceProcessor, build_vocab_from_pieces


def _vocab():
    return build_vocab_from_pieces(
        [
            ("▁H", -1.0), ("▁HE", -1.5), ("LL", -2.0), ("LLO", -2.5), ("▁HELLO", -3.0),
            ("▁W", -1.2), ("OR", -1.8), ("ORL", -2.2), ("ORLD", -2.8), ("▁WORLD", -3.2),
            ("H", -10.0), ("E", -10.0), ("L", -10.0), ("O", -10.0), ("W", -10.0),
            ("R", -10.0), ("D", -10.0), ("▁", -9.0), (".", -8.0),
            ("你", -7.0), ("好", -7.0), ("你好", -6.5), ("▁你", -6.8),
        ],
        model_type=2,
    )


@pytest.fixture(scope="module")
def lib():
    lib = load_native_lib()
    if lib is None:
        pytest.skip("g++ toolchain unavailable")
    return lib


class TestNativeBPE:
    def test_builds_and_loads(self, lib):
        assert lib is not None

    @pytest.mark.parametrize(
        "text",
        [
            "HELLO WORLD",
            "HELLO WORLD.",
            "你好 HELLO",
            "HELLO Z UNKNOWN",
            "",
            "H",
            "▁ mixed ▁",
        ],
    )
    def test_matches_python_exactly(self, lib, text):
        vocab = _vocab()
        sp_native = SentencePieceProcessor(vocab=vocab, use_native=True)
        sp_python = SentencePieceProcessor(vocab=vocab, use_native=False)
        assert sp_native._native is not None
        assert sp_native.EncodeAsIds(text) == sp_python.EncodeAsIds(text), text

    def test_long_text_parity(self, lib):
        vocab = _vocab()
        sp_native = SentencePieceProcessor(vocab=vocab, use_native=True)
        sp_python = SentencePieceProcessor(vocab=vocab, use_native=False)
        rng = np.random.default_rng(0)
        words = ["HELLO", "WORLD", "你好", "HELD", "LOW"]
        text = " ".join(rng.choice(words) for _ in range(300))
        assert sp_native.EncodeAsIds(text) == sp_python.EncodeAsIds(text)

    def test_concurrent_encode_no_corruption(self, lib):
        """encode() shares a per-instance output buffer; concurrent callers
        (the server is threaded) must get their OWN ids back, not another
        thread's (the buffer is lock-guarded)."""
        import threading

        vocab = _vocab()
        sp = SentencePieceProcessor(vocab=vocab, use_native=True)
        assert sp._native is not None
        texts = ["HELLO WORLD", "你好 HELLO", "HELD LOW HELLO", "H"] * 8
        expected = {t: sp.EncodeAsIds(t) for t in set(texts)}
        errors = []

        def worker(t):
            for _ in range(50):
                if sp.EncodeAsIds(t) != expected[t]:
                    errors.append(t)
                    return

        threads = [threading.Thread(target=worker, args=(t,)) for t in texts]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, f"corrupted encodes for {set(errors)}"

    def test_unigram_skips_native(self):
        vocab = _vocab()
        vocab.model_type = 1
        sp = SentencePieceProcessor(vocab=vocab, use_native=True)
        assert sp._native is None

    def test_pieces_parity(self, lib):
        """EncodeAsPieces rides the native engine when available; surfaces
        must match the pure-Python merge exactly."""
        vocab = _vocab()
        sp_native = SentencePieceProcessor(vocab=vocab, use_native=True)
        sp_python = SentencePieceProcessor(vocab=vocab, use_native=False)
        for text in ("HELLO WORLD.", "你好 HELLO Z", ""):
            assert sp_native.EncodeAsPieces(text) == sp_python.EncodeAsPieces(text), text

    def test_output_buffer_growth(self, lib):
        """Truncation is detected (snprintf-style total count) and retried —
        the tail of a very long text must never be silently dropped."""
        vocab = _vocab()
        sp = SentencePieceProcessor(vocab=vocab, use_native=True)
        assert sp._native is not None
        sp._native._out = (__import__("ctypes").c_int32 * 4)()  # tiny buffer
        ids = sp.EncodeAsIds("HELLO WORLD HELLO WORLD HELLO WORLD")
        assert len(ids) > 4  # grew past the 4-slot buffer, nothing dropped
        sp2 = SentencePieceProcessor(vocab=vocab, use_native=False)
        assert ids == sp2.EncodeAsIds("HELLO WORLD HELLO WORLD HELLO WORLD")


class TestPieceTypeSemantics:
    """Real sentencepiece never matches CONTROL/UNKNOWN/UNUSED/BYTE pieces
    against raw text: literal '<s>' in input must NOT produce the bos id."""

    def _vocab_with_reachable_control(self):
        # '<', 's', '>', '<s' are NORMAL so the merge chain toward the
        # CONTROL piece '<s>' is reachable if types are ignored
        return build_vocab_from_pieces(
            [("<", -5.0), ("s", -5.0), (">", -5.0), ("<s", -1.0),
             ("▁", -9.0), ("A", -6.0)],
            model_type=2,
        )

    def test_control_surface_not_assembled_bpe(self):
        vocab = self._vocab_with_reachable_control()
        for use_native in (True, False):
            sp = SentencePieceProcessor(vocab=vocab, use_native=use_native)
            ids = sp.EncodeAsIds("<s> A")
            assert 0 not in ids and 1 not in ids, (use_native, ids)

    def test_control_surface_not_matched_unigram(self):
        vocab = self._vocab_with_reachable_control()
        vocab.model_type = 1
        sp = SentencePieceProcessor(vocab=vocab, use_native=False)
        ids = sp.EncodeAsIds("<s> A")
        assert 0 not in ids and 1 not in ids, ids


class TestDecodeAPI:
    def test_decode_numpy_inputs(self):
        """engine code rows are np.int32 — Decode must accept arrays and
        numpy scalars, not crash on array truthiness."""
        sp = SentencePieceProcessor(vocab=_vocab(), use_native=False)
        ids = sp.EncodeAsIds("HELLO WORLD")
        assert sp.Decode(np.asarray(ids, np.int32)) == sp.Decode(ids)
        assert sp.Decode([np.int64(i) for i in ids]) == sp.Decode(ids)
        # batch of arrays
        assert sp.Decode(np.asarray([ids, ids], np.int32)) == [sp.Decode(ids)] * 2

    def test_decode_strips_exactly_one_dummy_prefix_space(self):
        """lstrip(' ') would also eat a legitimate leading-whitespace piece;
        only the single dummy-prefix space goes (sentencepiece contract)."""
        sp = SentencePieceProcessor(vocab=_vocab(), use_native=False)
        # '▁' + '▁HELLO' decodes to ' HELLO': one frame space stripped, the
        # content-bearing second space kept
        assert sp.DecodePieces(["▁", "▁HELLO"]) == " HELLO"

    def test_unsupported_kwargs_raise(self):
        sp = SentencePieceProcessor(vocab=_vocab(), use_native=False)
        with pytest.raises(TypeError, match="add_bos"):
            sp.Encode("HELLO", add_bos=True)
        with pytest.raises(TypeError, match="unsupported"):
            sp.Decode([3], reverse=True)
