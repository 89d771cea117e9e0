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

    def test_unigram_skips_native(self):
        vocab = _vocab()
        vocab.model_type = 1
        sp = SentencePieceProcessor(vocab=vocab, use_native=True)
        assert sp._native is None
