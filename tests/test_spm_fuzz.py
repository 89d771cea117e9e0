"""Tokenizer equivalence hardening (round-1 VERDICT gap #5).

The real sentencepiece library and the published bpe.model are absent from
this image, so utils/spm.py is cross-checked three independent ways:

  1. Unigram-Viterbi vs a brute-force oracle that enumerates EVERY
     segmentation of short strings and scores it (exhaustive ground truth),
     fuzzed over random vocabularies, with and without byte-fallback and
     user-defined pieces.
  2. The C++ BPE merge engine (native/bpe.cpp) vs the pure-Python merge loop
     — two independent implementations of the greedy best-score merge
     (reference semantics: sentencepiece BPE as loaded at front.py:243).
  3. Golden pinyin-range fixtures mirroring the reference's vocabulary
     contract: a contiguous id range of pinyin-toned pieces, every one
     matching TextNormalizer.PINYIN_TONE_PATTERN (front.py:497-516 checks
     ids 8474-10201 of the published model this way).
"""

import itertools
import random
import re

import pytest

from indextts_tpu.utils.front import TextNormalizer
from indextts_tpu.utils.spm import (
    NORMAL,
    USER_DEFINED,
    SentencePieceProcessor,
    SentencePieceVocab,
    build_vocab_from_pieces,
    parse_model_proto,
    serialize_model_proto,
)


def _segmentations(text):
    """All ways to split text into contiguous non-empty pieces."""
    n = len(text)
    for cuts in itertools.product([0, 1], repeat=n - 1):
        out, start = [], 0
        for i, c in enumerate(cuts, start=1):
            if c:
                out.append(text[start:i])
                start = i
        out.append(text[start:])
        yield out


def _brute_force_unigram(proc, text):
    """Exhaustive max-score segmentation with the same unk scoring rule
    sentencepiece uses (unk = min_score - 10 per character)."""
    v = proc.v
    get = v.piece_to_id_map.get
    min_score = min(v.scores)
    unk_score = min_score - 10.0
    best_score, best_seg = float("-inf"), None

    def piece_score(p):
        idx = get(p)
        if idx is not None and v.types[idx] in (NORMAL, USER_DEFINED):
            return v.scores[idx]
        if len(p) == 1:
            return unk_score  # single-char unknown fallback
        return None

    for seg in _segmentations(text):
        total = 0.0
        ok = True
        for p in seg:
            s = piece_score(p)
            if s is None:
                ok = False
                break
            total += s
        if ok and total > best_score:
            best_score, best_seg = total, seg
    return best_seg, best_score


def _score_of(proc, pieces):
    v = proc.v
    min_score = min(v.scores)
    unk_score = min_score - 10.0
    unk_piece = v.pieces[v.unk_id]
    total = 0.0
    for p in pieces:
        idx = v.piece_to_id_map.get(p)
        if idx is not None and v.types[idx] in (NORMAL, USER_DEFINED):
            total += v.scores[idx]
        else:
            # one resolved <unk> (or raw unknown char) = one unk penalty
            total += unk_score * (1 if p == unk_piece else max(1, len(p)))
    return total


def _random_unigram_vocab(rng, alphabet="abcd", byte_fallback=False, user_defined=()):
    pieces, seen = [], set()
    # all single chars (so every string is segmentable) + random multigrams
    for ch in alphabet:
        pieces.append((ch, rng.uniform(-8, -1)))
        seen.add(ch)
    for _ in range(rng.randint(5, 14)):
        ln = rng.randint(2, 4)
        p = "".join(rng.choice(alphabet) for _ in range(ln))
        if p not in seen:
            seen.add(p)
            pieces.append((p, rng.uniform(-8, -1)))
    vocab = build_vocab_from_pieces(pieces, model_type=1, add_dummy_prefix=False)
    vocab.byte_fallback = byte_fallback
    for ud in user_defined:
        vocab.pieces.append(ud)
        vocab.scores.append(0.0)
        vocab.types.append(USER_DEFINED)
    if byte_fallback:
        for b in range(256):
            vocab.pieces.append(f"<0x{b:02X}>")
            vocab.scores.append(0.0)
            vocab.types.append(6)  # BYTE
    vocab.piece_to_id_map = {p: i for i, p in enumerate(vocab.pieces)}
    return vocab


class TestUnigramBruteForce:
    @pytest.mark.parametrize("seed", range(12))
    def test_viterbi_matches_exhaustive(self, seed):
        rng = random.Random(seed)
        vocab = _random_unigram_vocab(rng)
        proc = SentencePieceProcessor(vocab=vocab, use_native=False)
        for _ in range(25):
            n = rng.randint(1, 9)
            text = "".join(rng.choice("abcd") for _ in range(n))
            got = proc._encode_unigram(text)
            _, want_score = _brute_force_unigram(proc, text)
            # the argmax segmentation may tie; scores must match exactly
            assert _score_of(proc, got) == pytest.approx(want_score), (
                f"{text!r}: viterbi {got} vs exhaustive score {want_score}"
            )

    @pytest.mark.parametrize("seed", range(6))
    def test_viterbi_with_unknown_chars(self, seed):
        rng = random.Random(100 + seed)
        vocab = _random_unigram_vocab(rng)
        proc = SentencePieceProcessor(vocab=vocab, use_native=False)
        for _ in range(15):
            n = rng.randint(1, 7)
            # 'z' is out-of-alphabet -> unk fallback path
            text = "".join(rng.choice("abcz") for _ in range(n))
            got = proc._encode_unigram(text)
            _, want_score = _brute_force_unigram(proc, text)
            assert _score_of(proc, got) == pytest.approx(want_score), text

    def test_user_defined_pieces_atomic(self):
        rng = random.Random(7)
        vocab = _random_unigram_vocab(rng, user_defined=("<laugh>",))
        proc = SentencePieceProcessor(vocab=vocab, use_native=False)
        pieces = proc.EncodeAsPieces("ab<laugh>cd")
        assert "<laugh>" in pieces
        # never split into characters
        assert "<" not in pieces and ">" not in pieces

    def test_byte_fallback_unknowns(self):
        rng = random.Random(8)
        vocab = _random_unigram_vocab(rng, byte_fallback=True)
        proc = SentencePieceProcessor(vocab=vocab, use_native=False)
        pieces = proc.EncodeAsPieces("a€b")  # € is 3 UTF-8 bytes
        assert "<0xE2>" in pieces and "<0x82>" in pieces and "<0xAC>" in pieces
        # decode restores the original text through the byte pieces
        assert proc.DecodePieces(pieces) == "a€b"


class TestNativeVsPythonBPE:
    """The C++ merge engine and the Python loop are independent
    implementations of greedy best-score BPE; fuzz them against each other."""

    @pytest.mark.parametrize("seed", range(8))
    def test_encode_agreement(self, seed):
        rng = random.Random(200 + seed)
        alphabet = "abcde"
        pieces, seen = [], set()
        for ch in alphabet + "▁":
            pieces.append((ch, rng.uniform(-10, -1)))
            seen.add(ch)
        for _ in range(rng.randint(8, 20)):
            ln = rng.randint(2, 4)
            p = "".join(rng.choice(alphabet) for _ in range(ln))
            if p not in seen:
                seen.add(p)
                pieces.append((p, rng.uniform(-10, -1)))
        vocab = build_vocab_from_pieces(pieces, model_type=2)
        py = SentencePieceProcessor(vocab=vocab, use_native=False)
        nat = SentencePieceProcessor(vocab=vocab, use_native=True)
        if nat._native is None:
            pytest.skip("native engine unavailable")
        for _ in range(30):
            n = rng.randint(1, 12)
            text = "".join(rng.choice(alphabet + " ") for _ in range(n)).strip()
            if not text:
                continue
            assert nat.EncodeAsIds(text) == py.EncodeAsIds(text), text

    def test_proto_round_trip_preserves_encoding(self):
        rng = random.Random(300)
        pieces = [(ch, -float(i + 1)) for i, ch in enumerate("abcdef▁")]
        pieces += [("ab", -0.5), ("cd", -0.7), ("abcd", -0.2), ("ef", -0.9)]
        vocab = build_vocab_from_pieces(pieces, model_type=2)
        blob = serialize_model_proto(vocab)
        vocab2 = parse_model_proto(blob)
        p1 = SentencePieceProcessor(vocab=vocab, use_native=False)
        p2 = SentencePieceProcessor(vocab=vocab2, use_native=False)
        for _ in range(20):
            text = "".join(rng.choice("abcdef ") for _ in range(rng.randint(1, 10))).strip()
            assert p1.EncodeAsIds(text) == p2.EncodeAsIds(text), text


# all standard pinyin initial+final combinations the reference pattern accepts
_PINYIN_SYLLABLES = [
    "ba", "bai", "ban", "bang", "bao", "bei", "ben", "bi", "bian", "biao",
    "can", "cao", "ce", "cen", "ceng", "cha", "chan", "chang", "chao", "che",
    "chi", "chong", "chou", "chu", "chuan", "chui", "chun", "ci", "cong",
    "da", "dai", "dan", "dang", "dao", "de", "deng", "di", "dian", "diao",
    "er", "fa", "fan", "fang", "fei", "fen", "feng", "fo", "fu", "ga",
    "gan", "gang", "gao", "ge", "gen", "geng", "gong", "gou", "gu", "guan",
    "ha", "han", "hao", "he", "hen", "heng", "hong", "hou", "hu", "huan",
    "ji", "jia", "jian", "jiang", "jiao", "jie", "jin", "jing", "jiu", "ju",
    "ka", "kan", "kang", "kao", "ke", "ken", "kong", "kou", "ku", "kuan",
    "la", "lai", "lan", "lang", "lao", "le", "lei", "li", "lian", "liao",
    "ma", "mai", "man", "mang", "mao", "me", "mei", "men", "mi", "mian",
    "na", "nai", "nan", "nang", "nao", "ne", "nen", "ng", "ni", "nian",
    "pa", "pai", "pan", "pang", "pao", "pei", "pen", "pi", "pian", "piao",
    "qi", "qia", "qian", "qiang", "qiao", "qie", "qin", "qing", "qiu", "qu",
    "ran", "rang", "rao", "re", "ren", "reng", "ri", "rong", "rou", "ru",
    "sa", "san", "sang", "sao", "se", "sen", "seng", "sha", "shan", "shang",
    "shi", "shou", "shu", "shuan", "shui", "shun", "si", "song", "sou", "su",
    "ta", "tan", "tang", "tao", "te", "teng", "ti", "tian", "tiao", "tie",
    "wa", "wan", "wang", "wei", "wen", "weng", "wo", "wu", "xi", "xia",
    "xian", "xiang", "xiao", "xie", "xin", "xing", "xiu", "xu", "xuan",
    "ya", "yan", "yang", "yao", "ye", "yi", "yin", "ying", "yong", "you",
    "za", "zai", "zan", "zang", "zao", "ze", "zei", "zen", "zeng", "zha",
    "zhan", "zhang", "zhao", "zhe", "zhi", "zhong", "zhou", "zhu", "zhuan",
]


class TestPinyinGoldenRange:
    """Mirror of the reference's vocabulary contract check: the published
    bpe.model reserves a contiguous id range (8474-10201) of pinyin-toned
    pieces, each matching PINYIN_TONE_PATTERN (front.py:497-516). Build a
    golden fixture with the same structure and assert the invariants."""

    @pytest.fixture(scope="class")
    def pinyin_proc(self):
        base = [(ch, -float(i + 1)) for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz▁.0123456789")]
        # BPE merges adjacent pairs, so a multi-char piece is only reachable
        # through its prefixes — the published model contains them; the
        # fixture mirrors that (prefixes sit BELOW the golden range)
        prefixes = sorted({syl[:k] for syl in _PINYIN_SYLLABLES for k in range(2, len(syl) + 1)})
        pinyin_pieces = [f"{syl}{tone}" for syl in _PINYIN_SYLLABLES for tone in range(1, 6)]
        pieces = base + [(p, -80.0) for p in prefixes] + [(p, -50.0) for p in pinyin_pieces]
        vocab = build_vocab_from_pieces(pieces, model_type=2)
        proc = SentencePieceProcessor(vocab=vocab, use_native=False)
        start = 3 + len(base) + len(prefixes)  # specials + chars + prefixes
        return proc, start, start + len(pinyin_pieces)

    def test_every_range_piece_matches_pattern(self, pinyin_proc):
        proc, start, end = pinyin_proc
        pat = re.compile(TextNormalizer.PINYIN_TONE_PATTERN, re.IGNORECASE)
        for pid in range(start, end):
            piece = proc.IdToPiece(pid)
            assert pat.match(piece), f"id {pid}: {piece!r} must match the pinyin pattern"

    def test_round_trip_ids(self, pinyin_proc):
        proc, start, end = pinyin_proc
        for pid in range(start, end, 37):
            piece = proc.IdToPiece(pid)
            assert proc.PieceToId(piece) == pid

    def test_toned_pinyin_encodes_to_single_piece(self, pinyin_proc):
        proc, start, end = pinyin_proc
        for syl in ("xuan4", "gan3", "zhong4", "liao3"):
            pieces = proc.EncodeAsPieces(syl)
            # the toned syllable must survive as one in-range piece
            joined = [p for p in pieces if re.fullmatch(r"[a-z]+[1-5]", p)]
            assert joined == [syl], f"{syl}: {pieces}"

    def test_badcases_not_in_pattern(self):
        pat = re.compile(TextNormalizer.PINYIN_TONE_PATTERN, re.IGNORECASE)
        for bad in ("beta1", "better1", "voice2", "bala2", "babala2", "hunger2"):
            assert pat.match(bad) is None, bad
