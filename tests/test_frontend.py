"""Frontend tests: normalizer cases (reference behavior: front.py:431-536
__main__ cases), tokenizer round-trips, and sentence-split invariants."""

import numpy as np
import pytest

from indextts_tpu.utils.common import de_tokenized_by_CJK_char, tokenize_by_CJK_char
from indextts_tpu.utils.front import TextNormalizer, TextTokenizer
from indextts_tpu.utils.spm import (
    SentencePieceProcessor,
    build_vocab_from_pieces,
    parse_model_proto,
    serialize_model_proto,
)


@pytest.fixture(scope="module")
def normalizer():
    n = TextNormalizer()
    n.load()
    return n


class TestNormalizer:
    def test_zh_routing(self, normalizer):
        assert normalizer.use_chinese("我爱你！")
        assert normalizer.use_chinese("晕XUAN4是一种GAN3觉")  # pinyin forces zh
        assert not normalizer.use_chinese("I love you!")
        assert normalizer.use_chinese("123")  # no alpha -> zh

    @pytest.mark.parametrize(
        "text,expected",
        [
            ("2.5平方电线", "二点五平方电线"),
            ("共465篇，约315万字", "共四百六十五篇,约三百一十五万字"),
            ("2002年的第一场雪，下在了2003年", "二零零二年的第一场雪,下在了二零零三年"),
            ("速度是10km/h", "速度是每小时十千米"),
            ("1键3连", "一键三连"),
            ("这是1024元的手机，你要吗？", "这是一千零二十四元的手机,你要吗?"),
            ("他这条视频点赞3000+，评论1000+，收藏500+", "他这条视频点赞三千多,评论一千多,收藏五百多"),
            ("电话：135-4567-8900", "电话,幺三五四五六七八九零零"),
        ],
    )
    def test_zh_cases(self, normalizer, text, expected):
        assert normalizer.normalize(text) == expected

    def test_zh_datetime(self, normalizer):
        out = normalizer.normalize("现在是北京时间2025年01月11日 20:00")
        assert "二零二五年一月十一日" in out
        assert "二十点" in out

    def test_pinyin_tone_protection(self, normalizer):
        out = normalizer.normalize("晕XUAN4是一种GAN3觉")
        # jqx rule: xu -> xv (reference: front.py:144-155); tones preserved
        assert "XVAN4" in out and "GAN3" in out
        out2 = normalizer.normalize("受不liao3你了")
        assert "liao3" in out2

    def test_pinyin_not_matching_english(self, normalizer):
        import re

        for bad in ["beta1", "better1", "voice2", "bala2", "babala2", "hunger2"]:
            assert re.match(TextNormalizer.PINYIN_TONE_PATTERN, bad, re.IGNORECASE) is None, bad

    def test_name_protection(self, normalizer):
        out = normalizer.normalize("克里斯托弗·诺兰执导了2010年的电影")
        assert "克里斯托弗-诺兰" in out
        assert "二零一零年" in out

    def test_english_contractions(self, normalizer):
        assert normalizer.normalize("where's the money?") == "where is the money?"
        assert normalizer.normalize("who's there?") == "who is there?"
        out = normalizer.normalize("今天是个好日子 it's a good day")
        assert "it is a good day" in out

    def test_en_cases(self, normalizer):
        assert normalizer.normalize("Couting down 3, 2, 1, go!") == "Couting down three, two, one, go!"
        out = normalizer.normalize("This sales for 2.5% off, only $12.5.")
        assert "two point five percent" in out
        assert "twelve point five dollars" in out
        assert "o'clock" in normalizer.normalize("See you at 8:00 AM")

    def test_punct_rep_map(self, normalizer):
        out = normalizer.normalize("“我爱你”的英语是“I love you”")
        assert "“" not in out and "”" not in out


class TestCJK:
    def test_round_trip(self):
        s = tokenize_by_CJK_char("你好世界是 hello world 的中文")
        assert s == "你 好 世 界 是 HELLO WORLD 的 中 文"
        assert de_tokenized_by_CJK_char(s, do_lower_case=True) == "你好世界是hello world的中文"


def _demo_sp():
    vocab = build_vocab_from_pieces(
        [
            ("▁H", -1.0), ("▁HE", -1.5), ("LL", -2.0), ("LLO", -2.5), ("▁HELLO", -3.0),
            ("▁W", -1.2), ("OR", -1.8), ("ORL", -2.2), ("ORLD", -2.8), ("▁WORLD", -3.2),
            ("H", -10.0), ("E", -10.0), ("L", -10.0), ("O", -10.0), ("W", -10.0),
            ("R", -10.0), ("D", -10.0), ("▁", -9.0),
            (".", -8.0), ("▁.", -8.0), ("!", -8.0), ("?", -8.0), (",", -8.0), ("-", -8.0),
            ("你", -7.0), ("好", -7.0), ("▁你", -7.0), ("▁好", -7.0),
        ],
        model_type=2,
    )
    return SentencePieceProcessor(vocab=vocab)


class TestSPM:
    def test_bpe_merge_order(self):
        sp = _demo_sp()
        assert sp.EncodeAsPieces("HELLO WORLD") == ["▁HELLO", "▁WORLD"]

    def test_proto_round_trip(self):
        sp = _demo_sp()
        blob = serialize_model_proto(sp.v)
        sp2 = SentencePieceProcessor(vocab=parse_model_proto(blob))
        assert sp2.v.pieces == sp.v.pieces
        assert np.allclose(sp2.v.scores, sp.v.scores)
        assert sp2.EncodeAsPieces("HELLO WORLD") == ["▁HELLO", "▁WORLD"]

    def test_decode(self):
        sp = _demo_sp()
        ids = sp.EncodeAsIds("HELLO WORLD")
        assert sp.Decode(ids) == "HELLO WORLD"

    def test_unk(self):
        sp = _demo_sp()
        ids = sp.EncodeAsIds("HELLO Z")
        assert sp.unk_id() in ids

    def test_unigram_viterbi(self):
        vocab = build_vocab_from_pieces(
            [("▁AB", -1.0), ("C", -1.0), ("▁A", -1.0), ("BC", -1.5), ("A", -5.0), ("B", -5.0), ("▁", -5.0)],
            model_type=1,
        )
        sp = SentencePieceProcessor(vocab=vocab)
        # best path: ▁AB + C (-2.0) beats ▁A + BC (-2.5)
        assert sp.EncodeAsPieces("ABC") == ["▁AB", "C"]


class TestTokenizer:
    def test_tokenize_pipeline(self, normalizer):
        tok = TextTokenizer(sp_model=_demo_sp(), normalizer=normalizer)
        pieces = tok.tokenize("hello world!")
        assert pieces == ["▁HELLO", "▁WORLD", "!"]
        ids = tok.convert_tokens_to_ids(pieces)
        assert tok.convert_ids_to_tokens(ids) == pieces
        assert tok.decode(ids, do_lower_case=True) == "hello world!"

    def test_special_ids(self, normalizer):
        tok = TextTokenizer(sp_model=_demo_sp(), normalizer=normalizer)
        assert tok.bos_token_id == 0
        assert tok.eos_token_id == 1
        assert tok.unk_token_id == 2

    def test_split_sentences_basic(self):
        tok_list = ["▁A", "b", "▁.", "▁C", "d", "!", "▁E", "?"]
        out = TextTokenizer.split_sentences_by_token(tok_list, [".", "!", "?", "▁.", "▁?", "▁..."], 120)
        assert out == [["▁A", "b", "▁.", "▁C", "d", "!", "▁E", "?"]] or len(out) >= 1
        # short sentences get merged back up to max
        out2 = TextTokenizer.split_sentences_by_token(tok_list, [".", "!", "?", "▁.", "▁?", "▁..."], 3)
        assert all(len(s) <= 3 for s in out2)
        assert [t for s in out2 for t in s] == tok_list  # nothing lost

    def test_split_long_with_comma_fallback(self):
        toks = ["w"] * 10 + [","] + ["x"] * 10
        out = TextTokenizer.split_sentences_by_token(toks, ["."], 15)
        assert all(len(s) <= 15 for s in out)
        assert [t for s in out for t in s] == toks

    def test_hard_chunking(self):
        toks = ["w"] * 50
        with pytest.warns(RuntimeWarning):
            out = TextTokenizer.split_sentences_by_token(toks, ["."], 16)
        assert all(len(s) <= 16 for s in out)
        assert sum(len(s) for s in out) == 50

    def test_no_split_before_quote(self):
        # a sentence mark followed by a quote should not split (front.py:367)
        toks = ["▁A", "b", ".", "'", "▁C", "."]
        out = TextTokenizer.split_sentences_by_token(toks, ["."], 120)
        assert out == [["▁A", "b", ".", "'", "▁C", "."]]
