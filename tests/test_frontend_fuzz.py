"""Property fuzz for the text normalizer (VERDICT r4 missing #1 mitigation).

The reference delegates ITN to WeTextProcessing's pynini FSTs
(ref front.py:100-111); no pynini exists in this image, so differential
fuzzing is impossible. These tests pin the next-strongest properties over
seeded random compositions of every supported surface form:

- the verbalizers never raise (the engine-level catch degrades to raw text,
  but a rule that throws is always a bug);
- no digits survive verbalization (the core ITN contract — every numeric
  surface form must come out spoken);
- output is non-empty for non-empty input.

Adversarial structure comes from random ADJACENCY: forms the rule authors
never wrote next to each other ("$5 million-60% 8:30 a.m.") exercise the
rule-ordering invariants the hand-written corpus cannot enumerate.
"""

import random
import re

import pytest

from indextts_tpu.utils.front import TextNormalizer

EN_FORMS = [
    "42", "3.14", "100,000", "1,234,567", "0.5", "007", "0042",
    "85%", "-2.5%", "50%-60%",
    "$5", "$5.99", "$1,990", "$5 million", "$1.5B", "$250K",
    "€19.99", "£3.50", "£0.01",
    "8:00", "8:30", "23:59", "3:59:58", "8:00-22:00",
    "2023-04-15", "4/15/2023", "July 4, 1776", "March 3", "the 1990s",
    "'80s", "1990-1995", "1800",
    "1/2", "3/4", "2/3", "5/8", "24/7",
    "1st", "2nd", "3rd", "21st", "102nd", "2nd-3rd",
    "+1 (212) 555-0123", "(800) 555-0199", "123-45-6789", "1-800-555-0199",
    "16.4.1", "10.0.0.1",
    "120km/h", "5kg", "16GB", "500MB/s", "3.5GHz", "65mph", "180lbs",
    "25°C", "-40°", "98.6°F",
    "5×3", "1+1=2", "-5", "18+", "#1", "4x4", "3x",
    "6'2\"", "8:30 a.m.", "9 p.m.",
    "john.doe@example.com", "www.example.com", "https://docs.example.org/a",
    "example.com", "No. 5", "Dr. Smith", "etc.", "vs.",
    "CosyVoice2", "pages 3-5",
]

EN_CARRIERS = [
    "the value is {} today", "{} was reported", "about {} or so",
    "it reached {}", "we saw {}, then stopped", "({})", "'{}'",
    "is it {}?", "wow {}!", "{}",
]

ZH_FORMS = [
    "42", "3.14", "100,000", "0.5", "2.5%", "-2.3%",
    "￥12999", "￥3.5万", "300元", "5角",
    "2025年1月2日", "3月5号", "周3", "星期日",
    "20:00", "8:00-22:00", "3:2",
    "-5℃", "25°C", "-5~3℃",
    "1/3", "第1名", "第2000名", "第3-5名",
    "13800138000", "6222021234567890123",
    "2万", "2个", "12个", "3000+", "5×3", "1+1=2",
    "3-5天", "￥300-￥500", "16.4.1", "京A12345",
    "3.2g", "120km/h", "100㎡",
]

ZH_CARRIERS = [
    "今天的数值是{}左右",
    "大约{}吧", "{}真的吗？",
    "达到了{}，然后停止",
    "（{}）", "{}",
    "他说{}就够了",
]


@pytest.fixture(scope="module")
def norm():
    n = TextNormalizer()
    n.load()
    return n


class TestNormalizerFuzz:
    def test_en_random_compositions(self, norm):
        rng = random.Random(0xC0FFEE)
        for i in range(300):
            n_forms = rng.randint(1, 4)
            parts = []
            for _ in range(n_forms):
                form = rng.choice(EN_FORMS)
                parts.append(rng.choice(EN_CARRIERS).format(form))
            text = (". " if rng.random() < 0.5 else " ").join(parts)
            out = norm._normalize_en(text)  # must not raise
            assert out.strip(), f"case {i}: empty output for {text!r}"
            assert re.search(r"\d", out) is None, (
                f"case {i}: digits survive: {text!r} -> {out!r}")

    def test_zh_random_compositions(self, norm):
        rng = random.Random(0xBEEF)
        for i in range(300):
            n_forms = rng.randint(1, 4)
            parts = []
            for _ in range(n_forms):
                form = rng.choice(ZH_FORMS)
                parts.append(rng.choice(ZH_CARRIERS).format(form))
            text = ("。" if rng.random() < 0.5 else "，").join(parts)
            out = norm._normalize_zh(text)  # must not raise
            assert out.strip(), f"case {i}: empty output for {text!r}"
            assert re.search(r"\d", out) is None, (
                f"case {i}: digits survive: {text!r} -> {out!r}")

    def test_full_normalize_mixed_router_never_raises(self, norm):
        """End-to-end normalize() (router + protection + rep maps) over
        mixed en/zh compositions — including forms dropped mid-sentence in
        the OTHER language's carrier, which is what real user text does."""
        rng = random.Random(0xF00D)
        for i in range(200):
            forms = EN_FORMS + ZH_FORMS
            carriers = EN_CARRIERS + ZH_CARRIERS
            text = " ".join(
                rng.choice(carriers).format(rng.choice(forms))
                for _ in range(rng.randint(1, 3)))
            out = norm.normalize(text)
            assert isinstance(out, str)
            assert out.strip(), f"case {i}: empty output for {text!r}"
