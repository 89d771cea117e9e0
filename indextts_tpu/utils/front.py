# -*- coding: utf-8 -*-
"""Text frontend: normalization, BPE tokenization, sentence splitting.

Public surface mirrors the reference frontend (indextts/utils/front.py):
`TextNormalizer` (zh/en routing, pinyin-tone protection, Chinese-name
protection, English contractions, punctuation replacement maps) and
`TextTokenizer` (SentencePiece BPE with CJK-char pre-tokenization, sentence
split/merge with punctuation / comma / dash fallbacks and hard chunking).

The reference's WeTextProcessing pynini FSTs (front.py:100-111) are replaced by
the rule-based verbalizer in zh_num.py plus the regex passes below — same
routing and protection semantics, self-contained implementation.
"""

from __future__ import annotations

import os
import re
import warnings
from typing import List, Union

from indextts_tpu.utils.common import de_tokenized_by_CJK_char, tokenize_by_CJK_char
from indextts_tpu.utils.spm import SentencePieceProcessor
from indextts_tpu.utils import zh_num


class TextNormalizer:
    """zh/en text normalizer (behavioral reference: front.py:11-228)."""

    def __init__(self):
        self.loaded = False
        self.char_rep_map = {
            "：": ",",
            "；": ",",
            ";": ",",
            "，": ",",
            "。": ".",
            "！": "!",
            "？": "?",
            "\n": " ",
            "·": "-",
            "、": ",",
            "...": "…",
            ",,,": "…",
            "，，，": "…",
            "……": "…",
            "“": "'",
            "”": "'",
            '"': "'",
            "‘": "'",
            "’": "'",
            "（": "'",
            "）": "'",
            "(": "'",
            ")": "'",
            "《": "'",
            "》": "'",
            "【": "'",
            "】": "'",
            "[": "'",
            "]": "'",
            "—": "-",
            "～": "-",
            "~": "-",
            "「": "'",
            "」": "'",
            ":": ",",
        }
        self.zh_char_rep_map = {"$": ".", **self.char_rep_map}

    # pinyin-with-tone pattern (reference: front.py:62)
    PINYIN_TONE_PATTERN = (
        r"(?<![a-z])((?:[bpmfdtnlgkhjqxzcsryw]|[zcs]h)?"
        r"(?:[aeiouüv]|[ae]i|u[aio]|ao|ou|i[aue]|[uüv]e|[uvü]ang?|uai|"
        r"[aeiuv]n|[aeio]ng|ia[no]|i[ao]ng)|ng|er)([1-5])"
    )
    # Chinese full names joined by ·/-/— (reference: front.py:68)
    NAME_PATTERN = r"[一-鿿]+(?:[-·—][一-鿿]+){1,2}"
    # common English contractions expanded to "is" (reference: front.py:75)
    ENGLISH_CONTRACTION_PATTERN = r"(what|where|who|which|how|t?here|it|s?he|that|this)'s"

    def match_email(self, email: str) -> bool:
        return re.match(r"^[a-zA-Z0-9]+@[a-zA-Z0-9]+\.[a-zA-Z]+$", email) is not None

    def use_chinese(self, s: str) -> bool:
        has_chinese = bool(re.search(r"[一-鿿]", s))
        has_alpha = bool(re.search(r"[a-zA-Z]", s))
        is_email = self.match_email(s)
        if has_chinese or not has_alpha or is_email:
            return True
        return bool(re.search(self.PINYIN_TONE_PATTERN, s, re.IGNORECASE))

    def load(self):
        self.loaded = True

    # -- pinyin / name protection -----------------------------------------
    def correct_pinyin(self, pinyin: str) -> str:
        """jqx + u/ü finals -> v (reference: front.py:144-155)."""
        if pinyin[0] not in "jqxJQX":
            return pinyin
        pattern = r"([jqx])[uü](n|e|an)*(\d)"
        pinyin = re.sub(pattern, r"\g<1>v\g<2>\g<3>", pinyin, flags=re.IGNORECASE)
        return pinyin.upper()

    def save_pinyin_tones(self, original_text):
        origin_pinyin_pattern = re.compile(self.PINYIN_TONE_PATTERN, re.IGNORECASE)
        original_pinyin_list = re.findall(origin_pinyin_pattern, original_text)
        if len(original_pinyin_list) == 0:
            return original_text, None
        original_pinyin_list = list(set("".join(p) for p in original_pinyin_list))
        transformed_text = original_text
        for i, pinyin in enumerate(original_pinyin_list):
            number = chr(ord("a") + i)
            transformed_text = transformed_text.replace(pinyin, f"<pinyin_{number}>")
        return transformed_text, original_pinyin_list

    def restore_pinyin_tones(self, normalized_text, original_pinyin_list):
        if not original_pinyin_list:
            return normalized_text
        transformed_text = normalized_text
        for i, pinyin in enumerate(original_pinyin_list):
            number = chr(ord("a") + i)
            pinyin = self.correct_pinyin(pinyin)
            transformed_text = transformed_text.replace(f"<pinyin_{number}>", pinyin)
        return transformed_text

    def save_names(self, original_text):
        name_pattern = re.compile(self.NAME_PATTERN, re.IGNORECASE)
        original_name_list = re.findall(name_pattern, original_text)
        if len(original_name_list) == 0:
            return original_text, None
        original_name_list = list(set("".join(n) for n in original_name_list))
        transformed_text = original_text
        for i, name in enumerate(original_name_list):
            number = chr(ord("a") + i)
            transformed_text = transformed_text.replace(name, f"<n_{number}>")
        return transformed_text, original_name_list

    def restore_names(self, normalized_text, original_name_list):
        if not original_name_list:
            return normalized_text
        transformed_text = normalized_text
        for i, name in enumerate(original_name_list):
            number = chr(ord("a") + i)
            transformed_text = transformed_text.replace(f"<n_{number}>", name)
        return transformed_text

    # -- verbalization passes ----------------------------------------------
    def _normalize_zh(self, text: str) -> str:
        """Chinese ITN: numbers/dates/times/money/percent -> hanzi readings."""
        t = text
        # dates: 2025年01月11日 / 2025/1/2 / 2025-01-11 (only full dates)
        t = re.sub(
            r"(\d{2,4})\s*[年/-]\s*(\d{1,2})\s*[月/-]\s*(\d{1,2})\s*[日号]?",
            lambda m: zh_num.zh_digits(m.group(1))
            + "年"
            + zh_num.zh_integer(m.group(2))
            + "月"
            + zh_num.zh_integer(m.group(3))
            + "日",
            t,
        )
        # years: 2002年
        t = re.sub(r"(\d{3,4})年", lambda m: zh_num.zh_digits(m.group(1)) + "年", t)
        # clock times: 20:00 / 8:30 / 08:00:30
        def _time(m):
            h, mm, ss = m.group(1), m.group(2), m.group(3)
            out = zh_num.zh_integer(h) + "点"
            if mm and int(mm) > 0:
                out += zh_num.zh_integer(mm) + "分"
            if ss and int(ss) > 0:
                out += zh_num.zh_integer(ss) + "秒"
            return out

        t = re.sub(r"(\d{1,2}):(\d{2})(?::(\d{2}))?", _time, t)
        # phone numbers: 135-4567-8900 -> digit-by-digit with 幺
        t = re.sub(
            r"\d{3,4}-\d{3,4}-\d{3,4}",
            lambda m: zh_num.zh_digits(m.group(0).replace("-", ""), tel=True),
            t,
        )
        # temperatures: -5°C -> 零下五摄氏度, 37.5℃ -> 三十七点五摄氏度
        t = re.sub(
            r"(-?)(\d+(?:\.\d+)?)\s*(?:°C|℃)",
            lambda m: ("零下" if m.group(1) else "") + zh_num.zh_number(m.group(2)) + "摄氏度",
            t,
        )
        t = re.sub(
            r"(-?)(\d+(?:\.\d+)?)\s*(?:°F|℉)",
            lambda m: ("零下" if m.group(1) else "") + zh_num.zh_number(m.group(2)) + "华氏度",
            t,
        )
        # percentages: 2.5% -> 百分之二点五
        t = re.sub(
            r"(\d+(?:\.\d+)?)\s*%",
            lambda m: "百分之" + zh_num.zh_number(m.group(1)),
            t,
        )
        # ordinals: 第3 -> 第三 (第 always selects 二, never 两)
        t = re.sub(r"第(\d+)", lambda m: "第" + zh_num.zh_integer(m.group(1)).replace("两", "二"), t)
        # money: ¥12999 / ￥12999 / $12.5
        t = re.sub(
            r"[¥￥]\s*(\d+(?:\.\d+)?)",
            lambda m: zh_num.zh_number(m.group(1)) + "元",
            t,
        )
        t = re.sub(
            r"\$\s*(\d+(?:\.\d+)?)",
            lambda m: zh_num.zh_number(m.group(1)) + "美元",
            t,
        )
        # trailing plus: 3000+ -> 三千多
        t = re.sub(r"(\d+(?:\.\d+)?)\+", lambda m: zh_num.zh_number(m.group(1)) + "多", t)
        # units: 10km/h -> 每小时十千米
        unit_map = {"km": "千米", "m": "米", "cm": "厘米", "mm": "毫米", "kg": "千克", "g": "克"}
        t = re.sub(
            r"(\d+(?:\.\d+)?)\s*(km|cm|mm|kg|m|g)/h",
            lambda m: "每小时" + zh_num.zh_number(m.group(1)) + unit_map[m.group(2).lower()],
            t,
            flags=re.IGNORECASE,
        )
        # standalone measures: 3.2g -> 三点二克. Lowercase only — uppercase
        # letter suffixes are product/tech names (5G网络, iPhone 2X) that the
        # reference's FSTs leave as letters.
        t = re.sub(
            r"(\d+(?:\.\d+)?)\s*(km|cm|mm|kg|g|m)(?![A-Za-z/])",
            lambda m: zh_num.zh_number(m.group(1)) + unit_map[m.group(2)],
            t,
        )
        # fractions: 1/3 -> 三分之一 (dates and rate units consumed above)
        t = re.sub(
            r"(\d+)/(\d+)",
            lambda m: zh_num.zh_integer(m.group(2)) + "分之" + zh_num.zh_integer(m.group(1)),
            t,
        )
        # ranges: 3-5 / 3~5 -> 三到五 (phones and full dates consumed above)
        t = re.sub(
            r"(\d+(?:\.\d+)?)\s*[-~～]\s*(\d+(?:\.\d+)?)",
            lambda m: zh_num.zh_number(m.group(1)) + "到" + zh_num.zh_number(m.group(2)),
            t,
        )
        # negative numbers: -5 -> 负五 (ranges consumed above)
        t = re.sub(
            r"(?<![\dA-Za-z])-(\d+(?:\.\d+)?)",
            lambda m: "负" + zh_num.zh_number(m.group(1)),
            t,
        )
        # long digit identifiers (8+ digits) read digit-by-digit with 幺
        t = re.sub(r"\d{8,}", lambda m: zh_num.zh_digits(m.group(0), tel=True), t)
        # standalone 2 directly before a hanzi scale word reads 两 (2万 -> 两万)
        t = re.sub(r"(?<![\d.])2(?=[万亿千])", "两", t)
        # remaining numbers -> standard reading
        t = re.sub(r"\d+(?:\.\d+)?", lambda m: zh_num.zh_number(m.group(0)), t)
        return t

    def _normalize_en(self, text: str) -> str:
        """English ITN: numbers/times/money/percent -> words."""
        t = text
        # clock times: 8:00 AM -> eight AM / 8:30 -> eight thirty
        def _time(m):
            h, mm = int(m.group(1)), m.group(2)
            out = zh_num.en_integer(h)
            if int(mm) == 0:
                out += " o'clock"
            elif int(mm) < 10:
                out += " oh " + zh_num.en_integer(int(mm))
            else:
                out += " " + zh_num.en_integer(int(mm))
            return out

        t = re.sub(r"(\d{1,2}):(\d{2})", _time, t)
        # version/model suffixes: CosyVoice2 -> CosyVoice 2 (read as a word +
        # a number, the reference FSTs' behavior per front.py:470 comments);
        # letter->digit direction only so ordinals (1st) stay intact
        t = re.sub(r"([A-Za-z])(\d)", r"\1 \2", t)
        # percent
        t = re.sub(
            r"(\d+(?:\.\d+)?)\s*%",
            lambda m: zh_num.en_number(m.group(1)) + " percent",
            t,
        )
        # money with explicit cents: $12.50 -> twelve dollars and fifty cents
        def _dollars_cents(m):
            d, c = int(m.group(1)), int(m.group(2))
            cents = zh_num.en_integer(c) + (" cent" if c == 1 else " cents")
            if d == 0:
                return cents
            dollars = zh_num.en_integer(d) + (" dollar" if d == 1 else " dollars")
            return f"{dollars} and {cents}"

        t = re.sub(r"\$\s*(\d+)\.(\d{2})(?!\d)", _dollars_cents, t)

        # money
        def _dollars(m):
            num = m.group(1)
            word = zh_num.en_number(num)
            unit = "dollar" if num in ("1", "1.0") else "dollars"
            return f"{word} {unit}"

        t = re.sub(r"\$\s*(\d+(?:\.\d+)?)", _dollars, t)
        # temperatures: 25°C -> twenty five degrees Celsius
        t = re.sub(
            r"(-?)(\d+(?:\.\d+)?)\s*(?:°C|℃)",
            lambda m: ("minus " if m.group(1) else "") + zh_num.en_number(m.group(2)) + " degrees Celsius",
            t,
        )
        t = re.sub(
            r"(-?)(\d+(?:\.\d+)?)\s*(?:°F|℉)",
            lambda m: ("minus " if m.group(1) else "") + zh_num.en_number(m.group(2)) + " degrees Fahrenheit",
            t,
        )
        # years (4-digit standalone, 1500-2099)
        t = re.sub(
            r"\b(1[5-9]\d{2}|20\d{2})\b",
            lambda m: zh_num.en_year(int(m.group(1))),
            t,
        )
        # ordinals 1st/2nd/3rd/4th...
        ord_map = {
            "one": "first", "two": "second", "three": "third", "five": "fifth",
            "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
        }

        def _ordinal(m):
            # ordinalize the last word: 21 -> twenty first, 40 -> fortieth
            words = zh_num.en_integer(int(m.group(1))).split(" ")
            last = words[-1]
            if last in ord_map:
                words[-1] = ord_map[last]
            elif last.endswith("y"):
                words[-1] = last[:-1] + "ieth"
            else:
                words[-1] = last + "th"
            return " ".join(words)

        t = re.sub(r"\b(\d+)(?:st|nd|rd|th)\b", _ordinal, t)
        # ranges: pages 3-5 -> three to five
        t = re.sub(
            r"(\d+(?:\.\d+)?)\s*[-~]\s*(\d+(?:\.\d+)?)",
            lambda m: zh_num.en_number(m.group(1)) + " to " + zh_num.en_number(m.group(2)),
            t,
        )
        # negatives: -5 -> minus five (ranges consumed above)
        t = re.sub(
            r"(?<![\dA-Za-z])-(\d+(?:\.\d+)?)",
            lambda m: "minus " + zh_num.en_number(m.group(1)),
            t,
        )
        # remaining numbers
        t = re.sub(r"\d+(?:\.\d+)?", lambda m: zh_num.en_number(m.group(0)), t)
        return t

    def normalize(self, text: str) -> str:
        if not self.loaded:
            print("Error, text normalizer is not initialized !!!")
            return ""
        if self.use_chinese(text):
            text = re.sub(self.ENGLISH_CONTRACTION_PATTERN, r"\1 is", text, flags=re.IGNORECASE)
            replaced_text, pinyin_list = self.save_pinyin_tones(text.rstrip())
            replaced_text, original_name_list = self.save_names(replaced_text)
            result = self._normalize_zh(replaced_text)
            result = self.restore_names(result, original_name_list)
            result = self.restore_pinyin_tones(result, pinyin_list)
            pattern = re.compile("|".join(re.escape(p) for p in self.zh_char_rep_map.keys()))
            result = pattern.sub(lambda x: self.zh_char_rep_map[x.group()], result)
        else:
            text = re.sub(self.ENGLISH_CONTRACTION_PATTERN, r"\1 is", text, flags=re.IGNORECASE)
            result = self._normalize_en(text)
            pattern = re.compile("|".join(re.escape(p) for p in self.char_rep_map.keys()))
            result = pattern.sub(lambda x: self.char_rep_map[x.group()], result)
        return result


class TextTokenizer:
    """SentencePiece BPE tokenizer with CJK pre-tokenization and sentence
    splitting (behavioral reference: front.py:231-428)."""

    def __init__(self, vocab_file: str = None, normalizer: TextNormalizer = None, sp_model=None):
        self.vocab_file = vocab_file
        self.normalizer = normalizer
        if sp_model is not None:
            self.sp_model = sp_model
        else:
            if self.vocab_file is None:
                raise ValueError("vocab_file is None")
            if not os.path.exists(self.vocab_file):
                raise ValueError(f"vocab_file {self.vocab_file} does not exist")
            self.sp_model = SentencePieceProcessor(model_file=self.vocab_file)
        if self.normalizer:
            self.normalizer.load()
        self.pre_tokenizers = [tokenize_by_CJK_char]

    @property
    def vocab_size(self):
        return self.sp_model.GetPieceSize()

    @property
    def unk_token(self):
        return "<unk>"

    @property
    def pad_token(self):
        return None

    @property
    def bos_token(self):
        return "<s>"

    @property
    def eos_token(self):
        return "</s>"

    @property
    def pad_token_id(self):
        return -1

    @property
    def bos_token_id(self):
        return 0

    @property
    def eos_token_id(self):
        return 1

    @property
    def unk_token_id(self):
        return self.sp_model.unk_id()

    @property
    def special_tokens_map(self):
        return {
            "unk_token": self.unk_token,
            "pad_token": self.pad_token,
            "bos_token": self.bos_token,
            "eos_token": self.eos_token,
        }

    def get_vocab(self):
        return {self.convert_ids_to_tokens(i): i for i in range(self.vocab_size)}

    def convert_ids_to_tokens(self, ids: Union[List[int], int]):
        return self.sp_model.IdToPiece(ids)

    def convert_tokens_to_ids(self, tokens: Union[List[str], str]) -> List[int]:
        if isinstance(tokens, str):
            tokens = [tokens]
        return [self.sp_model.PieceToId(token) for token in tokens]

    def tokenize(self, text: str) -> List[str]:
        return self.encode(text, out_type=str)

    def encode(self, text: str, **kwargs):
        if len(text) == 0:
            return []
        if len(text.strip()) == 1:
            return self.sp_model.Encode(text, out_type=kwargs.pop("out_type", int), **kwargs)
        if self.normalizer:
            text = self.normalizer.normalize(text)
        for pre_tokenizer in self.pre_tokenizers:
            text = pre_tokenizer(text)
        return self.sp_model.Encode(text, out_type=kwargs.pop("out_type", int), **kwargs)

    def batch_encode(self, texts: List[str], **kwargs):
        if self.normalizer:
            texts = [self.normalizer.normalize(text) for text in texts]
        for pre_tokenizer in self.pre_tokenizers:
            texts = [pre_tokenizer(text) for text in texts]
        return self.sp_model.Encode(texts, out_type=kwargs.pop("out_type", int), **kwargs)

    def decode(self, ids: Union[List[int], int], do_lower_case=False, **kwargs):
        if isinstance(ids, int):
            ids = [ids]
        decoded = self.sp_model.Decode(ids, out_type=kwargs.pop("out_type", str), **kwargs)
        return de_tokenized_by_CJK_char(decoded, do_lower_case=do_lower_case)

    punctuation_marks_tokens = [".", "!", "?", "▁.", "▁?", "▁..."]

    @staticmethod
    def split_sentences_by_token(
        tokenized_str: List[str], split_tokens: List[str], max_tokens_per_sentence: int
    ) -> List[List[str]]:
        """Split a token stream into sentences at `split_tokens`, falling back
        to comma/dash splits then hard chunking, then re-merging short
        sentences (behavioral reference: front.py:348-423)."""
        if not tokenized_str:
            return []
        sentences = []
        current_sentence = []
        current_len = 0
        i = 0
        while i < len(tokenized_str):
            token = tokenized_str[i]
            current_sentence.append(token)
            current_len += 1
            should_split = (
                token in split_tokens
                and current_len > 2
                and not (i + 1 < len(tokenized_str) and tokenized_str[i + 1] in {"'", "▁'"})
            )
            if current_len <= max_tokens_per_sentence and should_split:
                sentences.append(current_sentence)
                current_sentence = []
                current_len = 0
                i += 1
                continue
            if current_len > max_tokens_per_sentence:
                split_by = []
                if not any(t in split_tokens for t in [",", "▁,"]) and any(
                    t in current_sentence for t in [",", "▁,"]
                ):
                    split_by = [",", "▁,"]
                elif "-" not in split_tokens and "-" in current_sentence:
                    split_by = ["-"]
                if split_by:
                    sub_sentences = TextTokenizer.split_sentences_by_token(
                        current_sentence, split_by, max_tokens_per_sentence
                    )
                else:
                    sub_sentences = [
                        current_sentence[j : j + max_tokens_per_sentence]
                        for j in range(0, len(current_sentence), max_tokens_per_sentence)
                    ]
                    warnings.warn(
                        f"[WARNING] Sentence token length exceeds max ({max_tokens_per_sentence}): {current_sentence}",
                        RuntimeWarning,
                    )
                sentences.extend(sub_sentences)
                current_sentence = []
                current_len = 0
            i += 1
        if current_sentence:
            assert current_len <= max_tokens_per_sentence
            sentences.append(current_sentence)
        return TextTokenizer._merge_short_sentences(sentences, max_tokens_per_sentence)

    @staticmethod
    def _merge_short_sentences(sentences: List[List[str]], max_len: int) -> List[List[str]]:
        if not sentences:
            return []
        merged = [sentences[0]]
        for sentence in sentences[1:]:
            if len(merged[-1]) + len(sentence) <= max_len:
                merged[-1].extend(sentence)
            else:
                merged.append(sentence)
        return merged

    def split_sentences(self, tokenized: List[str], max_tokens_per_sentence=120) -> List[List[str]]:
        return TextTokenizer.split_sentences_by_token(
            tokenized, self.punctuation_marks_tokens, max_tokens_per_sentence
        )
