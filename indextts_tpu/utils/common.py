"""Shared host/JAX utilities.

Behavioral reference: indextts/utils/common.py (CJK pre/de-tokenization,
pad-mask construction, safe_log).
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

# CJK split ranges (reference: common.py:46-49)
_CJK_RANGE_PATTERN = (
    r"([\u1100-\u11ff\u2e80-\ua4cf\ua840-\uD7AF\uF900-\uFAFF"
    r"\uFE30-\uFE4F\uFF65-\uFFDC\U00020000-\U0002FFFF])"
)


def tokenize_by_CJK_char(line: str, do_upper_case: bool = True) -> str:
    """Insert spaces around CJK chars; upper-case Latin
    (reference behavior: common.py:29-51).

    "你好世界是 hello world 的中文" -> "你 好 世 界 是 HELLO WORLD 的 中 文"
    """
    chars = re.split(_CJK_RANGE_PATTERN, line.strip())
    return " ".join([w.strip().upper() if do_upper_case else w.strip() for w in chars if w.strip()])


def de_tokenized_by_CJK_char(line: str, do_lower_case: bool = False) -> str:
    """Inverse of tokenize_by_CJK_char (reference behavior: common.py:54-81):
    join CJK chars without spaces while keeping English word spacing."""
    english_word_pattern = re.compile(r"([A-Z]+(?:[\s-][A-Z-]+)*)", re.IGNORECASE)
    english_sents = english_word_pattern.findall(line)
    for i, sent in enumerate(english_sents):
        line = line.replace(sent, f"<sent_{i}>")

    words = line.split()
    sent_placeholder_pattern = re.compile(r"^.*?(<sent_(\d+)>)")
    for i in range(len(words)):
        m = sent_placeholder_pattern.match(words[i])
        if m:
            placeholder_index = int(m.group(2))
            words[i] = words[i].replace(m.group(1), english_sents[placeholder_index])
            if do_lower_case:
                words[i] = words[i].lower()
    return "".join(words)


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True where padded (reference behavior: common.py:84-107). Static max_len
    keeps shapes XLA-compilable (no data-dependent shapes)."""
    seq = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return seq >= lengths.astype(jnp.int32)[:, None]


def make_pad_mask_np(lengths: np.ndarray, max_len: int) -> np.ndarray:
    seq = np.arange(max_len, dtype=np.int64)[None, :]
    return seq >= np.asarray(lengths).astype(np.int64)[:, None]


def safe_log(x, clip_val: float = 1e-7):
    """log with clipping (reference behavior: common.py:110-121)."""
    if isinstance(x, np.ndarray):
        return np.log(np.clip(x, clip_val, None))
    return jnp.log(jnp.clip(x, clip_val, None))
