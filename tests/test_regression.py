"""Data-driven regression cases (the reference ships tests/cases.jsonl with
no runner, regression_test.py:4-42 runs a hard-coded list with no asserts;
this suite actually consumes the case file and asserts output invariants)."""

import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def load_cases():
    with open(os.path.join(HERE, "cases.jsonl"), "r", encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from indextts_tpu.config import save_config
    from indextts_tpu.engine import IndexTTS
    from tests.test_engine import tiny_config

    d = tmp_path_factory.mktemp("ckpt_regression")
    cfg_path = str(d / "config.yaml")
    save_config(tiny_config(), cfg_path)
    return IndexTTS(cfg_path=cfg_path, model_dir=str(d), is_fp16=False, allow_random_init=True)


@pytest.fixture(scope="module")
def prompt_mel(engine):
    return engine.extract_features(os.path.join(HERE, "sample_prompt.wav"))


CASES = load_cases()


@pytest.mark.parametrize("case", CASES, ids=lambda c: c["text"][:16])
def test_case_synthesizes(engine, prompt_mel, case, tmp_path):
    out = str(tmp_path / "case.wav")
    infer = engine.infer_fast if case["infer_mode"] == 1 else engine.infer
    result = infer(
        prompt_mel,
        case["text"],
        out,
        do_sample=False,
        num_beams=1,
        max_mel_tokens=8,
        repetition_penalty=1.0,
        max_text_tokens_per_sentence=24,
    )
    assert result == out and os.path.exists(out)
    from indextts_tpu.utils.audio import read_wav

    wav, sr = read_wav(out)
    assert sr == 24000 and wav.shape[1] > 0
    assert np.abs(wav.astype(np.float32)).max() <= 32767


def test_cases_cover_both_modes():
    modes = {c["infer_mode"] for c in CASES}
    assert modes == {0, 1}


def test_cases_cover_zh_en_pinyin():
    import re

    texts = " ".join(c["text"] for c in CASES)
    assert re.search(r"[一-鿥]", texts)  # Chinese
    assert re.search(r"[a-zA-Z]{4,}", texts)  # English
    assert re.search(r"[A-Z]+[1-5]", texts)  # pinyin tone control
