"""Multi-chip engine: TP-sharded GPT over the virtual 8-device mesh must
reproduce the single-device greedy output exactly."""

import numpy as np
import pytest

import jax

from indextts_tpu.config import save_config
from indextts_tpu.engine import IndexTTS
from tests.test_engine import tiny_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_mesh")
    save_config(tiny_config(), str(d / "config.yaml"))
    return str(d)


def test_mesh_engine_matches_single_device(ckpt):
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 100, 60)).astype(np.float32)
    kwargs = dict(do_sample=False, num_beams=1, max_mel_tokens=10, repetition_penalty=1.0)

    single = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=False)
    sr1, wav1 = single.infer(mel, "HELLO WORLD.", None, **kwargs)

    meshed = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=True, tp=2)
    assert meshed.mesh is not None
    sr2, wav2 = meshed.infer(mel, "HELLO WORLD.", None, **kwargs)

    assert wav1.shape == wav2.shape
    # same greedy codes -> near-identical audio (collective reduction order
    # may differ at float precision)
    np.testing.assert_allclose(wav1.astype(np.float32), wav2.astype(np.float32), atol=2.0)


def test_mesh_engine_infer_fast(ckpt):
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 100, 60)).astype(np.float32)
    meshed = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=True, tp=2)
    sr, wav = meshed.infer_fast(
        mel, "HELLO WORLD. GOOD DAY.", None, do_sample=False, num_beams=1,
        max_mel_tokens=8, repetition_penalty=1.0, max_text_tokens_per_sentence=12,
    )
    assert sr == 24000 and wav.shape[0] > 0
