"""Full checkpoint-load integration: reference-format torch .pth state dicts
(synthesized at tiny scale by make_torch_ckpt) -> converter -> engine ->
synthesis. Exercises every converter mapping (GPT-2 stack, conformer,
perceiver, weight-normed BigVGAN, ECAPA) against the actual load path."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    # tests.* namespace imports: a bare `from test_engine import ...` under a
    # sys.path insert double-imports the module under two names (state and
    # monkeypatches in one are invisible in the other)
    from tests.make_torch_ckpt import write_checkpoints
    from tests.test_engine import tiny_config

    d = str(tmp_path_factory.mktemp("torch_ckpt"))
    write_checkpoints(tiny_config(), d)
    return d


def test_engine_loads_torch_checkpoints(ckpt_dir, tmp_path):
    from indextts_tpu.engine import IndexTTS

    engine = IndexTTS(cfg_path=os.path.join(ckpt_dir, "config.yaml"), model_dir=ckpt_dir, is_fp16=False)
    mel = np.random.default_rng(0).standard_normal((1, 100, 50)).astype(np.float32)
    out = str(tmp_path / "from_torch.wav")
    result = engine.infer(
        mel, "HELLO WORLD.", out, do_sample=False, num_beams=1, max_mel_tokens=8, repetition_penalty=1.0
    )
    assert result == out and os.path.exists(out)


def test_convert_shapes_match_random_init(ckpt_dir):
    """Every converted leaf must match the random-init tree's shape exactly
    (catches silent layout mismatches in the name mapping)."""
    import jax

    from indextts_tpu.convert import (
        convert_bigvgan,
        convert_unified_voice,
        load_torch_state_dict,
    )
    from indextts_tpu.models.bigvgan import init_bigvgan
    from indextts_tpu.models.gpt import init_unified_voice
    from tests.test_engine import tiny_config

    cfg = tiny_config()
    got_gpt = convert_unified_voice(load_torch_state_dict(os.path.join(ckpt_dir, "gpt.pth")), cfg.gpt)
    want_gpt = init_unified_voice(jax.random.PRNGKey(0), cfg.gpt)
    got_bv = convert_bigvgan(
        load_torch_state_dict(os.path.join(ckpt_dir, "bigvgan_generator.pth"), key="generator"), cfg.bigvgan
    )
    want_bv = init_bigvgan(jax.random.PRNGKey(0), cfg.bigvgan)

    def check(got, want, path=""):
        if isinstance(want, dict):
            assert set(got.keys()) == set(want.keys()), (path, set(got), set(want))
            for k in want:
                check(got[k], want[k], f"{path}/{k}")
        elif isinstance(want, (list, tuple)):
            assert len(got) == len(want), path
            for i, (g, w) in enumerate(zip(got, want)):
                check(g, w, f"{path}/{i}")
        else:
            assert tuple(np.shape(got)) == tuple(np.shape(want)), (path, np.shape(got), np.shape(want))

    check(got_gpt, want_gpt)
    check(got_bv, want_bv)


def test_empty_yaml_sections_use_defaults(tmp_path):
    """A present-but-empty section ("gpt:" with no body — the standard YAML
    use-defaults idiom) parses to None and must fall back to defaults, not
    crash from_dict with None.items()."""
    from indextts_tpu.config import IndexTTSConfig, load_config

    p = tmp_path / "c.yaml"
    p.write_text("gpt:\nbigvgan:\ndvae:\nengine:\ndataset:\n")
    cfg = load_config(str(p))
    default = IndexTTSConfig()
    assert cfg.gpt.model_dim == default.gpt.model_dim
    assert cfg.dataset == default.dataset
