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


def test_mesh_dp_batched_decode_matches_single(ckpt):
    """VERDICT round-2 #8: DP-sharded batched decode — batch 8 split over the
    data axis through generate_speech must reproduce the unsharded output."""
    from indextts_tpu.models.gpt_decode import GenerationConfig

    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 100, 60)).astype(np.float32)
    tokens = rng.integers(2, 40, (8, 9)).astype(np.int32)
    lengths = np.asarray([9, 7, 9, 5, 9, 9, 6, 9], np.int32)
    gen = GenerationConfig(do_sample=False, num_beams=1, max_new_tokens=10)

    single = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=False)
    meshed = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=True, tp=2)
    assert meshed.mesh is not None and meshed.mesh.shape["data"] == 4

    conds_s = single._conds_for(mel)
    conds_m = meshed._conds_for(mel)
    codes_s, lens_s, _ = single._gpt_generate(conds_s, tokens, lengths, gen, 1.0, 0.8, 1.0)
    codes_m, lens_m, _ = meshed._gpt_generate(conds_m, tokens, lengths, gen, 1.0, 0.8, 1.0)
    np.testing.assert_array_equal(lens_s, lens_m)
    np.testing.assert_array_equal(codes_s, codes_m)


def test_mesh_dp_batched_vocoder(ckpt):
    """Replicated-vocoder DP: batch rows data-sharded through bigvgan_apply
    equal the unsharded waveforms (mesh.vocoder_sharding design)."""
    import jax.numpy as jnp

    from indextts_tpu.models.bigvgan import bigvgan_apply
    from indextts_tpu.parallel.mesh import make_mesh, shard_batch, vocoder_sharding

    meshed = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=True, tp=2)
    h = meshed.cfg.bigvgan
    rng = np.random.default_rng(3)
    latent = rng.standard_normal((8, 16, h.gpt_dim)).astype(np.float32)
    mel_ref = rng.standard_normal((8, 50, h.num_mels)).astype(np.float32)

    base = np.asarray(bigvgan_apply(meshed.bigvgan_params, h, jnp.asarray(latent), jnp.asarray(mel_ref)))
    lat_s, mel_s = shard_batch(meshed.mesh, (jnp.asarray(latent), jnp.asarray(mel_ref)))
    out = np.asarray(bigvgan_apply(meshed.bigvgan_params, h, lat_s, mel_s))
    np.testing.assert_allclose(out, base, atol=1e-5)


def test_mesh_dp_non_divisible_batch_matches_single(ckpt):
    """Continuous-batching buckets have arbitrary sizes; a batch of 5 on a
    data=4 mesh must pad to the axis multiple (not fall back to replicated)
    and still reproduce the unsharded output exactly."""
    from indextts_tpu.models.gpt_decode import GenerationConfig

    rng = np.random.default_rng(7)
    mel = rng.standard_normal((1, 100, 60)).astype(np.float32)
    tokens = rng.integers(2, 40, (5, 9)).astype(np.int32)
    lengths = np.asarray([9, 7, 9, 5, 8], np.int32)
    gen = GenerationConfig(do_sample=False, num_beams=1, max_new_tokens=10)

    single = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=False)
    meshed = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=True, tp=2)
    conds_s = single._conds_for(mel)
    conds_m = meshed._conds_for(mel)
    codes_s, lens_s, _ = single._gpt_generate(conds_s, tokens, lengths, gen, 1.0, 0.8, 1.0)
    codes_m, lens_m, _ = meshed._gpt_generate(conds_m, tokens, lengths, gen, 1.0, 0.8, 1.0)
    assert codes_m.shape[0] == 5 and lens_m.shape[0] == 5
    np.testing.assert_array_equal(lens_s, lens_m)
    np.testing.assert_array_equal(codes_s, codes_m)


def test_mesh_dp_quant_beam_matches_single(ckpt):
    """DP mesh + int8 KV cache + beam search together: the three features
    compose (sharded rows, quantized caches, lineage attention) and must
    reproduce the unsharded quantized output exactly (both paths quantize
    identically; greedy beam selection is deterministic)."""
    from indextts_tpu.models.gpt_decode import GenerationConfig

    rng = np.random.default_rng(11)
    mel = rng.standard_normal((1, 100, 60)).astype(np.float32)
    tokens = rng.integers(2, 40, (4, 9)).astype(np.int32)
    lengths = np.asarray([9, 7, 8, 6], np.int32)
    gen = GenerationConfig(do_sample=False, num_beams=2, max_new_tokens=8)

    single = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=False, quant_kv=True)
    meshed = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=True, tp=2, quant_kv=True)
    conds_s = single._conds_for(mel)
    conds_m = meshed._conds_for(mel)
    codes_s, lens_s, _ = single._gpt_generate(conds_s, tokens, lengths, gen, 1.0, 0.8, 1.0)
    codes_m, lens_m, _ = meshed._gpt_generate(conds_m, tokens, lengths, gen, 1.0, 0.8, 1.0)
    np.testing.assert_array_equal(lens_s, lens_m)
    np.testing.assert_array_equal(codes_s, codes_m)


def test_mesh_slot_mode_matches_solo(ckpt):
    """Rolling-admission slot decoding on a TP-sharded engine: the jitted
    slot graphs (prefill/admit/steps) inherit the params' mesh shardings,
    so continuous batching composes with tensor parallelism — greedy slot
    output must equal the same engine's solo infer per request."""
    rng = np.random.default_rng(12)
    mel = rng.standard_normal((1, 100, 60)).astype(np.float32)
    kw = dict(do_sample=False, num_beams=1, max_mel_tokens=10, repetition_penalty=1.0)
    meshed = IndexTTS(cfg_path=f"{ckpt}/config.yaml", model_dir=ckpt, is_fp16=False,
                      allow_random_init=True, use_mesh=True, tp=2)
    out = meshed.infer_slots([(mel, "HELLO WORLD."), (mel, "GOOD DAY.")],
                             n_slots=2, **kw)
    solo = [meshed.infer(mel, "HELLO WORLD.", None, **kw),
            meshed.infer(mel, "GOOD DAY.", None, **kw)]
    for (sr_s, wav_s), (sr_o, wav_o) in zip(solo, out):
        assert sr_s == sr_o == 24000
        assert wav_s.shape == wav_o.shape
        np.testing.assert_allclose(
            wav_s.astype(np.float32), wav_o.astype(np.float32), atol=2.0
        )
