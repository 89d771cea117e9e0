"""Legacy conditioning paths, input_tokens prefixes, num_return_sequences,
typical sampling through the decode stack."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.models.gpt import get_conditioning, init_unified_voice
from indextts_tpu.models.gpt_decode import GenerationConfig, generate_speech, inference_speech

rng_np = np.random.default_rng(21)


def cfg_with(condition_type):
    return GPTConfig(
        layers=2,
        model_dim=64,
        heads=4,
        max_text_tokens=30,
        max_mel_tokens=48,
        number_text_tokens=50,
        number_mel_codes=66,
        start_mel_token=64,
        stop_mel_token=65,
        condition_num_latent=8,
        condition_type=condition_type,
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=64, attention_heads=4, num_blocks=1, input_layer="conv2d2", perceiver_mult=2
        ),
    )


class TestLegacyConditioning:
    def test_perceiver_path(self):
        cfg = cfg_with("perceiver")
        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(rng_np.standard_normal((2, 30, 100)).astype(np.float32))
        conds = get_conditioning(params, cfg, mel, jnp.asarray([30, 30]))
        assert conds.shape == (2, cfg.condition_num_latent, cfg.model_dim)
        assert np.isfinite(np.asarray(conds)).all()

    def test_default_mean_path(self):
        cfg = cfg_with("default")
        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(rng_np.standard_normal((2, 30, 100)).astype(np.float32))
        conds = get_conditioning(params, cfg, mel, jnp.asarray([30, 30]))
        assert conds.shape == (2, 1, cfg.model_dim)

    def test_gst_unsupported_like_reference(self):
        cfg = cfg_with("gst")
        with pytest.raises(NotImplementedError):
            init_unified_voice(jax.random.PRNGKey(0), cfg)

    def test_attention_block_zero_proj_is_identity_at_init(self):
        """proj_out is zero-initialized (arch_util.py:10-16), so a fresh
        AttentionBlock is the identity."""
        from indextts_tpu.models.attention_block import attention_block_apply, init_attention_block

        p = init_attention_block(jax.random.PRNGKey(0), 32, num_heads=4)
        x = jnp.asarray(rng_np.standard_normal((1, 10, 32)).astype(np.float32))
        out = attention_block_apply(p, x, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_relative_position_bias_shape(self):
        from indextts_tpu.models.attention_block import (
            init_relative_position_bias,
            relative_position_bias,
        )

        p = init_relative_position_bias(jax.random.PRNGKey(0), heads=4)
        bias = relative_position_bias(p, 6, 6)
        assert bias.shape == (4, 6, 6)


class TestInputTokens:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = cfg_with("conformer_perceiver")
        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(rng_np.standard_normal((1, 40, 100)).astype(np.float32))
        conds = get_conditioning(params, cfg, mel, jnp.asarray([40]))
        return cfg, params, conds

    def test_prefix_changes_generation(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        lens = jnp.asarray([5])
        gen = GenerationConfig(do_sample=False, max_new_tokens=8)
        base, _ = generate_speech(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(0))
        prefix = jnp.asarray([[3, 4, 5]], jnp.int32)
        cont, _ = generate_speech(
            params, cfg, gen, conds, text, lens, jax.random.PRNGKey(0), input_tokens=prefix
        )
        assert cont.shape == base.shape
        assert not np.array_equal(np.asarray(base), np.asarray(cont))

    def test_prefix_matches_forced_oracle(self, setup):
        """Generating with a forced prefix must equal full-recompute greedy
        decoding where the first S0 tokens are forced."""
        cfg, params, conds = setup
        from indextts_tpu.models.gpt import gpt2_apply
        from indextts_tpu.models.gpt_decode import _mel_logits, prepare_gpt_inputs

        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        lens = jnp.asarray([5])
        prefix = np.asarray([[3, 4, 5]], np.int32)
        gen = GenerationConfig(do_sample=False, max_new_tokens=6)
        got, _ = generate_speech(
            params, cfg, gen, conds, text, lens, jax.random.PRNGKey(0),
            repetition_penalty=1.0, input_tokens=jnp.asarray(prefix),
        )
        # oracle: run full forward over [prefill, prefix, generated...] with the
        # reference's positional scheme (prefix at 1..S0, then S0+2, S0+3, ...)
        emb0, mask0 = prepare_gpt_inputs(params, cfg, conds, text, lens)
        s0 = prefix.shape[1]
        prefix_emb = params["mel_embedding"][jnp.asarray(prefix)] + params["mel_pos_embedding"][1 : s0 + 1][None]
        gen_tokens = []
        for t in range(6):
            embs = [emb0, prefix_emb]
            if gen_tokens:
                toks = jnp.asarray(np.stack(gen_tokens, axis=1))
                pos = jnp.asarray([s0 + 2 + i for i in range(len(gen_tokens))])
                embs.append(params["mel_embedding"][toks] + params["mel_pos_embedding"][pos][None])
            emb = jnp.concatenate(embs, axis=1)
            mask = jnp.concatenate([mask0, jnp.ones((1, emb.shape[1] - mask0.shape[1]), bool)], axis=1)
            hidden = gpt2_apply(params["gpt"], emb, cfg.heads, attention_mask=mask)
            logits = _mel_logits(params, hidden[:, -1])
            gen_tokens.append(np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32))
        gold = np.stack(gen_tokens, axis=1)
        np.testing.assert_array_equal(np.asarray(got), gold)


class TestInferenceSpeech:
    def test_num_return_sequences(self):
        cfg = cfg_with("conformer_perceiver")
        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(rng_np.standard_normal((1, 40, 100)).astype(np.float32))
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        codes, lengths = inference_speech(
            params, cfg, mel, text, jnp.asarray([5]),
            num_return_sequences=3, max_generate_length=8, rng=jax.random.PRNGKey(7),
        )
        assert codes.shape[0] == 3
        # independent sampling -> at least two of the three differ
        rows = [tuple(np.asarray(codes[i])) for i in range(3)]
        assert len(set(rows)) >= 2

    def test_typical_sampling_runs(self):
        cfg = cfg_with("conformer_perceiver")
        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(rng_np.standard_normal((1, 40, 100)).astype(np.float32))
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        codes, _ = inference_speech(
            params, cfg, mel, text, jnp.asarray([5]),
            typical_sampling=True, typical_mass=0.9, max_generate_length=6, rng=jax.random.PRNGKey(1),
        )
        c = np.asarray(codes)
        assert (c >= 0).all() and (c < cfg.number_mel_codes).all()

    def test_num_return_sequences_divisibility_enforced(self):
        """Reference asserts nrs % b == 0 loudly (model.py:678-681); silent
        integer division returned too few sequences before round-3 review."""
        cfg = cfg_with("conformer_perceiver")
        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(rng_np.standard_normal((1, 40, 100)).astype(np.float32))
        text = jnp.asarray([[5, 6, 7, 1], [6, 7, 8, 1], [7, 8, 9, 1]], jnp.int32)
        with pytest.raises(ValueError, match="multiple"):
            inference_speech(
                params, cfg, mel, text, jnp.asarray([4, 4, 4]),
                num_return_sequences=4, max_generate_length=6, rng=jax.random.PRNGKey(7),
            )

    def test_input_tokens_with_beams(self):
        """Forced prefixes compose with beam decode (ref model.py:690-703
        reaches this through HF generate's input_ids; round-5 close of the
        last loud parity delta). The prefix must influence the result —
        round 3's driver silently dropped it."""
        cfg = cfg_with("conformer_perceiver")
        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(rng_np.standard_normal((1, 40, 100)).astype(np.float32))
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        codes_p, lens_p = inference_speech(
            params, cfg, mel, text, jnp.asarray([5]),
            input_tokens=jnp.asarray([[3, 4]], jnp.int32), num_beams=2,
            do_sample=False, max_generate_length=6, rng=jax.random.PRNGKey(1),
        )
        codes_n, lens_n = inference_speech(
            params, cfg, mel, text, jnp.asarray([5]), num_beams=2,
            do_sample=False, max_generate_length=6, rng=jax.random.PRNGKey(1),
        )
        assert codes_p.shape == codes_n.shape
        assert not (np.array_equal(np.asarray(codes_p), np.asarray(codes_n))
                    and np.array_equal(np.asarray(lens_p), np.asarray(lens_n)))

    def test_input_tokens_prefix_caps_max_new(self):
        """A forced prefix shifts decode mel positions by s0; max_new must be
        capped so the positional table is never over-indexed (the torch
        reference raises an embedding error; XLA would silently clamp)."""
        cfg = cfg_with("conformer_perceiver")
        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(rng_np.standard_normal((1, 40, 100)).astype(np.float32))
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        prefix = jnp.asarray([[3, 4, 5]], jnp.int32)
        # max_generate_length beyond capacity: must cap, not over-index
        codes, lengths = inference_speech(
            params, cfg, mel, text, jnp.asarray([5]),
            input_tokens=prefix, max_generate_length=cfg.max_mel_tokens,
            rng=jax.random.PRNGKey(2),
        )
        # capped: generated region bounded by max_mel_tokens - 1 - s0
        assert codes.shape[1] - prefix.shape[1] <= cfg.max_mel_tokens - 1 - prefix.shape[1]
        assert int(lengths[0]) <= cfg.max_mel_tokens
        # a prefix that fills the whole table leaves no room -> loud error
        with pytest.raises(ValueError, match="no room"):
            inference_speech(
                params, cfg, mel, text, jnp.asarray([5]),
                input_tokens=jnp.asarray([list(range(2, 2 + cfg.max_mel_tokens))], jnp.int32),
                rng=jax.random.PRNGKey(2),
            )
