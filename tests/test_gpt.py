"""UnifiedVoice + decode-loop tests.

The acceptance contract follows the reference's verification strategy
(tests/padding_test.py): greedy decode must be invariant to text padding and
batching, and the KV-cached decode loop must match a full-recompute oracle
token for token.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.models.gpt import (
    get_conditioning,
    gpt2_apply,
    init_unified_voice,
    unified_voice_forward,
)
from indextts_tpu.models.gpt_decode import (
    GenerationConfig,
    generate_speech,
    generate_speech_beam,
    prepare_gpt_inputs,
)
from indextts_tpu.ops.sampling import apply_repetition_penalty

rng_np = np.random.default_rng(11)


def tiny_cfg():
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
        condition_type="conformer_perceiver",
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=64, attention_heads=4, num_blocks=1, input_layer="conv2d2", perceiver_mult=2
        ),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = init_unified_voice(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng_np.standard_normal((1, 40, 100)).astype(np.float32))
    conds = get_conditioning(params, cfg, mel, jnp.asarray([40]))
    return cfg, params, conds


def oracle_generate(params, cfg, conds, text_tokens, text_lengths, max_new, repetition_penalty=1.0):
    """Greedy decode by full recomputation each step — mirrors the
    GPT2InferenceModel semantics (model.py:115-192) including the mel
    positional off-by-one (generated token t gets position t+1)."""
    emb0, mask0 = prepare_gpt_inputs(params, cfg, conds, text_tokens, text_lengths)
    b = emb0.shape[0]
    from indextts_tpu.models.gpt_decode import _mel_logits

    gen_tokens = []
    seen = np.zeros((b, cfg.number_mel_codes), bool)
    seen[:, 1] = True
    seen[:, cfg.start_mel_token] = True
    done = np.zeros(b, bool)
    for t in range(max_new):
        if gen_tokens:
            toks = jnp.asarray(np.stack(gen_tokens, axis=1))
            pos = jnp.asarray([i + 2 for i in range(len(gen_tokens))])
            gen_emb = params["mel_embedding"][toks] + params["mel_pos_embedding"][pos][None]
            emb = jnp.concatenate([emb0, gen_emb], axis=1)
            mask = jnp.concatenate([mask0, jnp.ones((b, len(gen_tokens)), bool)], axis=1)
        else:
            emb, mask = emb0, mask0
        hidden = gpt2_apply(params["gpt"], emb, cfg.heads, attention_mask=mask)
        logits = _mel_logits(params, hidden[:, -1]).astype(jnp.float32)
        if repetition_penalty != 1.0:
            logits = apply_repetition_penalty(logits, jnp.asarray(seen), repetition_penalty)
        nxt = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
        nxt = np.where(done, cfg.stop_mel_token, nxt)
        gen_tokens.append(nxt)
        done = done | (nxt == cfg.stop_mel_token)
        seen[np.arange(b), nxt] = True
        if done.all():
            break
    out = np.stack(gen_tokens, axis=1)
    pad = max_new - out.shape[1]
    if pad:
        out = np.concatenate([out, np.full((b, pad), cfg.stop_mel_token, np.int32)], axis=1)
    return out


class TestPrepareInputs:
    def test_shapes_and_mask(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 1, 1, 1]], jnp.int32)  # len 3, stop-padded
        emb, mask = prepare_gpt_inputs(params, cfg, conds, text, jnp.asarray([3]))
        c, l = cfg.condition_num_latent, 6
        assert emb.shape == (1, c + l + 2 + 1, cfg.model_dim)
        m = np.asarray(mask[0])
        assert (~m[:3]).all()  # 3 left pads
        assert m[3:].all()

    def test_left_pad_zero_emb(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 1, 1, 1]], jnp.int32)
        emb, mask = prepare_gpt_inputs(params, cfg, conds, text, jnp.asarray([3]))
        np.testing.assert_allclose(np.asarray(emb[0, :3]), 0.0)

    def test_pad_equivalence(self, setup):
        """Same text at different padded widths -> same valid embeddings
        (right-aligned)."""
        cfg, params, conds = setup
        text_a = jnp.asarray([[5, 6, 7, 1, 1, 1]], jnp.int32)
        text_b = jnp.asarray([[5, 6, 7, 1, 1, 1, 1, 1, 1, 1]], jnp.int32)
        emb_a, _ = prepare_gpt_inputs(params, cfg, conds, text_a, jnp.asarray([3]))
        emb_b, _ = prepare_gpt_inputs(params, cfg, conds, text_b, jnp.asarray([3]))
        na, nb = emb_a.shape[1], emb_b.shape[1]
        valid = cfg.condition_num_latent + 3 + 2 + 1
        np.testing.assert_allclose(
            np.asarray(emb_a[0, na - valid :]), np.asarray(emb_b[0, nb - valid :]), atol=1e-6
        )


class TestGreedyDecode:
    def test_matches_full_recompute_oracle(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        lens = jnp.asarray([5])
        gen = GenerationConfig(do_sample=False, max_new_tokens=12)
        codes, lengths = generate_speech(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(0), repetition_penalty=1.0)
        gold = oracle_generate(params, cfg, conds, text, lens, 12)
        np.testing.assert_array_equal(np.asarray(codes), gold)

    def test_oracle_match_with_repetition_penalty(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        lens = jnp.asarray([5])
        gen = GenerationConfig(do_sample=False, max_new_tokens=10)
        codes, _ = generate_speech(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(0), repetition_penalty=10.0)
        gold = oracle_generate(params, cfg, conds, text, lens, 10, repetition_penalty=10.0)
        np.testing.assert_array_equal(np.asarray(codes), gold)

    def test_padding_invariance(self, setup):
        """reference tests/padding_test.py contract: left/right padding of the
        text buffer must not change the greedy decode."""
        cfg, params, conds = setup
        gen = GenerationConfig(do_sample=False, max_new_tokens=10)
        text_a = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        text_b = jnp.asarray([[5, 6, 7, 8, 9, 1, 1, 1, 1, 1, 1, 1]], jnp.int32)
        codes_a, _ = generate_speech(params, cfg, gen, conds, text_a, jnp.asarray([5]), jax.random.PRNGKey(0))
        codes_b, _ = generate_speech(params, cfg, gen, conds, text_b, jnp.asarray([5]), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(codes_a), np.asarray(codes_b))

    def test_batch_invariance(self, setup):
        """batched greedy decode == per-row greedy decode (padding_test.py (b))."""
        cfg, params, conds = setup
        gen = GenerationConfig(do_sample=False, max_new_tokens=10)
        texts = jnp.asarray([[5, 6, 7, 8, 9, 1], [10, 11, 12, 1, 1, 1]], jnp.int32)
        lens = jnp.asarray([5, 3])
        conds2 = jnp.concatenate([conds, conds], axis=0)
        codes_batch, _ = generate_speech(params, cfg, gen, conds2, texts, lens, jax.random.PRNGKey(0))
        codes_0, _ = generate_speech(params, cfg, gen, conds, texts[:1], lens[:1], jax.random.PRNGKey(0))
        codes_1, _ = generate_speech(params, cfg, gen, conds, texts[1:], lens[1:], jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(codes_batch[0]), np.asarray(codes_0[0]))
        np.testing.assert_array_equal(np.asarray(codes_batch[1]), np.asarray(codes_1[0]))

    def test_stop_padding_and_lengths(self, setup):
        """Random tiny weights rarely emit a stop, which used to make this
        test pass VACUOUSLY — bias the mel head so token 7 wins greedy step
        1, then the repetition penalty (10) suppresses it and stop wins step
        2: a deterministic mixed-tokens-then-stop trajectory."""
        cfg, params, conds = setup
        p2 = dict(params)
        bias = np.zeros(cfg.number_mel_codes, np.float32)
        bias[7] = 6.0
        bias[cfg.stop_mel_token] = 5.0
        p2["mel_head"] = {
            "weight": jnp.zeros_like(params["mel_head"]["weight"]),
            "bias": jnp.asarray(bias),
        }
        gen = GenerationConfig(do_sample=False, max_new_tokens=16)
        text = jnp.asarray([[5, 6, 7, 1]], jnp.int32)
        codes, lengths = generate_speech(p2, cfg, gen, conds, text, jnp.asarray([3]),
                                         jax.random.PRNGKey(0), repetition_penalty=10.0)
        codes = np.asarray(codes)
        ln = int(lengths[0])
        assert ln == 2, f"expected stop at step 2, got lengths={ln}, codes={codes[0]}"
        assert codes[0, 0] == 7
        assert codes[0, ln - 1] == cfg.stop_mel_token
        assert (codes[0, ln:] == cfg.stop_mel_token).all()


class TestSampledDecode:
    def test_deterministic_given_seed(self, setup):
        cfg, params, conds = setup
        gen = GenerationConfig(do_sample=True, top_k=30, max_new_tokens=10)
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        a, _ = generate_speech(params, cfg, gen, conds, text, jnp.asarray([5]), jax.random.PRNGKey(42))
        b, _ = generate_speech(params, cfg, gen, conds, text, jnp.asarray([5]), jax.random.PRNGKey(42))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tokens_in_range(self, setup):
        cfg, params, conds = setup
        gen = GenerationConfig(do_sample=True, top_k=10, max_new_tokens=10)
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        codes, _ = generate_speech(
            params, cfg, gen, conds, text, jnp.asarray([5]), jax.random.PRNGKey(1), temperature=0.9, top_p=0.8
        )
        c = np.asarray(codes)
        assert (c >= 0).all() and (c < cfg.number_mel_codes).all()


class TestBeamDecode:
    def test_single_beam_first_token_matches_greedy(self, setup):
        """Beam-1 follows greedy until EOS enters the successor top-2 — after
        that beam may legally prefer the shorter finished hypothesis
        (length_penalty=0 divides by len^0; HF beam search behaves the same),
        so only the first token is an exact-match invariant."""
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        lens = jnp.asarray([5])
        gen_g = GenerationConfig(do_sample=False, max_new_tokens=10)
        gen_b = GenerationConfig(do_sample=False, num_beams=1, max_new_tokens=10)
        greedy, _ = generate_speech(params, cfg, gen_g, conds, text, lens, jax.random.PRNGKey(0))
        beam, b_len = generate_speech_beam(params, cfg, gen_b, conds, text, lens, jax.random.PRNGKey(0))
        assert int(np.asarray(greedy)[0, 0]) == int(np.asarray(beam)[0, 0])
        # and the beam result is a finished hypothesis (ends in stop) or full-length
        c = np.asarray(beam)[0]
        ln = int(b_len[0])
        assert ln == 10 or c[ln - 1] == cfg.stop_mel_token

    def test_beam3_runs_and_finishes(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        gen = GenerationConfig(do_sample=False, num_beams=3, max_new_tokens=12)
        codes, lengths = generate_speech_beam(params, cfg, gen, conds, text, jnp.asarray([5]), jax.random.PRNGKey(0))
        c = np.asarray(codes)
        assert c.shape == (1, 12)
        assert (c >= 0).all() and (c < cfg.number_mel_codes).all()

    def test_beam_sample_deterministic_given_seed(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        gen = GenerationConfig(do_sample=True, num_beams=3, top_k=30, max_new_tokens=10)
        a, _ = generate_speech_beam(params, cfg, gen, conds, text, jnp.asarray([5]), jax.random.PRNGKey(5))
        b, _ = generate_speech_beam(params, cfg, gen, conds, text, jnp.asarray([5]), jax.random.PRNGKey(5))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTeacherForced:
    def test_latent_shape(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        codes = jnp.asarray([[3, 4, 5, 6, 7, 8, 65, 65]], jnp.int32)
        wav_lens = jnp.asarray([6 * cfg.mel_length_compression])
        latent = unified_voice_forward(
            params, cfg, None, text, jnp.asarray([5]), codes, wav_lens, None, return_latent=True, conds=conds
        )
        # mel part length = codes_len + 1 (stop pad) + 1 (start align) - 2 (stripped)
        assert latent.shape == (1, codes.shape[1], cfg.model_dim)

    def test_loss_forward(self, setup):
        cfg, params, conds = setup
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        codes = jnp.asarray([[3, 4, 5, 6, 7, 8, 65, 65]], jnp.int32)
        wav_lens = jnp.asarray([6 * cfg.mel_length_compression])
        loss_text, loss_mel, mel_logits = unified_voice_forward(
            params, cfg, None, text, jnp.asarray([5]), codes, wav_lens, None, return_latent=False, conds=conds
        )
        assert np.isfinite(float(loss_text)) and np.isfinite(float(loss_mel))
        assert mel_logits.shape == (1, cfg.number_mel_codes, codes.shape[1] + 2)

    def test_mask_pad_keys_matches_exact_length(self, setup):
        """Bucket-padded latents with mask_pad_keys=True must equal the
        exact-length pass over the valid region (the reference runs stage-2
        at exact per-sentence length, infer.py:196-200; round-1 advisory
        flagged the unmasked padded keys as a small deviation)."""
        cfg, params, conds = setup
        n_text, n_code = 5, 6
        text_e = jnp.asarray([[5, 6, 7, 8, 9]], jnp.int32)
        codes_e = jnp.asarray([[3, 4, 5, 6, 7, 8]], jnp.int32)
        wav_lens = jnp.asarray([n_code * cfg.mel_length_compression])
        exact = unified_voice_forward(
            params, cfg, None, text_e, jnp.asarray([n_text]), codes_e, wav_lens, None,
            return_latent=True, conds=conds,
        )
        # bucket-padded with stop tokens (engine's _gpt_latent shapes)
        text_p = jnp.asarray([[5, 6, 7, 8, 9, 1, 1, 1]], jnp.int32)
        codes_p = jnp.asarray([[3, 4, 5, 6, 7, 8] + [cfg.stop_mel_token] * 10], jnp.int32)
        padded = unified_voice_forward(
            params, cfg, None, text_p, jnp.asarray([n_text]), codes_p, wav_lens, None,
            return_latent=True, conds=conds, mask_pad_keys=True,
        )
        np.testing.assert_allclose(
            np.asarray(padded[:, :n_code]), np.asarray(exact[:, :n_code]), atol=2e-5, rtol=2e-5
        )
        # and WITHOUT the mask they must differ (the deviation being fixed)
        unmasked = unified_voice_forward(
            params, cfg, None, text_p, jnp.asarray([n_text]), codes_p, wav_lens, None,
            return_latent=True, conds=conds,
        )
        assert float(jnp.abs(unmasked[:, :n_code] - exact[:, :n_code]).max()) > 1e-4

    def test_jit(self, setup):
        cfg, params, conds = setup
        fn = jax.jit(
            lambda p, c, t, tl, mc, wl: unified_voice_forward(
                p, cfg, None, t, tl, mc, wl, None, return_latent=True, conds=c
            )
        )
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        codes = jnp.asarray([[3, 4, 5, 6, 7, 8, 65, 65]], jnp.int32)
        out = fn(params, conds, text, jnp.asarray([5]), codes, jnp.asarray([6144]))
        assert out.shape[-1] == cfg.model_dim
