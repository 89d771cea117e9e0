"""Slot-based continuous decoding (models/gpt_slots.py).

The acceptance contract: greedy slot decode equals `generate_speech`
token-for-token PER ROW — for rows admitted together, rows admitted
mid-flight (rolling admission must not perturb running rows), rows placed
across the circular-cache wrap, and slots reused after harvest. Captured
latents and the int8 cache form inherit the same row-wise contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.models.gpt import get_conditioning, init_unified_voice
from indextts_tpu.models.gpt_decode import GenerationConfig, generate_speech
from indextts_tpu.models.gpt_slots import (
    SlotState,
    slot_admit,
    slot_lengths,
    slot_prefill,
    slot_state_init,
    slot_steps,
)
from tests.test_gpt import tiny_cfg

rng_np = np.random.default_rng(23)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = init_unified_voice(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng_np.standard_normal((1, 40, 100)).astype(np.float32))
    conds = get_conditioning(params, cfg, mel, jnp.asarray([40]))
    return cfg, params, conds


GEN = GenerationConfig(do_sample=False, num_beams=1, max_new_tokens=16)
KEY = jax.random.PRNGKey(7)


def _text(lt, seed):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(2, 48, (1, lt)).astype(np.int32))


def _solo(setup, text, gen=GEN, **kw):
    cfg, params, conds = setup
    return generate_speech(
        params, cfg, gen, conds, text,
        jnp.asarray([text.shape[1]]), KEY, **kw,
    )


def _prefill_one(setup, text, gen=GEN, **kw):
    cfg, params, conds = setup
    return slot_prefill(
        params, cfg, gen, conds, text, jnp.asarray([text.shape[1]]), KEY, **kw,
    )


def _run_all(setup, state, gen=GEN, chunk=50, **kw):
    cfg, params, _ = setup
    for _ in range(10):
        state = slot_steps(params, cfg, gen, state, chunk, KEY, **kw)
        if not bool(np.asarray(state.active).any()):
            return state
    raise AssertionError("slot decode did not drain")


class TestSlotParity:
    def test_two_rows_admitted_together(self, setup):
        cfg, params, conds = setup
        ta, tb = _text(6, 1), _text(9, 2)
        state = slot_state_init(cfg, GEN, n_slots=4, cache_len=64, dtype=jnp.float32)
        state = slot_admit(state, _prefill_one(setup, ta), 0, cfg)
        state = slot_admit(state, _prefill_one(setup, tb), 2, cfg)
        state = _run_all(setup, state)
        for text, slot in ((ta, 0), (tb, 2)):
            codes_s, lens_s = _solo(setup, text)
            np.testing.assert_array_equal(np.asarray(state.codes[slot]),
                                          np.asarray(codes_s[0]))
            assert int(slot_lengths(state.codes, cfg.stop_mel_token)[slot]) == int(lens_s[0])
        # untouched slots stayed empty
        assert not bool(state.done[1]) and not bool(state.done[3])

    def test_rolling_admission_does_not_perturb_running_rows(self, setup):
        """Admit B after A has decoded 4 tokens; both must equal their solos
        (the reference contract extended: batching AND admission timing are
        output-transparent, tests/test_gpt.py padding/batch invariance)."""
        cfg, params, conds = setup
        ta, tb = _text(8, 3), _text(5, 4)
        state = slot_state_init(cfg, GEN, n_slots=2, cache_len=64, dtype=jnp.float32)
        state = slot_admit(state, _prefill_one(setup, ta), 0, cfg)
        state = slot_steps(params, cfg, GEN, state, 4, KEY)
        mid = np.asarray(state.codes[0]).copy()
        state = slot_admit(state, _prefill_one(setup, tb), 1, cfg)
        state = _run_all(setup, state)
        codes_a, _ = _solo(setup, ta)
        codes_b, _ = _solo(setup, tb)
        np.testing.assert_array_equal(np.asarray(state.codes[0]), np.asarray(codes_a[0]))
        np.testing.assert_array_equal(np.asarray(state.codes[1]), np.asarray(codes_b[0]))
        # A's already-emitted prefix was untouched by B's admission
        np.testing.assert_array_equal(np.asarray(state.codes[0])[:5], mid[:5])

    def test_slot_reuse_wraps_the_circular_cache(self, setup):
        """cache_len at the minimum (p_max + max_new): several sequential
        requests through ONE slot push the cursor around the ring; placement
        and masks must stay exact across the wrap."""
        cfg, params, conds = setup
        texts = [_text(7, 10 + i) for i in range(4)]
        p_max = cfg.condition_num_latent + 7 + 3
        s_len = p_max + GEN.max_new_tokens  # 34: forces several full wraps
        state = slot_state_init(cfg, GEN, n_slots=1, cache_len=s_len, dtype=jnp.float32)
        for text in texts:
            state = slot_admit(state, _prefill_one(setup, text), 0, cfg)
            state = _run_all(setup, state)
            assert bool(state.done[0])
            codes_s, lens_s = _solo(setup, text)
            np.testing.assert_array_equal(np.asarray(state.codes[0]),
                                          np.asarray(codes_s[0]))
            # host harvest: slot_admit fully resets the row, no clear needed
        assert int(state.tick) >= 2 * s_len - p_max  # the ring really wrapped

    def test_captured_latents_match_solo_capture(self, setup):
        cfg, params, conds = setup
        ta, tb = _text(6, 20), _text(9, 21)
        state = slot_state_init(cfg, GEN, n_slots=2, cache_len=64,
                                dtype=jnp.float32, capture_latents=True)
        state = slot_admit(state, _prefill_one(setup, ta, capture_latents=True), 0, cfg)
        state = slot_steps(params, cfg, GEN, state, 3, KEY, pos_off=1)
        state = slot_admit(state, _prefill_one(setup, tb, capture_latents=True), 1, cfg)
        state = _run_all(setup, state, pos_off=1)
        for text, slot in ((ta, 0), (tb, 1)):
            codes_s, lens_s, lat_s = _solo(setup, text, capture_latents=True, pos_off=1)
            n = int(lens_s[0])
            np.testing.assert_array_equal(np.asarray(state.codes[slot]),
                                          np.asarray(codes_s[0]))
            np.testing.assert_allclose(
                np.asarray(state.lat[slot][:n], np.float32),
                np.asarray(lat_s[0, :n], np.float32), rtol=2e-5, atol=2e-5,
            )

    def test_quant_kv_slots_match_quant_solo(self, setup):
        cfg, params, conds = setup
        ta, tb = _text(5, 30), _text(8, 31)
        state = slot_state_init(cfg, GEN, n_slots=2, cache_len=64,
                                dtype=jnp.float32, quant_kv=True)
        state = slot_admit(state, _prefill_one(setup, ta, quant_kv=True), 0, cfg)
        state = slot_steps(params, cfg, GEN, state, 2, KEY)
        state = slot_admit(state, _prefill_one(setup, tb, quant_kv=True), 1, cfg)
        state = _run_all(setup, state)
        for text, slot in ((ta, 0), (tb, 1)):
            codes_s, _ = _solo(setup, text, quant_kv=True)
            np.testing.assert_array_equal(np.asarray(state.codes[slot]),
                                          np.asarray(codes_s[0]))

    def test_per_row_dynamic_columns(self, setup):
        """Rows with DIFFERENT repetition penalties share one step graph;
        each equals its solo run with that scalar (greedy applies the
        penalty deterministically, ops/sampling)."""
        cfg, params, conds = setup
        ta, tb = _text(7, 40), _text(7, 41)
        state = slot_state_init(cfg, GEN, n_slots=2, cache_len=64, dtype=jnp.float32)
        state = slot_admit(state, _prefill_one(setup, ta, repetition_penalty=1.0), 0, cfg)
        state = slot_admit(state, _prefill_one(setup, tb, repetition_penalty=10.0), 1, cfg)
        rp = jnp.asarray([1.0, 10.0], jnp.float32)
        state = _run_all(setup, state, repetition_penalty=rp)
        codes_a, _ = _solo(setup, ta, repetition_penalty=1.0)
        codes_b, _ = _solo(setup, tb, repetition_penalty=10.0)
        np.testing.assert_array_equal(np.asarray(state.codes[0]), np.asarray(codes_a[0]))
        np.testing.assert_array_equal(np.asarray(state.codes[1]), np.asarray(codes_b[0]))

    def test_sampling_smoke_and_lengths(self, setup):
        cfg, params, conds = setup
        gen = GenerationConfig(do_sample=True, num_beams=1, top_k=5, max_new_tokens=12)
        state = slot_state_init(cfg, gen, n_slots=2, cache_len=60, dtype=jnp.float32)
        state = slot_admit(state, _prefill_one(setup, _text(6, 50), gen=gen), 0, cfg)
        state = slot_admit(state, _prefill_one(setup, _text(6, 51), gen=gen), 1, cfg)
        state = _run_all(setup, state, gen=gen)
        lens = np.asarray(slot_lengths(state.codes, cfg.stop_mel_token))
        assert ((1 <= lens) & (lens <= 12)).all()
        codes = np.asarray(state.codes)
        assert ((0 <= codes) & (codes < cfg.number_mel_codes)).all()
