"""Traced sampling-knob contract: length_penalty and typical_mass are traced
scalars (like temperature/top_p/repetition_penalty — CLAUDE.md convention), so
sweeping them from the web form (server/webui.py form fields) must NOT
recompile the decode graphs. The reference pays no compile cost for any knob
(eager torch), so any knob that recompiles here is a capability regression.

Reference: length_penalty/typical_mass enter only score arithmetic
(HF beam_search length normalization; typical_sampling.py:4-30 mass cutoff),
never shapes — hence traceable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu.config import GPTConfig
from indextts_tpu.models.gpt import get_conditioning, init_unified_voice
from indextts_tpu.models.gpt_decode import (
    GenerationConfig,
    generate_speech,
    generate_speech_beam,
    generate_speech_beam_segmented,
)


@pytest.fixture(scope="module")
def setup():
    cfg = GPTConfig(
        layers=2, model_dim=64, heads=4, max_text_tokens=30, max_mel_tokens=60,
        number_text_tokens=40, number_mel_codes=48, start_mel_token=44,
        stop_mel_token=45, start_text_token=0, stop_text_token=1,
        condition_type="conformer_perceiver", condition_num_latent=4,
        condition_module={
            "output_size": 64, "linear_units": 128, "attention_heads": 2,
            "num_blocks": 1, "input_layer": "conv2d2", "perceiver_mult": 2,
        },
    )
    params = init_unified_voice(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 40, 100))
    conds = get_conditioning(params, cfg, mel, jnp.asarray([40]))
    text = jnp.asarray([[3, 5, 7, 9, 11, 2, 4, 6]], jnp.int32)
    lens = jnp.asarray([8])
    return params, cfg, jnp.broadcast_to(conds, (1,) + conds.shape[1:]), text, lens


def test_beam_length_penalty_no_recompile(setup):
    """Two different length_penalty values hit ONE compiled beam graph."""
    from functools import partial

    params, cfg, conds, text, lens = setup
    gen = GenerationConfig(do_sample=False, num_beams=2, max_new_tokens=10)
    fn = jax.jit(partial(generate_speech_beam, cfg=cfg, gen=gen))
    rng = jax.random.PRNGKey(0)
    a, _ = fn(params, conds=conds, text_tokens=text, text_lengths=lens, rng=rng,
              length_penalty=jnp.float32(0.0))
    b, _ = fn(params, conds=conds, text_tokens=text, text_lengths=lens, rng=rng,
              length_penalty=jnp.float32(1.0))
    assert fn._cache_size() == 1
    # and the value is actually used: lp=0 run is reproducible
    a2, _ = fn(params, conds=conds, text_tokens=text, text_lengths=lens, rng=rng,
               length_penalty=jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))


def test_typical_mass_no_recompile(setup):
    """Two different typical_mass values hit ONE compiled sampling graph."""
    from functools import partial

    params, cfg, conds, text, lens = setup
    gen = GenerationConfig(do_sample=True, top_k=8, typical_sampling=True, max_new_tokens=8)
    fn = jax.jit(partial(generate_speech, cfg=cfg, gen=gen))
    rng = jax.random.PRNGKey(2)
    fn(params, conds=conds, text_tokens=text, text_lengths=lens, rng=rng,
       typical_mass=jnp.float32(0.9))
    fn(params, conds=conds, text_tokens=text, text_lengths=lens, rng=rng,
       typical_mass=jnp.float32(0.5))
    assert fn._cache_size() == 1


def test_segmented_beam_knob_sweep_shares_cache(setup):
    """The segmented beam driver's jit cache keys are knob-value independent."""
    params, cfg, conds, text, lens = setup
    gen = GenerationConfig(do_sample=False, num_beams=2, max_new_tokens=16)
    cache = {}
    rng = jax.random.PRNGKey(3)
    generate_speech_beam_segmented(
        params, cfg, gen, conds, text, lens, rng,
        length_penalty=0.0, typical_mass=0.9, segment=8, jit_cache=cache,
    )
    keys_before = set(cache.keys())
    generate_speech_beam_segmented(
        params, cfg, gen, conds, text, lens, rng,
        length_penalty=1.3, typical_mass=0.8, segment=8, jit_cache=cache,
    )
    assert set(cache.keys()) == keys_before
