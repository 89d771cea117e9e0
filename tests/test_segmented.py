"""Segmented (cache-growing) decode must match the monolithic decode loop
bit-exactly for both greedy and sampled generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.models.gpt import get_conditioning, init_unified_voice
from indextts_tpu.models.gpt_decode import (
    GenerationConfig,
    generate_speech,
    generate_speech_segmented,
)
from tests.test_gpt import tiny_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = init_unified_voice(jax.random.PRNGKey(0), cfg)
    rng_np = np.random.default_rng(11)
    mel = jnp.asarray(rng_np.standard_normal((1, 40, 100)).astype(np.float32))
    conds = get_conditioning(params, cfg, mel, jnp.asarray([40]))
    return cfg, params, conds


@pytest.mark.parametrize("do_sample", [False, True])
def test_matches_monolithic(setup, do_sample):
    cfg, params, conds = setup
    text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
    lens = jnp.asarray([5])
    gen = GenerationConfig(do_sample=do_sample, top_k=30, max_new_tokens=20)
    a, la = generate_speech(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(3))
    b, lb = generate_speech_segmented(
        params, cfg, gen, conds, text, lens, jax.random.PRNGKey(3), segment=6
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_early_exit_skips_segments(setup):
    """When every row stops in segment 0, later segment fns never compile.
    Random tiny weights rarely emit a stop (the old version passed its core
    assertion vacuously) — bias the mel head so stop wins greedy step 1."""
    cfg, params, conds = setup
    p2 = dict(params)
    bias = np.zeros(cfg.number_mel_codes, np.float32)
    bias[cfg.stop_mel_token] = 5.0
    p2["mel_head"] = {
        "weight": jnp.zeros_like(params["mel_head"]["weight"]),
        "bias": jnp.asarray(bias),
    }
    text = jnp.asarray([[5, 6, 7, 1, 1, 1]], jnp.int32)
    gen = GenerationConfig(do_sample=False, max_new_tokens=40)
    cache = {}
    codes, lengths = generate_speech_segmented(
        p2, cfg, gen, conds, text, jnp.asarray([3]), jax.random.PRNGKey(0),
        segment=8, jit_cache=cache,
    )
    n_codes = int(lengths[0])
    compiled_segments = [k for k in cache if k[0] == "seg"]
    assert n_codes <= 8, f"stop-biased row did not stop in segment 0 (n_codes={n_codes})"
    assert len(compiled_segments) == 1
    assert (np.asarray(codes) < cfg.number_mel_codes).all()


def test_batched(setup):
    cfg, params, conds = setup
    texts = jnp.asarray([[5, 6, 7, 8, 9, 1], [10, 11, 12, 1, 1, 1]], jnp.int32)
    lens = jnp.asarray([5, 3])
    conds2 = jnp.concatenate([conds, conds], axis=0)
    gen = GenerationConfig(do_sample=False, max_new_tokens=16)
    a, _ = generate_speech(params, cfg, gen, conds2, texts, lens, jax.random.PRNGKey(0))
    b, _ = generate_speech_segmented(
        params, cfg, gen, conds2, texts, lens, jax.random.PRNGKey(0), segment=5
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("do_sample,nb", [(False, 2), (True, 3)])
def test_beam_segmented_matches_split(setup, do_sample, nb):
    from indextts_tpu.models.gpt_decode import (
        generate_speech_beam,
        generate_speech_beam_segmented,
    )

    cfg, params, conds = setup
    text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
    lens = jnp.asarray([5])
    gen = GenerationConfig(do_sample=do_sample, num_beams=nb, top_k=30, max_new_tokens=20)
    a, la = generate_speech_beam(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(3))
    b, lb = generate_speech_beam_segmented(
        params, cfg, gen, conds, text, lens, jax.random.PRNGKey(3), segment=6
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
