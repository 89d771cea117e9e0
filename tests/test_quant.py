"""Int8 weight-only quantization tests: round-trip accuracy and quantized
decode running through the full stack."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.ops.quant import matmul_maybe_quantized, quantize_unified_voice, quantize_weight


class TestQuantWeight:
    def test_round_trip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((64, 128)).astype(np.float32)
        qd = quantize_weight(jnp.asarray(w))
        assert qd["weight"].dtype == jnp.int8
        deq = np.asarray(qd["weight"], np.float32) * np.asarray(qd["scale"])
        # per-channel int8: relative error bounded by ~1/127 of channel max
        err = np.abs(deq - w)
        assert (err <= np.abs(w).max(axis=0, keepdims=True) / 127.0 * 0.5 + 1e-6).all()

    def test_stacked(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((3, 16, 32)).astype(np.float32)
        qd = quantize_weight(jnp.asarray(w))
        assert qd["scale"].shape == (3, 1, 32)

    def test_matmul_dispatch(self):
        rng = np.random.default_rng(2)
        w = rng.standard_normal((16, 32)).astype(np.float32)
        b = rng.standard_normal(32).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
        plain = matmul_maybe_quantized(x, {"weight": jnp.asarray(w), "bias": jnp.asarray(b)})
        qd = quantize_weight(jnp.asarray(w))
        quant = matmul_maybe_quantized(x, {"weight": qd["weight"], "scale": qd["scale"], "bias": jnp.asarray(b)})
        np.testing.assert_allclose(np.asarray(quant), np.asarray(plain), atol=0.2, rtol=0.05)


class TestQuantizedDecode:
    def test_decode_runs_and_tracks_fp(self):
        from tests.test_gpt import tiny_cfg
        from indextts_tpu.models.gpt import get_conditioning, init_unified_voice
        from indextts_tpu.models.gpt_decode import GenerationConfig, generate_speech

        cfg = tiny_cfg()
        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(3)
        mel = jnp.asarray(rng.standard_normal((1, 40, 100)).astype(np.float32))
        conds = get_conditioning(params, cfg, mel, jnp.asarray([40]))
        text = jnp.asarray([[5, 6, 7, 8, 9, 1]], jnp.int32)
        gen = GenerationConfig(do_sample=False, max_new_tokens=8)
        fp_codes, _ = generate_speech(params, cfg, gen, conds, text, jnp.asarray([5]), jax.random.PRNGKey(0))
        qparams = quantize_unified_voice(params)
        q_codes, _ = generate_speech(qparams, cfg, gen, conds, text, jnp.asarray([5]), jax.random.PRNGKey(0))
        assert q_codes.shape == fp_codes.shape
        c = np.asarray(q_codes)
        assert (c >= 0).all() and (c < cfg.number_mel_codes).all()
        # greedy paths usually agree at this scale; require at least the
        # first token to match (distribution-level parity, not byte-exact)
        assert int(q_codes[0, 0]) == int(fp_codes[0, 0])


class TestPallasInt8Matmul:
    def test_matches_dequantized_matmul(self):
        from indextts_tpu.ops.pallas.qmatmul import int8_matmul

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((8, 300)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((300, 700)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(700).astype(np.float32))
        qd = quantize_weight(w)
        gold = np.asarray(x @ (np.asarray(qd["weight"], np.float32) * np.asarray(qd["scale"])) + b)
        mine = np.asarray(
            int8_matmul(x, qd["weight"], qd["scale"], bias=b, tile_n=256, tile_k=128, interpret=True)
        )
        rel = np.abs(mine - gold).max() / np.abs(gold).max()
        assert rel < 5e-3  # bf16 MXU accumulation noise

    def test_route_flag(self):
        from indextts_tpu.ops.quant import matmul_maybe_quantized

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32))
        qd = quantize_weight(w)
        wp = {"weight": qd["weight"], "scale": qd["scale"], "bias": jnp.zeros(96)}
        a = np.asarray(matmul_maybe_quantized(x, wp, use_pallas=False))
        b = np.asarray(matmul_maybe_quantized(x, wp, use_pallas=True))
        np.testing.assert_allclose(a, b, atol=0.05, rtol=0.01)
