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


class TestQuantKVCache:
    """Int8 KV cache (per-column scales, _decode_block_q): the cache streams
    half the bytes; dequantization is exact per column, so logits deviate
    only by the int8 rounding of K/V (~0.4% relative). Reference config this
    accelerates: the default decode, infer.py:116-124."""

    def _setup(self):
        from tests.test_gpt import tiny_cfg

        cfg = tiny_cfg()
        from indextts_tpu.models.gpt import get_conditioning, init_unified_voice

        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(np.random.default_rng(3).standard_normal((1, 40, 100)), jnp.float32)
        conds = get_conditioning(params, cfg, mel, jnp.asarray([40]))
        text = jnp.asarray([[3, 5, 7, 9, 11, 2, 4, 6]], jnp.int32)
        lens = jnp.asarray([8])
        return cfg, params, jnp.broadcast_to(conds, (1,) + conds.shape[1:]), text, lens

    def test_cache_is_int8(self):
        from indextts_tpu.models.gpt_decode import _prefill, prepare_gpt_inputs

        cfg, params, conds, text, lens = self._setup()
        emb, mask = prepare_gpt_inputs(params, cfg, conds, text, lens)
        _, cache = _prefill(params, cfg, emb, mask, emb.shape[1] + 4, quant_kv=True)
        k8, ks, v8, vs = cache
        assert k8.dtype == jnp.int8 and v8.dtype == jnp.int8
        assert ks.shape == k8.shape[:-1]

    def test_forced_logits_close_to_bf16_cache(self):
        """Per-step logits under the int8 cache track the bf16-cache logits
        through prefill + forced decode steps (same methodology as the bench
        verify gate — forced tokens, no tie cascades)."""
        from indextts_tpu.models.gpt_decode import _decode_step, _prefill, prepare_gpt_inputs

        cfg, params, conds, text, lens = self._setup()
        emb, mask = prepare_gpt_inputs(params, cfg, conds, text, lens)
        p = emb.shape[1]
        T = 6
        forced = np.random.default_rng(5).integers(2, 60, (1, T)).astype(np.int32)

        def run(quant):
            logits0, cache = _prefill(params, cfg, emb, mask, p + T, quant_kv=quant)
            pv = jnp.pad(mask, ((0, 0), (0, T)))
            cpos = jnp.arange(p + T)[None, :]
            outs = [np.asarray(logits0)]
            for i in range(T - 1):
                valid = pv | ((cpos >= p) & (cpos < p + i))
                lg, cache = _decode_step(params, cfg, jnp.asarray(forced[:, i]), i + 2, cache, p + i, valid)
                outs.append(np.asarray(lg))
            return np.stack(outs)

        base = run(False)
        quant = run(True)
        assert np.max(np.abs(base - quant)) < 0.35
        # decisive argmax agreement (margin > 2x tolerance)
        srt = np.sort(base, axis=-1)
        decisive = (srt[..., -1] - srt[..., -2]) > 0.7
        assert np.all((base.argmax(-1) == quant.argmax(-1))[decisive])

    def test_generate_speech_quant_kv_runs_and_tracks(self):
        from indextts_tpu.models.gpt_decode import GenerationConfig, generate_speech

        cfg, params, conds, text, lens = self._setup()
        gen = GenerationConfig(do_sample=False, max_new_tokens=10)
        a, la = generate_speech(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(2))
        b, lb = generate_speech(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(2),
                                quant_kv=True)
        # greedy sequences may legitimately diverge at near-ties; both must
        # be valid and agree on the first token (decisive from the prefill)
        assert a.shape == b.shape
        assert int(a[0, 0]) == int(b[0, 0])

    def test_segmented_quant_kv_matches_monolithic(self):
        from indextts_tpu.models.gpt_decode import (
            GenerationConfig,
            generate_speech,
            generate_speech_segmented,
        )

        cfg, params, conds, text, lens = self._setup()
        gen = GenerationConfig(do_sample=False, max_new_tokens=12)
        a, la = generate_speech(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(2),
                                quant_kv=True)
        b, lb = generate_speech_segmented(params, cfg, gen, conds, text, lens,
                                          jax.random.PRNGKey(2), segment=5, quant_kv=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_beam_quant_kv_runs_and_tracks(self):
        """quant_kv beams: the lineage attention reads int8 kvp/kvg with
        folded per-column dequant. Beam choices may legitimately shift under
        K/V rounding; shapes/validity and the decisive first selection must
        hold, and the cache must actually be int8 (spied via _prefill)."""
        from indextts_tpu.models.gpt_decode import GenerationConfig, generate_speech_beam

        cfg, params, conds, text, lens = self._setup()
        gen = GenerationConfig(do_sample=False, num_beams=2, max_new_tokens=10)
        a, la = generate_speech_beam(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(2))
        b, lb = generate_speech_beam(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(2),
                                     quant_kv=True)
        assert a.shape == b.shape
        assert int(la[0]) > 0 and int(lb[0]) > 0
        assert int(a[0, 0]) == int(b[0, 0])

    def test_beam_segmented_quant_kv_matches_monolithic(self):
        """Segmented quant beams bit-match the monolithic quant beam (the
        same contract the bf16 drivers are pinned to in test_segmented.py)."""
        from indextts_tpu.models.gpt_decode import (
            GenerationConfig,
            generate_speech_beam,
            generate_speech_beam_segmented,
        )

        cfg, params, conds, text, lens = self._setup()
        gen = GenerationConfig(do_sample=False, num_beams=2, max_new_tokens=12)
        a, la = generate_speech_beam(params, cfg, gen, conds, text, lens, jax.random.PRNGKey(2),
                                     quant_kv=True)
        b, lb = generate_speech_beam_segmented(params, cfg, gen, conds, text, lens,
                                               jax.random.PRNGKey(2), segment=5, quant_kv=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_beam_lineage_block_quant_parity(self):
        """The quantized lineage block == the bf16 lineage block fed the
        DEQUANTIZED cache (same folded-dequant contract as _decode_block_q):
        identical math, only accumulation order differs."""
        from indextts_tpu.models.gpt_decode import (
            _decode_block_beam_lineage, _quant_cols,
        )
        from indextts_tpu.models.gpt import init_unified_voice
        from tests.test_gpt import tiny_cfg

        cfg = tiny_cfg()
        params = init_unified_voice(jax.random.PRNGKey(0), cfg)
        layer_p = jax.tree_util.tree_map(lambda t: t[0], params["gpt"]["blocks"])
        npr = np.random.default_rng(9)
        heads, d = cfg.heads, cfg.model_dim
        dh, g2 = d // heads, heads // 2
        b, nb, p_len, n_len = 2, 2, 6, 5
        bn = b * nb
        x = jnp.asarray(npr.standard_normal((bn, d)) * 0.3, jnp.float32)
        k2p = jnp.asarray(npr.standard_normal((b, g2, p_len, 2 * dh)) * 0.5, jnp.float32)
        v2p = jnp.asarray(npr.standard_normal((b, g2, p_len, 2 * dh)) * 0.5, jnp.float32)
        k2g = jnp.asarray(npr.standard_normal((bn, g2, n_len, 2 * dh)) * 0.5, jnp.float32)
        v2g = jnp.asarray(npr.standard_normal((bn, g2, n_len, 2 * dh)) * 0.5, jnp.float32)
        k8p, ksp = _quant_cols(k2p)
        v8p, vsp = _quant_cols(v2p)
        k8g, ksg = _quant_cols(k2g)
        v8g, vsg = _quant_cols(v2g)
        lin = jnp.zeros((bn, n_len), jnp.int32)
        m_idx = (jnp.arange(bn, dtype=jnp.int32) % nb)[:, None]
        lin_masks = [(((m_idx - lin) % nb) == delta).astype(jnp.float32)[:, None, :]
                     for delta in range(nb)]
        bias_p = jnp.zeros((b, p_len), jnp.float32)
        bias_g = jnp.where(jnp.arange(n_len)[None, :] < 3, 0.0, -1e30).astype(jnp.float32)
        # bf16 block on the DEQUANTIZED cache == quant block on the int8 cache
        deq = lambda q8, s: q8.astype(jnp.float32) * s[..., None]
        out_ref, kv_ref = _decode_block_beam_lineage(
            layer_p, x, (deq(k8p, ksp), deq(v8p, vsp)), (deq(k8g, ksg), deq(v8g, vsg)),
            lin_masks, bias_p, bias_g, heads, nb)
        out_q, kv_q = _decode_block_beam_lineage(
            layer_p, x, (k8p, ksp, v8p, vsp), (k8g, ksg, v8g, vsg),
            lin_masks, bias_p, bias_g, heads, nb)
        np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_ref), atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(kv_q[0]), np.asarray(kv_ref[0]), atol=1e-6)
