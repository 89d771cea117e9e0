"""Conformer + perceiver conditioning tests: shapes, masking invariance
(padding a batch row must not change its conditioning latents), jit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.config import ConditionModuleConfig
from indextts_tpu.models.conformer import conformer_apply, init_conformer, sinusoidal_pe
from indextts_tpu.models.perceiver import init_perceiver, perceiver_apply

rng = np.random.default_rng(3)


def small_cm():
    return ConditionModuleConfig(
        output_size=64, linear_units=128, attention_heads=4, num_blocks=2, input_layer="conv2d2", perceiver_mult=2
    )


class TestPE:
    def test_matches_torch_reference_table(self):
        torch = pytest.importorskip("torch")
        import math

        d_model, max_len = 64, 100
        pe = torch.zeros(max_len, d_model)
        position = torch.arange(0, max_len).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, d_model, 2) * -(math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        mine = sinusoidal_pe(max_len, d_model)
        np.testing.assert_allclose(mine, pe.numpy(), atol=1e-5)


class TestConformer:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = small_cm()
        params = init_conformer(jax.random.PRNGKey(0), cfg, input_size=100)
        return cfg, params

    def test_shapes_conv2d2(self, setup):
        cfg, params = setup
        x = jnp.asarray(rng.standard_normal((2, 41, 100)).astype(np.float32))
        lens = jnp.asarray([41, 30])
        out, mask = conformer_apply(params, cfg, x, lens)
        assert out.shape == (2, (41 - 1) // 2, 64)
        assert mask.shape == (2, 1, (41 - 1) // 2)
        assert bool(mask[0].all())
        assert not bool(mask[1].all())

    def test_attention_and_subsampling_padding_invariance(self, setup):
        """Subsampling + masked attention must be invariant to trailing pad
        frames. (The conformer conv module is NOT pad-invariant — its
        pointwise bias leaks into padded frames before the depthwise conv —
        and the reference has the identical mechanism
        (conformer_encoder.py:133-165), so full-encoder invariance is not a
        valid expectation; conditioning is always computed at one fixed
        prompt length in both stacks.)"""
        import math

        from indextts_tpu.models.conformer import rel_mha_apply, subsampling_apply
        from indextts_tpu.ops.norms import layer_norm
        from indextts_tpu.utils.common import make_pad_mask

        cfg, params = setup
        x = rng.standard_normal((1, 33, 100)).astype(np.float32)
        x_pad = np.concatenate([x, np.zeros((1, 16, 100), np.float32)], axis=1)

        def run(xx):
            t = xx.shape[1]
            masks = ~make_pad_mask(jnp.asarray([33]), t)[:, None, :]
            f, m = subsampling_apply(params["embed"], jnp.asarray(xx), masks)
            f = f * math.sqrt(cfg.output_size)
            pos = params["pe"][None, : f.shape[1], :]
            lay = params["layers"][0]
            h = layer_norm(f, lay["norm_mha"]["weight"], lay["norm_mha"]["bias"])
            return np.asarray(rel_mha_apply(lay["attn"], h, pos, m, cfg.attention_heads)), np.asarray(m)

        a_short, m_short = run(x)
        a_pad, _ = run(x_pad)
        n_valid = int(m_short.sum())
        np.testing.assert_allclose(a_pad[0, :n_valid], a_short[0, :n_valid], atol=1e-5)

    def test_layer_matches_torch_oracle(self, setup):
        """Full ConformerEncoderLayer numerics vs the reference math
        (conformer_encoder.py:232-313, attention.py:235-312) reassembled with
        torch primitives from our parameters."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF

        cfg, params = setup
        lay = params["layers"][0]
        heads = cfg.attention_heads
        d = cfg.output_size
        d_k = d // heads
        t = 12
        x = rng.standard_normal((1, t, d)).astype(np.float32)
        pos = np.asarray(params["pe"])[None, :t, :]
        mask = np.ones((1, 1, t), dtype=bool)

        def tl(p):  # my linear -> torch weight
            return torch.from_numpy(np.asarray(p["weight"]).T.copy()), (
                torch.from_numpy(np.asarray(p["bias"]).copy()) if "bias" in p else None
            )

        xt = torch.from_numpy(x)
        post = torch.from_numpy(pos.astype(np.float32))

        # --- torch oracle ---
        def t_layer_norm(h, pn):
            return TF.layer_norm(
                h, (d,), torch.from_numpy(np.asarray(pn["weight"])), torch.from_numpy(np.asarray(pn["bias"]))
            )

        h = t_layer_norm(xt, lay["norm_mha"])
        qw, qb = tl(lay["attn"]["linear_q"])
        kw, kb = tl(lay["attn"]["linear_k"])
        vw, vb = tl(lay["attn"]["linear_v"])
        ow, ob = tl(lay["attn"]["linear_out"])
        pw, _ = tl(lay["attn"]["linear_pos"])
        q = TF.linear(h, qw, qb).view(1, t, heads, d_k)
        k = TF.linear(h, kw, kb).view(1, t, heads, d_k).transpose(1, 2)
        v = TF.linear(h, vw, vb).view(1, t, heads, d_k).transpose(1, 2)
        p_ = TF.linear(post, pw).view(1, t, heads, d_k).transpose(1, 2)
        u = torch.from_numpy(np.asarray(lay["attn"]["pos_bias_u"]))
        vb_ = torch.from_numpy(np.asarray(lay["attn"]["pos_bias_v"]))
        q_u = (q + u).transpose(1, 2)
        q_v = (q + vb_).transpose(1, 2)
        scores = (q_u @ k.transpose(-2, -1) + q_v @ p_.transpose(-2, -1)) / (d_k**0.5)
        attn = torch.softmax(scores, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(1, t, d)
        xt2 = xt + TF.linear(out, ow, ob)

        # conv module
        h = t_layer_norm(xt2, lay["norm_conv"]).transpose(1, 2)  # [B,C,T]
        pw1w = torch.from_numpy(np.transpose(np.asarray(lay["conv"]["pw1"]["weight"]), (2, 1, 0)).copy())
        h = TF.conv1d(h, pw1w, torch.from_numpy(np.asarray(lay["conv"]["pw1"]["bias"])))
        h = TF.glu(h, dim=1)
        dww = torch.from_numpy(np.transpose(np.asarray(lay["conv"]["dw"]["weight"]), (2, 1, 0)).copy())
        h = TF.conv1d(h, dww, torch.from_numpy(np.asarray(lay["conv"]["dw"]["bias"])), padding=7, groups=d)
        h = h.transpose(1, 2)
        h = TF.silu(
            TF.layer_norm(
                h, (d,), torch.from_numpy(np.asarray(lay["conv"]["ln"]["weight"])), torch.from_numpy(np.asarray(lay["conv"]["ln"]["bias"]))
            )
        ).transpose(1, 2)
        pw2w = torch.from_numpy(np.transpose(np.asarray(lay["conv"]["pw2"]["weight"]), (2, 1, 0)).copy())
        h = TF.conv1d(h, pw2w, torch.from_numpy(np.asarray(lay["conv"]["pw2"]["bias"])))
        xt3 = xt2 + h.transpose(1, 2)

        # ffn
        h = t_layer_norm(xt3, lay["norm_ff"])
        w1, b1 = tl(lay["ff"]["w1"])
        w2, b2 = tl(lay["ff"]["w2"])
        xt4 = xt3 + TF.linear(TF.silu(TF.linear(h, w1, b1)), w2, b2)
        gold = t_layer_norm(xt4, lay["norm_final"]).numpy()

        # --- mine ---
        from indextts_tpu.models.conformer import conformer_layer_apply

        mine = np.asarray(
            conformer_layer_apply(lay, jnp.asarray(x), jnp.asarray(pos.astype(np.float32)), jnp.asarray(mask), heads)
        )
        np.testing.assert_allclose(mine, gold, atol=2e-4, rtol=1e-3)

    def test_jit(self, setup):
        cfg, params = setup
        fn = jax.jit(lambda p, x, l: conformer_apply(p, cfg, x, l))
        x = jnp.asarray(rng.standard_normal((1, 41, 100)).astype(np.float32))
        out, mask = fn(params, x, jnp.asarray([41]))
        assert out.shape[-1] == 64


class TestPerceiver:
    @pytest.fixture(scope="class")
    def params(self):
        return init_perceiver(jax.random.PRNGKey(1), dim=96, dim_context=64, num_latents=32, heads=4, ff_mult=2)

    def test_shape(self, params):
        x = jnp.asarray(rng.standard_normal((2, 20, 64)).astype(np.float32))
        out = perceiver_apply(params, x, heads=4)
        assert out.shape == (2, 32, 96)
        assert np.isfinite(np.asarray(out)).all()

    def test_mask_invariance(self, params):
        """Masked context frames must not affect the latents."""
        x = rng.standard_normal((1, 20, 64)).astype(np.float32)
        mask = np.ones((1, 32 + 20), dtype=bool)
        out_a = perceiver_apply(params, jnp.asarray(x), jnp.asarray(mask), heads=4)
        x_mod = x.copy()
        x_mod[:, 15:] = 99.0  # garbage in masked region
        mask2 = mask.copy()
        mask2[:, 32 + 15 :] = False
        out_b = perceiver_apply(params, jnp.asarray(x_mod), jnp.asarray(mask2), heads=4)
        x_clean = x.copy()
        out_c = perceiver_apply(params, jnp.asarray(x_clean), jnp.asarray(mask2), heads=4)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_c), atol=1e-5)
        assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-6  # mask actually does something

    def test_queries_in_context(self, params):
        """cross_attn_include_queries=True: zero-length context still works
        because latents attend to themselves."""
        x = jnp.asarray(rng.standard_normal((1, 1, 64)).astype(np.float32))
        out = perceiver_apply(params, x, heads=4)
        assert out.shape == (1, 32, 96)


class TestConformerVariants:
    @pytest.mark.parametrize("input_layer,factor", [("conv2d6", 6), ("conv2d8", 8), ("linear", 1)])
    def test_subsampling_variants(self, input_layer, factor):
        cfg = ConditionModuleConfig(
            output_size=32, linear_units=64, attention_heads=4, num_blocks=1, input_layer=input_layer
        )
        params = init_conformer(jax.random.PRNGKey(0), cfg, input_size=100)
        t = 49
        x = jnp.asarray(rng.standard_normal((1, t, 100)).astype(np.float32))
        out, mask = conformer_apply(params, cfg, x, jnp.asarray([t]))
        assert out.shape[-1] == 32
        assert out.shape[1] == mask.shape[2]
        if factor > 1:
            assert abs(out.shape[1] - t // factor) <= 2
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.parametrize("pos_type", ["abs_pos", "no_pos"])
    def test_pos_enc_variants(self, pos_type):
        cfg = ConditionModuleConfig(
            output_size=32, linear_units=64, attention_heads=4, num_blocks=1,
            input_layer="conv2d2", pos_enc_layer_type=pos_type,
        )
        params = init_conformer(jax.random.PRNGKey(0), cfg, input_size=100)
        x = jnp.asarray(rng.standard_normal((2, 33, 100)).astype(np.float32))
        out, mask = conformer_apply(params, cfg, x, jnp.asarray([33, 20]))
        assert out.shape == (2, 16, 32)
        assert np.isfinite(np.asarray(out)).all()


class TestMelEncoder:
    def test_shapes(self):
        from indextts_tpu.models.gpt import init_mel_encoder, mel_encoder_apply

        params = init_mel_encoder(jax.random.PRNGKey(0), channels=64, mel_channels=80)
        mel = jnp.asarray(rng.standard_normal((2, 32, 80)).astype(np.float32))
        out = mel_encoder_apply(params, mel, channels=64)
        assert out.shape == (2, 8, 64)  # 4x reduction
        assert np.isfinite(np.asarray(out)).all()
