"""ECAPA + BigVGAN vocoder stack tests (shapes, interpolation parity vs torch,
masking behavior, discriminators and GAN losses)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.config import BigVGANConfig
from indextts_tpu.models.bigvgan import (
    bigvgan_apply,
    discriminator_loss,
    feature_loss,
    generator_loss,
    init_bigvgan,
    init_mpd,
    init_mrd,
    linear_interp_x4,
    mpd_apply,
    mrd_apply,
)
from indextts_tpu.models.ecapa import ecapa_apply, init_ecapa

rng = np.random.default_rng(7)


def small_cfg():
    return BigVGANConfig(
        gpt_dim=16,
        upsample_initial_channel=32,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        resblock="1",
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        activation="snakebeta",
        snake_logscale=True,
        feat_upsample=True,
        cond_d_vector_in_each_upsampling_layer=True,
        num_mels=100,
        speaker_embedding_dim=32,
        sampling_rate=24000,
        resolutions=((128, 32, 128), (256, 64, 256), (64, 16, 64)),
    )


class TestInterp:
    def test_linear_interp_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((2, 13, 5)).astype(np.float32)
        gold = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x).transpose(1, 2), scale_factor=[4], mode="linear"
            )
            .transpose(1, 2)
            .numpy()
        )
        mine = np.asarray(linear_interp_x4(jnp.asarray(x)))
        assert mine.shape == gold.shape
        np.testing.assert_allclose(mine, gold, atol=1e-5)


class TestECAPA:
    @pytest.fixture(scope="class")
    def params(self):
        return init_ecapa(jax.random.PRNGKey(0), input_size=100, lin_neurons=32)

    def test_shape(self, params):
        x = jnp.asarray(rng.standard_normal((2, 40, 100)).astype(np.float32))
        out = ecapa_apply(params, x)
        assert out.shape == (2, 1, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_full_lengths_equals_none(self, params):
        x = jnp.asarray(rng.standard_normal((2, 40, 100)).astype(np.float32))
        a = np.asarray(ecapa_apply(params, x))
        b = np.asarray(ecapa_apply(params, x, lengths=jnp.ones((2,))))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_batch_consistency(self, params):
        """Row i of a batched call == the same row alone (BN eval mode has no
        cross-batch coupling)."""
        x = rng.standard_normal((3, 40, 100)).astype(np.float32)
        full = np.asarray(ecapa_apply(params, jnp.asarray(x)))
        one = np.asarray(ecapa_apply(params, jnp.asarray(x[1:2])))
        np.testing.assert_allclose(full[1:2], one, atol=1e-4)


class TestBigVGAN:
    @pytest.fixture(scope="class")
    def setup(self):
        h = small_cfg()
        params = init_bigvgan(jax.random.PRNGKey(1), h)
        return h, params

    def test_forward_shape(self, setup):
        h, params = setup
        x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
        mel = jnp.asarray(rng.standard_normal((2, 40, 100)).astype(np.float32))
        wav = bigvgan_apply(params, h, x, mel)
        # 10 latents * 4 (feat_upsample) * 8 (upsample rates) samples
        assert wav.shape == (2, 10 * 4 * 4 * 2, 1)
        out = np.asarray(wav)
        assert np.isfinite(out).all()
        assert (np.abs(out) <= 1.0).all()  # tanh output

    def test_precomputed_speaker_embedding(self, setup):
        h, params = setup
        from indextts_tpu.models.ecapa import ecapa_apply

        x = jnp.asarray(rng.standard_normal((1, 6, 16)).astype(np.float32))
        mel = jnp.asarray(rng.standard_normal((1, 40, 100)).astype(np.float32))
        spk = ecapa_apply(params["speaker_encoder"], mel)
        a = np.asarray(bigvgan_apply(params, h, x, mel))
        b = np.asarray(bigvgan_apply(params, h, x, mel, speaker_embedding=spk))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_folded_routing_matches_composed(self, setup, monkeypatch):
        """Full generator output is invariant to the folded/composed routing
        threshold (the folded path must be an exact reformulation)."""
        import indextts_tpu.models.bigvgan as bv

        h, params = setup
        x = jnp.asarray(rng.standard_normal((1, 8, 16)).astype(np.float32))
        mel = jnp.asarray(rng.standard_normal((1, 40, 100)).astype(np.float32))
        folded = np.asarray(bigvgan_apply(params, h, x, mel))
        monkeypatch.setattr(bv, "_FOLDED_MAX_CHANNELS", -1)
        composed = np.asarray(bigvgan_apply(params, h, x, mel))
        np.testing.assert_allclose(folded, composed, atol=2e-5)

    def test_jit_compiles(self, setup):
        h, params = setup
        fn = jax.jit(lambda p, x, m: bigvgan_apply(p, h, x, m))
        x = jnp.asarray(rng.standard_normal((1, 6, 16)).astype(np.float32))
        mel = jnp.asarray(rng.standard_normal((1, 40, 100)).astype(np.float32))
        out = fn(params, x, mel)
        assert out.shape == (1, 6 * 4 * 8, 1)


class TestDiscriminators:
    def test_mpd_mrd_and_losses(self):
        h = small_cfg()
        mpd = init_mpd(jax.random.PRNGKey(2), h)
        mrd = init_mrd(jax.random.PRNGKey(3), h)
        y = jnp.asarray(rng.standard_normal((1, 1200, 1)).astype(np.float32) * 0.1)
        y_hat = jnp.asarray(rng.standard_normal((1, 1200, 1)).astype(np.float32) * 0.1)
        rs, gs, fr, fg = mpd_apply(mpd, h, y, y_hat)
        assert len(rs) == len(h.mpd_reshapes)
        d_loss, _, _ = discriminator_loss(rs, gs)
        g_loss, _ = generator_loss(gs)
        f_loss = feature_loss(fr, fg)
        assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss)) and np.isfinite(float(f_loss))
        rs2, gs2, fr2, fg2 = mrd_apply(mrd, h, y, y_hat)
        assert len(rs2) == len(h.resolutions)
        d2, _, _ = discriminator_loss(rs2, gs2)
        assert np.isfinite(float(d2))
