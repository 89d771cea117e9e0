"""INDEXTTS_WIDE_BRANCH routing parity: _amp_block1 with the fused
(activation -> conv) branch kernel must match the composed block at a wide
(C >= 128) stage width. Interpret mode on CPU; f32 so tolerances are tight."""

import jax
import jax.numpy as jnp
import numpy as np

import indextts_tpu.models.bigvgan as bv
from indextts_tpu.config import BigVGANConfig


def _cfg():
    return BigVGANConfig(
        num_mels=100,
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),),
        activation="snakebeta",
        snake_logscale=True,
        resblock="1",
        gpt_dim=16,
        speaker_embedding_dim=32,
        cond_d_vector_in_each_upsampling_layer=True,
        feat_upsample=False,
    )


def test_bf16_trunk_stays_bf16():
    """Pins the ecapa f32 speaker-embedding promotion fix: a bf16 generator
    call must keep the trunk (and output) bf16 — before the cast in
    bigvgan_apply, the f32 cond adds silently promoted every stage to f32
    (2x HBM bytes on the memory-bound vocoder, docs/PERF.md round 4)."""
    h = _cfg()
    p = bv.init_bigvgan(jax.random.PRNGKey(0), h)
    pb = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if jnp.issubdtype(v.dtype, jnp.floating) else v, p
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.bfloat16)
    mel = jnp.asarray(rng.standard_normal((1, 40, 100)), jnp.bfloat16)
    out = jax.jit(lambda p_, x_, m_: bv.bigvgan_apply(p_, h, x_, m_))(pb, x, mel)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_amp_block1_branch_matches_composed(monkeypatch):
    h = _cfg()
    c, k, dil = 128, 3, (1, 3, 5)
    p = bv._amp_block_init(jax.random.PRNGKey(0), h, c, k, dil)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 96, c)), jnp.float32) * 0.3

    monkeypatch.delenv("INDEXTTS_WIDE_BRANCH", raising=False)
    composed = np.asarray(bv._amp_block1(p, x, h, k, dil))
    monkeypatch.setenv("INDEXTTS_WIDE_BRANCH", "1")
    fused = np.asarray(bv._amp_block1(p, x, h, k, dil))
    np.testing.assert_allclose(fused, composed, atol=5e-4, rtol=5e-3)
