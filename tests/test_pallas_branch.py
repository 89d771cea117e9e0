"""Parity: fused anti-aliased snake + dilated dense conv branch kernel
(ops/pallas/aa_conv_branch.py) vs the composed oracle
(anti_aliased_activation -> conv1d), interpret mode on CPU.

The fused region mirrors one AMPBlock half-branch (reference
BigVGAN/models.py:65-70: act -> dilated conv); the reference's own CUDA
kernel fuses the activation region for the same amortization reason
(anti_alias_activation_cuda.cu:35-41).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu.ops.pallas.aa_conv_branch import (
    aa_snake_dconv_ref,
    fused_aa_snake_dconv_tmajor,
)


def _mk(b, t, c, k, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32) * 0.5
    alpha = jnp.asarray(rng.standard_normal((c,)), jnp.float32) * 0.3
    beta = jnp.asarray(rng.standard_normal((c,)), jnp.float32) * 0.3
    w = jnp.asarray(rng.standard_normal((k, c, c)), jnp.float32) * (1.0 / np.sqrt(c * k))
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32) * 0.1
    return x, alpha, beta, w, bias


@pytest.mark.parametrize("k,d", [(3, 1), (7, 3), (11, 5), (11, 1)])
def test_branch_parity_kd(k, d):
    x, alpha, beta, w, bias = _mk(2, 192, 8, k, seed=k * 10 + d)
    ref = aa_snake_dconv_ref(x, alpha, beta, w, bias, d, alpha_logscale=True)
    got = fused_aa_snake_dconv_tmajor(
        x, alpha, beta, w, bias, d, alpha_logscale=True,
        tile_t=64, tile_co=8, interpret=True, poly_sin=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-3)


def test_branch_parity_snake_plain():
    # alpha_logscale=False and beta=None (Snake, not SnakeBeta)
    x, alpha, _, w, bias = _mk(1, 100, 16, 7, seed=3)
    ref = aa_snake_dconv_ref(x, alpha, None, w, bias, 2, alpha_logscale=False)
    got = fused_aa_snake_dconv_tmajor(
        x, alpha, None, w, bias, 2, alpha_logscale=False,
        tile_t=64, tile_co=16, interpret=True, poly_sin=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-3)


def test_branch_parity_channel_tiling_and_chunking():
    # c > tile_co and c > act_chunk both exercised; t not divisible by tile_t
    x, alpha, beta, w, bias = _mk(2, 150, 24, 3, seed=7)
    ref = aa_snake_dconv_ref(x, alpha, beta, w, bias, 1, alpha_logscale=True)
    got = fused_aa_snake_dconv_tmajor(
        x, alpha, beta, w, bias, 1, alpha_logscale=True,
        tile_t=64, tile_co=8, interpret=True, poly_sin=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-3)


def test_branch_parity_bf16_poly():
    # bf16 + poly sin: the serving configuration; compare against the bf16
    # composed path at bf16-appropriate tolerance
    x, alpha, beta, w, bias = _mk(2, 128, 8, 7, seed=11)
    xb = x.astype(jnp.bfloat16)
    ref = aa_snake_dconv_ref(xb, alpha, beta, w, bias, 1, alpha_logscale=True)
    got = fused_aa_snake_dconv_tmajor(
        xb, alpha, beta, w, bias, 1, alpha_logscale=True,
        tile_t=64, tile_co=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.06, rtol=0.06
    )


def test_branch_short_t():
    # t smaller than one tile: single block, patches overlap
    x, alpha, beta, w, bias = _mk(1, 48, 8, 11, seed=5)
    ref = aa_snake_dconv_ref(x, alpha, beta, w, bias, 5, alpha_logscale=True)
    got = fused_aa_snake_dconv_tmajor(
        x, alpha, beta, w, bias, 5, alpha_logscale=True,
        tile_t=64, tile_co=8, interpret=True, poly_sin=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-3)
