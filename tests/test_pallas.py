"""Fused Pallas anti-alias kernel vs the composed XLA oracle (interpret mode
on CPU; the compiled path is exercised on real TPU by bench/vocoder runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.ops.antialias import anti_aliased_activation
from indextts_tpu.ops.pallas.antialias import fused_anti_alias_snake

rng = np.random.default_rng(0)


@pytest.mark.parametrize(
    "b,t,c,tile_t,tile_c",
    [
        (2, 300, 24, 128, 128),  # unaligned T, small C (late vocoder stages)
        (1, 1000, 130, 256, 128),  # channel padding
        (1, 64, 8, 128, 128),  # T smaller than the tile
        (1, 512, 256, 256, 128),  # aligned everything
    ],
)
def test_matches_composed_snakebeta(b, t, c, tile_t, tile_c):
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    alpha = (rng.standard_normal(c) * 0.3).astype(np.float32)
    beta = (rng.standard_normal(c) * 0.3).astype(np.float32)
    gold = np.asarray(
        anti_aliased_activation(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta), alpha_logscale=True)
    )
    mine = np.asarray(
        fused_anti_alias_snake(
            jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta),
            alpha_logscale=True, tile_t=tile_t, tile_c=tile_c, interpret=True,
        )
    )
    assert mine.shape == gold.shape
    np.testing.assert_allclose(mine, gold, atol=2e-5)


def test_matches_composed_snake_no_beta():
    x = rng.standard_normal((1, 200, 16)).astype(np.float32)
    alpha = np.abs(rng.standard_normal(16)).astype(np.float32)
    gold = np.asarray(anti_aliased_activation(jnp.asarray(x), jnp.asarray(alpha), None, alpha_logscale=False))
    mine = np.asarray(
        fused_anti_alias_snake(jnp.asarray(x), jnp.asarray(alpha), None, alpha_logscale=False, tile_t=128, interpret=True)
    )
    np.testing.assert_allclose(mine, gold, atol=2e-5)


def test_bigvgan_pallas_path_matches_composed():
    """Full vocoder forward with use_pallas=True (interpret) == composed."""
    from indextts_tpu.models.bigvgan import bigvgan_apply, init_bigvgan
    from tests.test_vocoder import small_cfg

    h = small_cfg()
    params = init_bigvgan(jax.random.PRNGKey(1), h)
    x = jnp.asarray(rng.standard_normal((1, 8, 16)).astype(np.float32))
    mel = jnp.asarray(rng.standard_normal((1, 40, 100)).astype(np.float32))
    gold = np.asarray(bigvgan_apply(params, h, x, mel))
    mine = np.asarray(bigvgan_apply(params, h, x, mel, use_pallas=True))
    np.testing.assert_allclose(mine, gold, atol=5e-5)


# ---- fused FOLDED activation kernel (ops/pallas/antialias_folded.py) ----

from indextts_tpu.ops.antialias import (
    downsample1d_folded,
    snake_folded,
    upsample1d_folded,
)
from indextts_tpu.ops.pallas.antialias_folded import fused_folded_aa


@pytest.mark.parametrize("s,c,n", [(8, 24, 256), (4, 48, 256), (2, 96, 128)])
def test_fused_folded_matches_xla_path(s, c, n):
    """fused_folded_aa (interpret) == up/snake/down on the folded grid."""
    x = rng.standard_normal((2, n, s * c)).astype(np.float32)
    alpha = (rng.standard_normal(c) * 0.3).astype(np.float32)
    beta = (rng.standard_normal(c) * 0.3).astype(np.float32)
    xj, aj, bj = jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta)
    y = upsample1d_folded(xj, s, c)
    y = snake_folded(y, aj, bj, True, 2 * s)
    gold = np.asarray(downsample1d_folded(y, s, c))
    mine = np.asarray(fused_folded_aa(xj, aj, bj, True, s, c, interpret=True))
    assert mine.shape == gold.shape
    np.testing.assert_allclose(mine, gold, atol=3e-5)


def test_fused_folded_small_n_falls_back():
    """N not divisible by the block (or too small) routes to the XLA path."""
    s, c = 4, 48
    x = rng.standard_normal((1, 20, s * c)).astype(np.float32)
    alpha = np.abs(rng.standard_normal(c)).astype(np.float32)
    xj, aj = jnp.asarray(x), jnp.asarray(alpha)
    y = upsample1d_folded(xj, s, c)
    y = snake_folded(y, aj, None, False, 2 * s)
    gold = np.asarray(downsample1d_folded(y, s, c))
    mine = np.asarray(fused_folded_aa(xj, aj, None, False, s, c, interpret=True))
    np.testing.assert_allclose(mine, gold, atol=3e-5)


# ---- time-major wide-stage kernel (ops/pallas/antialias_tmajor.py) ----

from indextts_tpu.ops.pallas.antialias_tmajor import fused_anti_alias_snake_tmajor


@pytest.mark.parametrize(
    "b,t,c,tile_t,tile_c",
    [
        (2, 300, 24, 128, 128),  # unaligned T, halo spills across blocks
        (1, 1000, 130, 256, 128),  # channel padding
        (1, 64, 8, 128, 128),  # T smaller than the tile
        (8, 512, 256, 256, 128),  # bench batch, aligned
        (2, 96, 192, 512, 128),  # wide stage, single short block
    ],
)
def test_tmajor_matches_composed(b, t, c, tile_t, tile_c):
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    alpha = (rng.standard_normal(c) * 0.3).astype(np.float32)
    beta = (rng.standard_normal(c) * 0.3).astype(np.float32)
    gold = np.asarray(
        anti_aliased_activation(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta), alpha_logscale=True)
    )
    mine = np.asarray(
        fused_anti_alias_snake_tmajor(
            jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta),
            alpha_logscale=True, tile_t=tile_t, tile_c=tile_c, interpret=True,
        )
    )
    assert mine.shape == gold.shape
    np.testing.assert_allclose(mine, gold, atol=2e-5)


def test_tmajor_snake_no_beta():
    x = rng.standard_normal((1, 200, 16)).astype(np.float32)
    alpha = np.abs(rng.standard_normal(16)).astype(np.float32)
    gold = np.asarray(anti_aliased_activation(jnp.asarray(x), jnp.asarray(alpha), None, alpha_logscale=False))
    mine = np.asarray(
        fused_anti_alias_snake_tmajor(jnp.asarray(x), jnp.asarray(alpha), None, alpha_logscale=False, tile_t=128, interpret=True)
    )
    np.testing.assert_allclose(mine, gold, atol=2e-5)


def test_tmajor_bigvgan_routing(monkeypatch):
    """INDEXTTS_WIDE_TMAJOR=1 vocoder forward == default routing (wide stages
    only; narrow stages keep the folded path either way). small_cfg widened so
    the first stage has C=128 and actually routes through the kernel."""
    import dataclasses

    from indextts_tpu.models.bigvgan import bigvgan_apply, init_bigvgan
    from tests.test_vocoder import small_cfg

    h = dataclasses.replace(small_cfg(), upsample_initial_channel=256)
    params = init_bigvgan(jax.random.PRNGKey(1), h)
    x = jnp.asarray(rng.standard_normal((1, 8, 16)).astype(np.float32))
    mel = jnp.asarray(rng.standard_normal((1, 40, 100)).astype(np.float32))
    gold = np.asarray(bigvgan_apply(params, h, x, mel))
    monkeypatch.setenv("INDEXTTS_WIDE_TMAJOR", "1")
    mine = np.asarray(bigvgan_apply(params, h, x, mel))
    np.testing.assert_allclose(mine, gold, atol=5e-5)


@pytest.mark.parametrize("mxu", [False, True])
def test_tmajor_poly_sin_matches_composed(mxu):
    """poly_sin=True (the bf16 default since the round-3 decomposition probe;
    same approx_sin as the composed path's bf16 snake) stays within the
    polynomial's 3.64e-5 sin error of the exact-sin oracle in fp32."""
    b, t, c = 2, 300, 24
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    alpha = (rng.standard_normal(c) * 0.3).astype(np.float32)
    beta = (rng.standard_normal(c) * 0.3).astype(np.float32)
    gold = np.asarray(
        anti_aliased_activation(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta), alpha_logscale=True)
    )
    mine = np.asarray(
        fused_anti_alias_snake_tmajor(
            jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta),
            alpha_logscale=True, tile_t=128, interpret=True, mxu=mxu, poly_sin=True,
        )
    )
    np.testing.assert_allclose(mine, gold, atol=5e-4)


@pytest.mark.parametrize("b,t,c,tile_t", [(2, 300, 24, 128), (8, 512, 256, 256)])
def test_tmajor_mxu_matches_composed(b, t, c, tile_t):
    """mxu=True (banded-matmul taps) is numerically identical in fp32."""
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    alpha = (rng.standard_normal(c) * 0.3).astype(np.float32)
    beta = (rng.standard_normal(c) * 0.3).astype(np.float32)
    gold = np.asarray(
        anti_aliased_activation(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta), alpha_logscale=True)
    )
    mine = np.asarray(
        fused_anti_alias_snake_tmajor(
            jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta),
            alpha_logscale=True, tile_t=tile_t, interpret=True, mxu=True,
        )
    )
    np.testing.assert_allclose(mine, gold, atol=2e-5)
