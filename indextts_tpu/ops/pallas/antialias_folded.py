"""Fused anti-aliased snake activation on the phase-FOLDED grid (Pallas TPU).

The folded XLA path (ops/antialias.py: upsample1d_folded -> snake ->
downsample1d_folded) makes ~4 HBM passes per activation and pays the
diagonal-dense conv lowering three times. This kernel runs the whole
activation in one VMEM pass over [B, N, s*C] blocks:

    I = (x frames n-HU..n+HU concatenated on lanes) @ Wu      (MXU, bf16)
    I = snake(I)                                               (VPU, f32)
    z = (I frames n-HD..n+HD concatenated on lanes) @ Wd       (MXU, bf16)

Wu/Wd are the exact folded resampler kernels from ops/antialias.py
(_folded_up_kernel/_folded_down_kernel), reshaped to stacked-tap matrices, so
the math is bit-compatible with the folded XLA path everywhere except the
outer HD frames per side (the downsampler's replicate pad references the
upsampled signal, which the kernel extends from the replicated input instead
— same divergence and same fix as ops/pallas/antialias.py: the caller patches
those frames with the XLA oracle).

Halo: the replicate-padded input is passed twice with BlockSpec index maps
ti and ti+1; the kernel takes 2H extra frames from the right neighbor
(the same scheme as ops/pallas/antialias.py, which measured faster than
manual-DMA double buffering).

Reference behavior: indextts/BigVGAN/alias_free_activation/cuda/
anti_alias_activation_cuda.cu (fused up2x -> snake -> down2x); this is the
TPU-native equivalent at full lane width.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops.activations import approx_sin
from indextts_tpu.ops.antialias import (
    _folded_down_kernel,
    _folded_up_kernel,
    _replicate_pad_frames,
)


def _kernel(x_ref, xn_ref, a_ref, b_ref, wu_ref, wd_ref, out_ref, *, nb, hu, hd, use_approx_sin):
    """x_ref: [B, nb, L] block of the replicate-padded folded signal (origin
    shifted by H = hu+hd frames); xn_ref: right-neighbor block (halo).
    Output: [B, nb, L] of signal frames [ti*nb, ti*nb+nb).

    Tap shifts are applied AFTER per-tap aligned matmuls (Mosaic cannot
    lane-concat sublane-shifted slices, but shifted-slice adds lower fine —
    same pattern as ops/pallas/antialias.py). Total MXU FLOPs are identical
    to the stacked-kernel form."""
    h = hu + hd
    ku = 2 * hu + 1
    kd = 2 * hd + 1
    bsz = x_ref.shape[0]
    l = x_ref.shape[-1]
    nw = nb + 2 * h
    ni = nb + 2 * hd

    xw = jnp.concatenate([x_ref[...], xn_ref[:, : 2 * h, :]], axis=1)  # [B, nw, L]
    xm = xw.reshape(bsz * nw, l)
    # upsample: I[f] for signal frames f in [base-hd, base+nb+hd); the per-tap
    # product P_j = xw @ Wu[j] contributes at frame offset j
    i_raw = None
    for j in range(ku):
        p = jax.lax.dot_general(
            xm,
            wu_ref[j * l : (j + 1) * l, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bsz, nw, 2 * l)
        term = p[:, j : j + ni, :]
        i_raw = term if i_raw is None else i_raw + term

    alpha = a_ref[...].reshape(1, 1, -1)  # [1, 1, 2L] f32 (exp already applied)
    beta = b_ref[...].reshape(1, 1, -1)
    sin_fn = approx_sin if use_approx_sin else jnp.sin
    i_act = i_raw + (1.0 / (beta + 1e-9)) * sin_fn(i_raw * alpha) ** 2
    i_act = i_act.astype(x_ref.dtype)  # [B, ni, 2L]

    im = i_act.reshape(bsz * ni, 2 * l)
    z = None
    for j in range(kd):
        q = jax.lax.dot_general(
            im,
            wd_ref[j * 2 * l : (j + 1) * 2 * l, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bsz, ni, l)
        term = q[:, j : j + nb, :]
        z = term if z is None else z + term
    out_ref[...] = z.astype(out_ref.dtype)


def _pick_block(n: int, b: int, h: int) -> int:
    # scratch per block ~ 9 f32-equivalent copies of [B, nb, 2L]; the TPU
    # scoped-vmem stack limit is ~16-64 MB, so keep blocks modest
    nb = max(64, (128 * 8) // max(b, 8))
    while nb > 2 * h + 2 and n % nb:
        nb //= 2
    return nb


@functools.partial(
    jax.jit, static_argnames=("alpha_logscale", "s", "channels", "interpret", "approx_sin_")
)
def fused_folded_aa(
    xf: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: Optional[jnp.ndarray],
    alpha_logscale: bool,
    s: int,
    channels: int,
    interpret: bool = False,
    approx_sin_: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused folded anti-aliased activation: xf [B, N, s*C] -> [B, N, s*C].

    Numerically equals anti_aliased_activation_folded(unfold, ... s=s) on the
    folded grid (the outer `hd` frames per side are patched with the XLA
    path). approx_sin_: None = approximate iff bf16, matching ops.activations.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from indextts_tpu.ops.antialias import downsample1d_folded, snake_folded, upsample1d_folded

    b, n, l = xf.shape
    c = channels
    wu_np, (hu, hu_r) = _folded_up_kernel(s, c)
    wd_np, (hd, hd_r) = _folded_down_kernel(s, c)
    assert hu == hu_r and hd == hd_r, "resampler halos expected symmetric"
    h = hu + hd
    nb = _pick_block(n, b, h)

    def xla_path(x):
        y = upsample1d_folded(x, s, c)
        y = snake_folded(y, alpha, beta, alpha_logscale, 2 * s)
        return downsample1d_folded(y, s, c)

    if n % nb or nb < 2 * h + 2:
        return xla_path(xf)

    if alpha_logscale:
        a1 = jnp.exp(alpha.astype(jnp.float32))
        b1 = jnp.exp((beta if beta is not None else alpha).astype(jnp.float32))
    else:
        a1 = alpha.astype(jnp.float32)
        b1 = (beta if beta is not None else alpha).astype(jnp.float32)
    a2 = jnp.tile(a1, 2 * s)  # [2L], lane r*C+c -> alpha[c]
    b2 = jnp.tile(b1, 2 * s)

    ku = 2 * hu + 1
    kd = 2 * hd + 1
    wu = jnp.asarray(wu_np.reshape(ku * l, 2 * l), xf.dtype)
    wd = jnp.asarray(wd_np.reshape(kd * 2 * l, l), xf.dtype)

    use_approx = (xf.dtype == jnp.bfloat16) if approx_sin_ is None else approx_sin_

    # pad: h replicate frames left; right up to (grid+1) blocks so the last
    # block's neighbor exists (all pad frames replicate the edge sample)
    xp = _replicate_pad_frames(xf, c, (h, nb - h))
    grid = (n // nb,)
    out = pl.pallas_call(
        functools.partial(_kernel, nb=nb, hu=hu, hd=hd, use_approx_sin=use_approx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, nb, l), lambda ti: (0, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, nb, l), lambda ti: (0, ti + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a2.shape[0],), lambda ti: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((b2.shape[0],), lambda ti: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(wu.shape, lambda ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wd.shape, lambda ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, nb, l), lambda ti: (0, ti, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, l), xf.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, xp, a2, b2, wu, wd)

    # Edge exactness: the kernel extends the upsampled signal from the
    # replicated input; the true downsampler replicates the upsampled edge
    # sample. Only the outer hd frames differ — recompute via the XLA path.
    edge = hd
    win = min(4 * h + 2 * edge + 2, n)
    head = xla_path(xf[:, :win])
    tail = xla_path(xf[:, -win:])
    out = jax.lax.dynamic_update_slice(out, head[:, :edge], (0, 0, 0))
    out = jax.lax.dynamic_update_slice(out, tail[:, -edge:], (0, n - edge, 0))
    return out
