"""Fused anti-aliased snake activation as a single Pallas TPU kernel.

Replaces the reference's only native kernel (anti_alias_activation_cuda.cu:
fused 2x-upsample -> snake -> 2x-downsample with the hard-coded K=12
kaiser-sinc filter) with a TPU-native formulation. Instead of materializing
the 2x-rate signal, the kernel computes the two polyphase branches of the
upsampler directly and consumes them in the downsampler's polyphase form, so
everything is VPU shift-multiply-adds over one VMEM-resident tile:

    u_even[m] = 2 * sum_d  f[15-2d] * X[m+d+7],  d = 2..7
    u_odd[m]  = 2 * sum_d  f[16-2d] * X[m+d+7],  d = 3..8
    s_*       = snake(u_*)                        (per-channel alpha/beta)
    y[t]      = sum_j f[2j+1]*s_even[t+j+2] + f[2j]*s_odd[t+j+1],  j = 0..5

where X is the input pre-padded by PAD=16 replicate frames (edge replication
matches LowPassFilter1d/UpSample1d padding, alias_free_torch/resample.py).
The composed XLA path (ops/antialias.py) makes ~10 HBM passes over the
activation; this kernel makes 3 (the input is read twice — see below — plus
one write).

Layout: [B, T, C] (channels in lanes, time in sublanes); grid (B, T/Tt, C/Ct).
The halo problem (each tile needs 2*PAD extra frames) is solved by passing
the padded input TWICE with shifted BlockSpec index maps — block ti and block
ti+1 — so Pallas's automatic double-buffered pipeline feeds both the tile and
its right neighbor; the kernel slices the halo off the neighbor block.
(A manual-DMA double-buffer variant measured slower than this under Mosaic.)

The composed path is the correctness oracle; see tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops.antialias import kaiser_sinc_filter1d

PAD = 16  # halo on each side, covers all shifted reads below
KERNEL_SIZE = 12


def _taps():
    f = kaiser_sinc_filter1d(0.25, 0.3, KERNEL_SIZE).astype(np.float32)
    tap_e = [float(f[15 - 2 * d]) for d in range(2, 8)]  # f11 f9 f7 f5 f3 f1
    tap_o = [float(f[16 - 2 * d]) for d in range(3, 9)]  # f10 f8 f6 f4 f2 f0
    tap_ye = [float(f[2 * j + 1]) for j in range(6)]  # weights on s_even
    tap_yo = [float(f[2 * j]) for j in range(6)]  # weights on s_odd
    return tap_e, tap_o, tap_ye, tap_yo


def _kernel(x_ref, xn_ref, alpha_ref, beta_ref, out_ref, *, tile_t: int):
    """x_ref: this tile's [1, Tt, Ct] window of the padded input; xn_ref: the
    right-neighbor block (provides the 2*PAD halo). Output block [1, Tt, Ct]."""
    tap_e, tap_o, tap_ye, tap_yo = _taps()
    s = jnp.concatenate([x_ref[0], xn_ref[0, : 2 * PAD]], axis=0).astype(jnp.float32)
    l = tile_t + 8  # phase-array length

    ue = tap_e[0] * s[9 : 9 + l]
    uo = tap_o[0] * s[10 : 10 + l]
    for d in range(1, 6):
        ue = ue + tap_e[d] * s[9 + d : 9 + d + l]
        uo = uo + tap_o[d] * s[10 + d : 10 + d + l]
    ue = ue * 2.0
    uo = uo * 2.0

    alpha = alpha_ref[:].astype(jnp.float32)  # [1, Ct]
    beta = beta_ref[:].astype(jnp.float32)
    inv_beta = 1.0 / (beta + 1e-9)

    se = ue + inv_beta * jnp.sin(ue * alpha) ** 2
    so = uo + inv_beta * jnp.sin(uo * alpha) ** 2

    y = tap_ye[0] * se[2 : 2 + tile_t] + tap_yo[0] * so[1 : 1 + tile_t]
    for j in range(1, 6):
        y = y + tap_ye[j] * se[2 + j : 2 + j + tile_t] + tap_yo[j] * so[1 + j : 1 + j + tile_t]
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("alpha_logscale", "tile_t", "tile_c", "interpret", "exact_edges"))
def fused_anti_alias_snake(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: Optional[jnp.ndarray] = None,
    alpha_logscale: bool = False,
    tile_t: int = 1024,
    tile_c: int = 128,
    interpret: bool = False,
    exact_edges: bool = True,
) -> jnp.ndarray:
    """x: [B, T, C]; per-channel alpha (and beta for SnakeBeta). Returns
    [B, T, C] — numerically the composed upsample2x -> snake -> downsample2x
    path (anti_aliased_activation).

    exact_edges=False skips the composed-oracle patching of the outer ~4
    frames: the kernel then replicates the INPUT at the boundary — exactly
    the reference CUDA kernel's semantics (anti_alias_activation_cuda.cu
    pads the input 5/5/6), which differs from the reference's own torch
    path the same way. The patch costs two composed-path calls per site
    in-graph; serving paths use exact_edges=False.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = x.shape
    if beta is None:
        beta = alpha
    if alpha_logscale:
        a = jnp.exp(alpha)
        bt = jnp.exp(beta)
    else:
        a, bt = alpha, beta

    # narrow stages: never pad channels up to 128 — the explicit pad costs a
    # 5.3x copy at C=24 and the DMA then moves the junk too (Mosaic masks
    # sub-128 lane blocks itself); just tile the true channel width
    tile_c = min(tile_c, c)
    # pad: PAD replicate on the left; right side needs PAD halo + alignment +
    # one extra tile so the "neighbor block" exists for the last tile
    c_pad = -c % tile_c
    t_pad = -t % tile_t
    # single edge-mode pad covering halo + alignment + the extra neighbor
    # block (values beyond the halo are never read)
    tp_out = t + t_pad
    total = tp_out + tile_t  # center blocks [0, tp_out) + one neighbor block
    xp = jnp.pad(x, ((0, 0), (PAD, total - t - PAD), (0, 0)), mode="edge")
    if c_pad:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, c_pad)))
        a = jnp.pad(a, (0, c_pad), constant_values=1.0)
        bt = jnp.pad(bt, (0, c_pad), constant_values=1.0)
    cp = c + c_pad

    grid = (b, tp_out // tile_t, cp // tile_c)
    out = pl.pallas_call(
        functools.partial(_kernel, tile_t=tile_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_t, tile_c), lambda b, ti, ci: (b, ti, ci), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, tile_c), lambda b, ti, ci: (b, ti + 1, ci), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda b, ti, ci: (0, ci), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda b, ti, ci: (0, ci), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, tile_c), lambda b, ti, ci: (b, ti, ci), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp_out, cp), x.dtype),
        interpret=interpret,
    )(xp, xp, a[None, :], bt[None, :])
    out = out[:, :t, :c]

    if exact_edges:
        # Edge exactness: the composed path replicates the *upsampled* signal
        # at the downsampler boundary (filter.py:61-95), while the fused
        # kernel extends from the replicated input — these differ only within
        # 3 frames of each end. Recompute those frames with the composed
        # oracle on small slices and patch them in.
        from indextts_tpu.ops.antialias import anti_aliased_activation

        edge = min(4, t)
        win = min(64, t)
        head = anti_aliased_activation(x[:, :win], alpha, beta, alpha_logscale=alpha_logscale)
        tail = anti_aliased_activation(x[:, -win:], alpha, beta, alpha_logscale=alpha_logscale)
        out = out.at[:, :edge].set(head[:, :edge])
        out = out.at[:, -edge:].set(tail[:, -edge:])
    return out
