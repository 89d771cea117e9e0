"""Fused anti-aliased snake + trailing dilated dense conv, one pallas_call.

Round-4 wide-stage attack (the round-3 verdict's "fuse a LARGER region"):
the reference's CUDA kernel fuses the multi-pass up->snake->down region for
the same reason (anti_alias_activation_cuda.cu:35-41), and its AMPBlock
always follows that region with a dense dilated conv (models.py:50-74).
Fusing BOTH into one kernel amortizes the measured ~0.96 ms/op Pallas
materialization floor (docs/PERF.md #14/#15 decomposition probe) over the
activation AND the conv: the activation output never round-trips HBM, and
the per-invocation tax is paid once per (activation, conv) pair instead of
once per activation.

Layout follows ops/pallas/antialias_tmajor.py: blocks over [T, B, C] so tap
shifts are major-dim register offsets and the block layout bitcasts to the
graph's {2,0,1} physical layout. New machinery here:

- grid (n_tb, n_co) with co minor: at co==0 the kernel computes the
  anti-aliased activation for the block's EXTENDED time range (tile_t + 2*H
  rows, H = the conv's half receptive field) into a VMEM scratch buffer that
  persists across the co steps; each co step then runs the k dilated conv
  taps as dense [Tt·B, C] @ [C, tile_co] MXU matmuls against its weight
  block. The activation is computed ONCE per time block, not once per
  output-channel tile.
- the activation phase arrays (f32 at the 2x rate) are computed in channel
  chunks so the whole kernel stays inside the 16 MB scoped-VMEM budget at
  C=768 with full-C scratch.

Numerics: banded-matmul resamplers in the input dtype with f32 accumulation
and poly sin for bf16 — identical contract to _kernel_mxu. The conv
accumulates f32 like XLA's bf16 convs. Correctness oracle: composed
anti_aliased_activation -> ops.conv.conv1d (tests/test_pallas_branch.py);
edge frames (activation replicate-pad delta + the conv's zero padding) are
patched from the composed oracle on small windows, like the tmajor kernel's
exact_edges.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops.pallas.antialias import _taps

PAD = 16  # resampler halo rows per side (covers the 12-tap polyphase reads)


def _bands(text: int):
    """Banded resampler matrices sized for an EXTENDED activation range of
    `text` rows (tile_t + 2*H): same construction as antialias_tmajor._bands,
    one [l, Ts] matmul per phase for all 6 taps."""
    tap_e, tap_o, tap_ye, tap_yo = _taps()
    l = text + 8
    ts = text + 2 * PAD
    E = np.zeros((l, ts), np.float32)
    O = np.zeros((l, ts), np.float32)
    for d in range(6):
        E[np.arange(l), 9 + d + np.arange(l)] = 2.0 * tap_e[d]
        O[np.arange(l), 10 + d + np.arange(l)] = 2.0 * tap_o[d]
    Ye = np.zeros((text, l), np.float32)
    Yo = np.zeros((text, l), np.float32)
    for j in range(6):
        Ye[np.arange(text), 2 + j + np.arange(text)] = tap_ye[j]
        Yo[np.arange(text), 1 + j + np.arange(text)] = tap_yo[j]
    return E, O, Ye, Yo


def _kernel(
    x_ref,
    h_ref,
    alpha_ref,
    beta_ref,
    eo_ref,
    y_ref,
    w_ref,
    b_ref,
    out_ref,
    y_scr,
    *,
    tile_t: int,
    h_conv: int,
    k: int,
    dilation: int,
    act_chunk: int,
    poly_sin: bool,
):
    """x_ref [Tt, B, C] center rows; h_ref [1, 2*HIN, B, C] trailing halo;
    w_ref [k, C, Co_t]; y_scr [Tt + 2*h_conv, B, C] scratch (persists across
    the co grid dim). Activation computed once at co==0."""
    import jax.lax as lax
    from jax.experimental import pallas as pl

    from indextts_tpu.ops.activations import approx_sin

    sin_fn = approx_sin if poly_sin else jnp.sin
    co = pl.program_id(1)
    text = tile_t + 2 * h_conv

    @pl.when(co == 0)
    def _compute_activation():
        s = jnp.concatenate([x_ref[...], h_ref[0]], axis=0)  # [Ts, B, C]
        dt = s.dtype
        c_full = s.shape[-1]
        dn = (((1,), (0,)), ((), ()))
        # channel-chunked phases: the f32 2x-rate arrays are the VMEM peak
        for c0 in range(0, c_full, act_chunk):
            c1 = min(c0 + act_chunk, c_full)
            sl = s[:, :, c0:c1]
            ue = lax.dot_general(eo_ref[0], sl, dn, preferred_element_type=jnp.float32)
            uo = lax.dot_general(eo_ref[1], sl, dn, preferred_element_type=jnp.float32)
            alpha = alpha_ref[0, c0:c1].astype(jnp.float32)
            beta = beta_ref[0, c0:c1].astype(jnp.float32)
            inv_beta = 1.0 / (beta + 1e-9)
            se = (ue + inv_beta * sin_fn(ue * alpha) ** 2).astype(dt)
            so = (uo + inv_beta * sin_fn(uo * alpha) ** 2).astype(dt)
            y = lax.dot_general(y_ref[0], se, dn, preferred_element_type=jnp.float32)
            y = y + lax.dot_general(y_ref[1], so, dn, preferred_element_type=jnp.float32)
            y_scr[:, :, c0:c1] = y.astype(y_scr.dtype)

    dn_c = (((2,), (0,)), ((), ()))  # contract C of [Tt, B, C] with [C, Co_t]
    acc = lax.dot_general(
        y_scr[0:tile_t], w_ref[0], dn_c, preferred_element_type=jnp.float32
    )
    for j in range(1, k):
        acc = acc + lax.dot_general(
            y_scr[j * dilation : j * dilation + tile_t],
            w_ref[j],
            dn_c,
            preferred_element_type=jnp.float32,
        )
    out_ref[...] = (acc + b_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def aa_snake_dconv_ref(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: Optional[jnp.ndarray],
    w: jnp.ndarray,
    bias: jnp.ndarray,
    dilation: int,
    alpha_logscale: bool = False,
) -> jnp.ndarray:
    """Composed oracle: anti_aliased_activation -> conv1d 'same' dilated."""
    from indextts_tpu.ops.antialias import anti_aliased_activation
    from indextts_tpu.ops.conv import conv1d

    k = w.shape[0]
    y = anti_aliased_activation(x, alpha, beta, alpha_logscale=alpha_logscale)
    return conv1d(y, w, bias, padding=(k * dilation - dilation) // 2, dilation=dilation)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dilation",
        "alpha_logscale",
        "tile_t",
        "tile_co",
        "interpret",
        "poly_sin",
    ),
)
def fused_aa_snake_dconv_tmajor(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: Optional[jnp.ndarray],
    w: jnp.ndarray,
    bias: jnp.ndarray,
    dilation: int = 1,
    alpha_logscale: bool = False,
    tile_t: Optional[int] = None,
    tile_co: int = 128,
    interpret: bool = False,
    poly_sin: Optional[bool] = None,
) -> jnp.ndarray:
    """x [B, T, C]; w [K, C, C] (conv1d layout); returns
    conv1d(anti_aliased_activation(x, alpha, beta), w, bias,
    padding='same', dilation=dilation) — one AMPBlock half-branch
    (reference models.py:65-70) in a single kernel invocation."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = x.shape
    k = w.shape[0]
    h_conv = (k - 1) * dilation // 2
    if beta is None:
        beta = alpha
    if alpha_logscale:
        a = jnp.exp(alpha)
        bt = jnp.exp(beta)
    else:
        a, bt = alpha, beta

    if tile_t is None:
        # VMEM-driven: full-C scratch + chunked f32 phases; smaller blocks at
        # wider C keep the budget. These land ~10-12 MB at B=8.
        tile_t = {768: 128, 384: 256, 192: 512}.get(c, 512 if c <= 192 else 128)
    tile_t = min(tile_t, max(64, t))
    hin = h_conv + PAD
    n_tb = -(-t // tile_t)
    total = n_tb * tile_t + 2 * hin
    xt = jnp.transpose(x, (1, 0, 2))  # [T, B, C] — bitcast under {2,0,1}
    xp = jnp.pad(xt, ((hin, total - t - hin), (0, 0), (0, 0)), mode="edge")

    # Mosaic needs the lane (minor) dim at 128-multiples to lower the 3D
    # dot_generals (C=192 fails with a tpu.reshape diagnostic): pad channels.
    # Padded inputs are zero, padded alpha/beta are 1 -> activation(0) = 0,
    # and the conv's padded INPUT-channel weight rows are zero, so the fused
    # output is exact on the first `c` output channels.
    cin_pad = -c % 128
    wk = w
    if cin_pad:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, cin_pad)))
        a = jnp.pad(a, (0, cin_pad), constant_values=1.0)
        bt = jnp.pad(bt, (0, cin_pad), constant_values=1.0)
        wk = jnp.pad(w, ((0, 0), (0, cin_pad), (0, 0)))
    cp = c + cin_pad

    xc = xp[: n_tb * tile_t]
    halo = jnp.stack(
        [
            jax.lax.slice_in_dim(xp, (ti + 1) * tile_t, (ti + 1) * tile_t + 2 * hin, axis=0)
            for ti in range(n_tb)
        ]
    )  # [n_tb, 2*HIN, B, C]

    text = tile_t + 2 * h_conv
    E, O, Ye, Yo = _bands(text)
    l, ts = E.shape
    eo = jnp.asarray(np.stack([E, O]), x.dtype)
    yb = jnp.asarray(np.stack([Ye, Yo]), x.dtype)

    tile_co = min(tile_co, cp)
    n_co = -(-c // tile_co)
    co_pad = n_co * tile_co - c
    wv = wk.astype(x.dtype)
    bv = bias.astype(x.dtype)
    if co_pad:
        wv = jnp.pad(wv, ((0, 0), (0, 0), (0, co_pad)))
        bv = jnp.pad(bv, (0, co_pad))

    # the f32 phase arrays are the in-kernel VMEM peak: [l, B, act_chunk] f32
    # x2 phases; halving the chunk at C=768 brings the k=11,d=5 instance from
    # 17.2M (scoped OOM) under the 16M limit
    act_chunk = 128 if cp >= 768 else min(cp, 256)
    ps = (x.dtype == jnp.bfloat16) if poly_sin is None else poly_sin

    grid = (n_tb, n_co)
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            tile_t=tile_t,
            h_conv=h_conv,
            k=k,
            dilation=dilation,
            act_chunk=act_chunk,
            poly_sin=ps,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_t, b, cp), lambda ti, co: (ti, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * hin, b, cp), lambda ti, co: (ti, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda ti, co: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda ti, co: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, l, ts), lambda ti, co: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, text, l), lambda ti, co: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cp, tile_co), lambda ti, co: (0, 0, co), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_co), lambda ti, co: (0, co), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_t, b, tile_co), lambda ti, co: (ti, 0, co), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tb * tile_t, b, n_co * tile_co), x.dtype),
        scratch_shapes=[pltpu.VMEM((text, b, cp), x.dtype)],
        # raise the 16 MB default scoped-VMEM limit (v5e has 128 MB): the
        # full-C scratch + double-buffered operands peak ~17 MB at the widest
        # (k, d, C) instances
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(xc, halo, a[None, :], bt[None, :], eo, yb, wv, bv[None, :])
    out = jnp.transpose(out[:t, :, :c], (1, 0, 2))  # [B, T, Co]

    # Edge patch: within h_conv+4 frames of each end the kernel differs from
    # the oracle (activation input-side replicate pad vs the composed path's
    # upsampled-signal replicate, PLUS the conv's zero padding vs the
    # kernel's replicated activation tails). Recompute those frames composed.
    edge = min(h_conv + 4, t)
    win = min(t, max(64, edge + h_conv + 12))
    head = aa_snake_dconv_ref(
        x[:, :win], alpha, beta, w, bias, dilation, alpha_logscale=alpha_logscale
    )
    tail = aa_snake_dconv_ref(
        x[:, -win:], alpha, beta, w, bias, dilation, alpha_logscale=alpha_logscale
    )
    out = out.at[:, :edge].set(head[:, :edge])
    out = out.at[:, -edge:].set(tail[:, -edge:])
    return out
