"""Fused anti-aliased snake activation, TIME-MAJOR Pallas formulation.

Round-3 wide-stage attacks #14 (VPU taps) and #15 (MXU banded matmuls).
MEASURED NEGATIVE — kept opt-in (`INDEXTTS_WIDE_TMAJOR=1`) as an artifact.

Attribution CORRECTED by the late-round-3 decomposition probe
(tools/profile_wide_act.py `tmajor_wrapper`/`tmajor_ident` variants): the
original conclusion blamed "the Pallas block pipeline", but at
[8, 12800, 384] the wrapper costs only 0.34 ms/op and wrapper+full-DMA
passthrough 0.96 — the 3.2-3.7 ms/op total was ~2.7 ms of KERNEL BODY
arithmetic: exact f32 jnp.sin at the 2x rate (~1.2 ms; the composed path's
bf16 snake uses the cheap approx_sin polynomial) plus 24 VPU tap MACs
(~1.5 ms; composed rides the MXU through conv ops). With poly_sin=True
(now the bf16 default, matching composed semantics) the VPU body drops to
2.49 and the MXU-banded body to 1.69 ms/op — still ~1.7-2.6x the composed
path in the same run (0.66), because the ident floor (0.96: a Pallas
copy at ~253 GB/s effective vs XLA's fused convs that never materialize a
standalone pass) plus any body cost cannot beat XLA's conv fusion here.
Final verdict unchanged — composed wins — but for the right reason now.
Design rationale preserved below.

The reference fuses 2x-upsample -> snake -> 2x-downsample in one CUDA
kernel (anti_alias_activation_cuda.cu:35-41); our first TPU kernel
(ops/pallas/antialias.py) fused the same polyphase math over [B, T, C]
blocks (time in SUBLANES) and slope-timed 3x SLOWER than the composed XLA
path at wide C (docs/PERF.md #12): every shifted tap read
`s[9+d : 9+d+l]` is an unaligned second-minor slice, which Mosaic lowers to
sublane shuffles of the whole register file, and the kernel's T-in-sublanes
blocks sit at 90 degrees to the vocoder graph's observed layout ({2,0,1}:
B in sublanes, C in lanes, T major) so XLA inserts relayout copies at entry
and exit.

This formulation fixes both at once by blocking the kernel over [T, B, C]:

- A shift along T is now a MAJOR-dim offset: `s[9+d : 9+d+l]` selects whole
  (B, C) vector registers at a different row index — no sublane or lane
  data movement at all. The 24 filter taps become plain VPU multiply-adds.
- [T, B, C] in the default (descending) Pallas layout is byte-identical to
  the [B, T, C] graph tensor's {2,0,1} physical layout, so the logical
  transpose at the call boundary can lower to a bitcast.

The polyphase math is identical to ops/pallas/antialias.py (same taps, same
edge semantics, same exact_edges patch); the composed path
(ops/antialias.py:anti_aliased_activation) is the correctness oracle
(tests/test_pallas.py). The halo is delivered by a THIRD small operand
(stacked 2*PAD-row strips) instead of re-reading the whole neighbor block,
so the input is streamed ~1.03x instead of 2x.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops.antialias import kaiser_sinc_filter1d

PAD = 16  # halo rows on each side; covers all shifted reads below
KERNEL_SIZE = 12

# ONE tap-table definition shared by both Pallas kernels: a tap/index fix
# must not be able to land in one kernel and miss the other
from indextts_tpu.ops.pallas.antialias import _taps


def _bands(tile_t: int):
    """Banded resampler matrices for the MXU formulation: the 6-tap polyphase
    sums become one [l, Ts] @ [Ts, B, C] contraction per phase (all taps in a
    single matmul — NOT the per-tap stacked matmuls of docs/PERF.md #8)."""
    tap_e, tap_o, tap_ye, tap_yo = _taps()
    l = tile_t + 8
    ts = tile_t + 2 * PAD
    E = np.zeros((l, ts), np.float32)
    O = np.zeros((l, ts), np.float32)
    for d in range(6):
        E[np.arange(l), 9 + d + np.arange(l)] = 2.0 * tap_e[d]
        O[np.arange(l), 10 + d + np.arange(l)] = 2.0 * tap_o[d]
    Ye = np.zeros((tile_t, l), np.float32)
    Yo = np.zeros((tile_t, l), np.float32)
    for j in range(6):
        Ye[np.arange(tile_t), 2 + j + np.arange(tile_t)] = tap_ye[j]
        Yo[np.arange(tile_t), 1 + j + np.arange(tile_t)] = tap_yo[j]
    return E, O, Ye, Yo


def _kernel_mxu(x_ref, h_ref, alpha_ref, beta_ref, eo_ref, y_ref, out_ref, *, tile_t: int,
                poly_sin: bool = False):
    """MXU variant: resampler taps as banded matmuls (f32 accumulation in the
    input dtype's matmul — bf16 serving pays bf16 tap rounding, exactly like
    the composed path's bf16 convs); snake stays on the VPU. eo_ref stacks
    [E; O] ([2, l, Ts]), y_ref stacks [Ye; Yo] ([2, Tt, l])."""
    import jax.lax as lax

    from indextts_tpu.ops.activations import approx_sin

    sin_fn = approx_sin if poly_sin else jnp.sin
    s = jnp.concatenate([x_ref[...], h_ref[0]], axis=0)  # [Ts, B, Ct], input dtype
    dt = s.dtype
    dn = (((1,), (0,)), ((), ()))

    ue = lax.dot_general(eo_ref[0], s, dn, preferred_element_type=jnp.float32)
    uo = lax.dot_general(eo_ref[1], s, dn, preferred_element_type=jnp.float32)

    alpha = alpha_ref[0].astype(jnp.float32)
    beta = beta_ref[0].astype(jnp.float32)
    inv_beta = 1.0 / (beta + 1e-9)
    se = (ue + inv_beta * sin_fn(ue * alpha) ** 2).astype(dt)
    so = (uo + inv_beta * sin_fn(uo * alpha) ** 2).astype(dt)

    y = lax.dot_general(y_ref[0], se, dn, preferred_element_type=jnp.float32)
    y = y + lax.dot_general(y_ref[1], so, dn, preferred_element_type=jnp.float32)
    out_ref[...] = y.astype(out_ref.dtype)


def _kernel(x_ref, h_ref, alpha_ref, beta_ref, out_ref, *, tile_t: int, poly_sin: bool = False):
    """x_ref: [Tt, B, Ct] rows ti*Tt..(ti+1)*Tt of the padded input;
    h_ref: [1, 2*PAD, B, Ct] halo (the next 32 rows). All T shifts below are
    major-dim slices — free register renumbering, no lane/sublane shuffles."""
    from indextts_tpu.ops.activations import approx_sin

    sin_fn = approx_sin if poly_sin else jnp.sin
    tap_e, tap_o, tap_ye, tap_yo = _taps()
    s = jnp.concatenate([x_ref[...], h_ref[0]], axis=0).astype(jnp.float32)
    l = tile_t + 8  # phase-array length

    ue = tap_e[0] * s[9 : 9 + l]
    uo = tap_o[0] * s[10 : 10 + l]
    for d in range(1, 6):
        ue = ue + tap_e[d] * s[9 + d : 9 + d + l]
        uo = uo + tap_o[d] * s[10 + d : 10 + d + l]
    ue = ue * 2.0
    uo = uo * 2.0

    alpha = alpha_ref[0].astype(jnp.float32)  # [1, Ct] -> broadcasts over B
    beta = beta_ref[0].astype(jnp.float32)
    inv_beta = 1.0 / (beta + 1e-9)

    se = ue + inv_beta * sin_fn(ue * alpha) ** 2
    so = uo + inv_beta * sin_fn(uo * alpha) ** 2

    y = tap_ye[0] * se[2 : 2 + tile_t] + tap_yo[0] * so[1 : 1 + tile_t]
    for j in range(1, 6):
        y = y + tap_ye[j] * se[2 + j : 2 + j + tile_t] + tap_yo[j] * so[1 + j : 1 + j + tile_t]
    out_ref[...] = y.astype(out_ref.dtype)


def _kernel_ident(x_ref, h_ref, alpha_ref, beta_ref, out_ref, *, tile_t: int):
    """Probe body: pass the center block through untouched. Same operands,
    same BlockSpec DMA pipeline as _kernel, zero arithmetic — isolates the
    block-pipeline + wrapper cost from the tap/snake compute
    (tools/profile_wide_act.py `tmajor_ident`)."""
    del h_ref, alpha_ref, beta_ref
    out_ref[...] = x_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("alpha_logscale", "tile_t", "tile_c", "interpret", "exact_edges", "mxu", "probe", "poly_sin"),
)
def fused_anti_alias_snake_tmajor(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: Optional[jnp.ndarray] = None,
    alpha_logscale: bool = False,
    tile_t: int = 256,
    tile_c: int = 128,
    interpret: bool = False,
    exact_edges: bool = True,
    mxu: bool = False,
    probe: Optional[str] = None,
    poly_sin: Optional[bool] = None,
) -> jnp.ndarray:
    """x: [B, T, C]; per-channel alpha (and beta for SnakeBeta). Returns
    [B, T, C] — numerically the composed upsample2x -> snake -> downsample2x
    path (anti_aliased_activation). Internally time-major: see module doc."""
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

    tile_c = min(tile_c, c)
    # batch-adaptive clamp: the f32 phase arrays scale with tile_t*B, and the
    # serving path sub-batches the vocoder at up to 32 rows — keep the block
    # inside scoped VMEM at any B (B=8 keeps the measured tile_t=256)
    tile_t = min(tile_t, max(64, 2048 // max(b, 1)))
    tile_t = min(tile_t, max(64, t))
    c_pad = -c % tile_c
    n_tb = -(-t // tile_t)
    # padded, time-major input: row r corresponds to input frame r - PAD with
    # edge replication; length covers all center blocks plus the last halo
    total = n_tb * tile_t + 2 * PAD
    xt = jnp.transpose(x, (1, 0, 2))  # [T, B, C] — bitcast under {2,0,1}
    xp = jnp.pad(xt, ((PAD, total - t - PAD), (0, 0), (0, 0)), mode="edge")
    if c_pad:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, c_pad)))
        a = jnp.pad(a, (0, c_pad), constant_values=1.0)
        bt = jnp.pad(bt, (0, c_pad), constant_values=1.0)
    cp = c + c_pad

    xc = xp[: n_tb * tile_t]
    # halo strips: block ti consumes rows [(ti+1)*Tt, (ti+1)*Tt + 2*PAD)
    halo = jnp.stack(
        [jax.lax.slice_in_dim(xp, (ti + 1) * tile_t, (ti + 1) * tile_t + 2 * PAD, axis=0) for ti in range(n_tb)]
    )  # [n_tb, 2*PAD, B, Cp]

    grid = (n_tb, cp // tile_c)
    in_specs = [
        pl.BlockSpec((tile_t, b, tile_c), lambda ti, ci: (ti, 0, ci), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * PAD, b, tile_c), lambda ti, ci: (ti, 0, 0, ci), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_c), lambda ti, ci: (0, ci), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_c), lambda ti, ci: (0, ci), memory_space=pltpu.VMEM),
    ]
    operands = [xc, halo, a[None, :], bt[None, :]]
    if mxu:
        E, O, Ye, Yo = _bands(tile_t)
        l, ts = E.shape
        eo = jnp.asarray(np.stack([E, O]), x.dtype)  # [2, l, Ts]
        yb = jnp.asarray(np.stack([Ye, Yo]), x.dtype)  # [2, Tt, l]
        in_specs += [
            pl.BlockSpec((2, l, ts), lambda ti, ci: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_t, l), lambda ti, ci: (0, 0, 0), memory_space=pltpu.VMEM),
        ]
        operands += [eo, yb]
    if probe == "wrapper":
        # wrapper-only probe: every host-graph step around the kernel runs
        # (transpose, edge pad, halo stack, output slice, transpose back) but
        # the pallas_call is replaced by a passthrough of the center rows.
        # The tiny halo consumption keeps the stack from being DCE'd.
        out = xc + (1e-30 * jnp.sum(halo.astype(jnp.float32))).astype(xc.dtype)
    else:
        # follow the composed path's convention (ops/activations._sin_for):
        # the polynomial sin iff bf16, where its 3.6e-5 error is ~100x below
        # output quantization. Forceable for measurement.
        ps = (x.dtype == jnp.bfloat16) if poly_sin is None else poly_sin
        body = (
            functools.partial(_kernel_ident, tile_t=tile_t)
            if probe == "ident"
            else functools.partial(_kernel_mxu if mxu else _kernel, tile_t=tile_t, poly_sin=ps)
        )
        out = pl.pallas_call(
            body,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile_t, b, tile_c), lambda ti, ci: (ti, 0, ci), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tb * tile_t, b, cp), x.dtype),
            interpret=interpret,
        )(*operands)
    out = jnp.transpose(out[:t, :, :c], (1, 0, 2))  # back to [B, T, C]

    if exact_edges:
        # the kernel replicates the INPUT at sequence edges (the reference
        # CUDA kernel's semantics, anti_alias_activation_cuda.cu pads 5/5/6);
        # the composed torch-path oracle replicates the UPSAMPLED signal —
        # they differ only within ~3 frames of each end. Patch those frames
        # with the composed oracle on small windows.
        from indextts_tpu.ops.antialias import anti_aliased_activation

        edge = min(4, t)
        win = min(64, t)
        head = anti_aliased_activation(x[:, :win], alpha, beta, alpha_logscale=alpha_logscale)
        tail = anti_aliased_activation(x[:, -win:], alpha, beta, alpha_logscale=alpha_logscale)
        out = out.at[:, :edge].set(head[:, :edge])
        out = out.at[:, -edge:].set(tail[:, -edge:])
    return out
