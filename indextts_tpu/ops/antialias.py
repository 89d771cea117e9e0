"""Anti-aliased resampling and activation wrapping (composed XLA path).

Re-implements the alias-free activation pipeline the reference runs either in
pure torch (indextts/BigVGAN/alias_free_torch/) or in its fused CUDA kernel
(alias_free_activation/cuda/anti_alias_activation_cuda.cu): 2× upsample via a
kaiser-windowed-sinc transposed depthwise conv, pointwise snake activation,
then 2× lowpass depthwise downsample. The fused Pallas TPU kernel
(ops/pallas/antialias.py) must match this composed path numerically; this
module is the correctness oracle and the XLA fallback.

Filter design constants match filter.py:29-58 / resample.py:10-48 exactly
(kernel 12, cutoff 0.25, half_width 0.3, replicate edge padding 5/15/15 up and
5/6 down).
"""

from __future__ import annotations

import math
import os as _os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops.activations import snake, snake_beta
from indextts_tpu.ops.conv import conv1d, conv_transpose1d, pad1d


def kaiser_beta(half_size: int, half_width: float) -> float:
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        return 0.1102 * (a - 8.7)
    if a >= 21.0:
        return 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    return 0.0


@lru_cache(maxsize=16)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Normalized kaiser-windowed sinc lowpass, length `kernel_size` [K]."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    beta = kaiser_beta(half_size, half_width)
    window = np.kaiser(kernel_size, beta)  # == torch.kaiser_window(periodic=False)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def upsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int = None) -> jnp.ndarray:
    """[B, T, C] -> [B, T*ratio, C] anti-aliased upsample
    (reference: resample.py:10-33)."""
    kernel_size = kernel_size or int(6 * ratio // 2) * 2
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    c = x.shape[-1]
    # depthwise transposed conv: identical filter per channel. Filter cast to
    # the signal dtype — an f32 filter silently promotes the whole conv (and
    # everything XLA fuses around it) to f32, doubling HBM traffic in bf16
    # graphs (found via the f32[8,51230,192] buffers in the vocoder trace)
    w = jnp.asarray(filt, x.dtype)[:, None, None] * jnp.ones((1, 1, c), dtype=x.dtype)  # [K, 1(out/g), C(in)]
    xp = pad1d(x, (pad, pad), mode="replicate")
    y = jnp.asarray(ratio, x.dtype) * conv_transpose1d(xp, w, stride=stride, padding=0, groups=c)
    return y[:, pad_left : y.shape[1] - pad_right, :]


def downsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int = None) -> jnp.ndarray:
    """[B, T, C] -> [B, T//ratio, C] lowpass + decimate
    (reference: resample.py:36-48, filter.py:61-95)."""
    kernel_size = kernel_size or int(6 * ratio // 2) * 2
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    c = x.shape[-1]
    # filter cast to the signal dtype (see upsample1d)
    w = jnp.asarray(filt, x.dtype)[:, None, None] * jnp.ones((1, 1, c), dtype=x.dtype)  # [K, 1(in/g), C(out)]
    xp = pad1d(x, (pad_left, pad_right), mode="replicate")
    return conv1d(xp, w, stride=ratio, padding=0, groups=c)


@lru_cache(maxsize=4)
def _folded_resample_taps(kernel_size: int = 12):
    """Polyphase tap tables for the 2x resamplers on the phase-folded grid.

    The 2x-rate signal y2[B, 2T, C] is held as yf[B, T, 2C] phase-major
    (yf[:, s, p*C + c] == y2[:, 2s + p, c]).  On that grid both resamplers of
    the alias-free activation (reference resample.py:10-48) are plain stride-1
    K=7 convolutions — no lhs dilation, no stride, no feature groups, which is
    exactly the set of lowerings XLA:TPU handles at full tilt (docs/PERF.md:
    the lhs-dilated grouped form runs ~7x under the padded bandwidth bound).

    Derivation (f = kaiser lowpass, K=12, up pad 5 replicate + crop 15/15,
    down pad (5,6) replicate, both from upsample1d/downsample1d above):
      up   : y2[2s+p] = 2*sum_w g_p[w] * x[clip(s + w - 3)]
             g0[w] = 2 f[11-2w] (w<6),  g1[w] = 2 f[12-2w] (w>0)
      down : z[s]    = sum_w h0[w] yf0[s+w-3] + h1[w] yf1[s+w-3]
             h0[w] = f[2w-1] (w>0),     h1[w] = f[2w]    (w<6)
    with replicate edges: x padded (3,3); yf padded by 3 frames per side,
    left frame = y2[0] (phase-0 channels of frame 0), right frame = y2[2T-1]
    (phase-1 channels of the last frame).
    """
    f = kaiser_sinc_filter1d(0.25, 0.3, kernel_size).astype(np.float64)
    g = np.zeros((7, 2), np.float64)
    h = np.zeros((7, 2), np.float64)
    for w in range(6):
        g[w, 0] = 2.0 * f[11 - 2 * w]
        g[w + 1, 1] = 2.0 * f[12 - 2 * (w + 1)]
        h[w + 1, 0] = f[2 * (w + 1) - 1]
        h[w, 1] = f[2 * w]
    return g.astype(np.float32), h.astype(np.float32)


def fold_time(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """[B, T, C] -> [B, T/s, s*C] time fold; sample t = s*n + q lands at
    folded channel q*C + c.  Row-major contiguous, so a pure reshape."""
    if s == 1:
        return x
    b, t, c = x.shape
    return x.reshape(b, t // s, s * c)


def unfold_time(xf: jnp.ndarray, s: int) -> jnp.ndarray:
    """Inverse of fold_time."""
    if s == 1:
        return xf
    b, n, sc = xf.shape
    return xf.reshape(b, n * s, sc // s)


def _expand_diag(wk: np.ndarray, c: int) -> np.ndarray:
    """Per-sample tap table [K, Pin, Pout] -> folded depthwise-as-dense conv
    kernel [K, Pin*C, Pout*C] (same filter for every channel c)."""
    k, pin, pout = wk.shape
    eye = np.eye(c, dtype=np.float32)
    return (wk[:, :, None, :, None] * eye[None, None, :, None, :]).reshape(k, pin * c, pout * c)


@lru_cache(maxsize=64)
def _folded_up_kernel(s: int, c: int):
    """Kernel for the 2x anti-alias upsample on the s-folded grid:
    [B, N, s*C] -> [B, N, 2s*C] (N = T/s).  Returns (np kernel [K, sC, 2sC],
    (pad_left_frames, pad_right_frames)); pads are REPLICATE frames built from
    the first/last unfolded sample (see upsample1d_folded)."""
    g, _ = _folded_resample_taps()
    entries = []
    for r in range(2 * s):
        p = r % 2
        for w in range(7):
            if g[w, p] == 0.0:
                continue
            dt, q = divmod(r // 2 + w - 3, s)
            entries.append((dt, q, r, g[w, p]))
    dtmin = min(e[0] for e in entries)
    dtmax = max(e[0] for e in entries)
    wk = np.zeros((dtmax - dtmin + 1, s, 2 * s), np.float32)
    for dt, q, r, wt in entries:
        wk[dt - dtmin, q, r] += wt
    return _expand_diag(wk, c), (-dtmin, dtmax)


@lru_cache(maxsize=64)
def _folded_down_kernel(s: int, c: int):
    """Kernel for the 2x anti-alias downsample on the s-folded grid:
    [B, N, 2s*C] -> [B, N, s*C].  Same return convention as _folded_up_kernel;
    pad frames replicate the first/last 2x-rate sample."""
    f = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float64)
    entries = []
    for r in range(s):
        for j in range(12):
            dt, q2 = divmod(2 * r + j - 5, 2 * s)
            entries.append((dt, q2, r, float(f[j])))
    dtmin = min(e[0] for e in entries)
    dtmax = max(e[0] for e in entries)
    wk = np.zeros((dtmax - dtmin + 1, 2 * s, s), np.float32)
    for dt, q2, r, wt in entries:
        wk[dt - dtmin, q2, r] += wt
    return _expand_diag(wk.astype(np.float32), c), (-dtmin, dtmax)


def _replicate_pad_frames(xf: jnp.ndarray, c: int, pads) -> jnp.ndarray:
    """Pad a folded signal with whole frames that replicate the first/last
    UNFOLDED sample (matching torch replicate padding at the signal edges).
    The first sample is folded channel block [0:C] of frame 0; the last is
    block [-C:] of the final frame."""
    pl, pr = pads
    parts = []
    if pl:
        parts.append(jnp.tile(xf[:, :1, :c], (1, pl, xf.shape[-1] // c)))
    parts.append(xf)
    if pr:
        parts.append(jnp.tile(xf[:, -1:, -c:], (1, pr, xf.shape[-1] // c)))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else xf


def upsample1d_folded(xf: jnp.ndarray, s: int = 1, channels: int = None) -> jnp.ndarray:
    """2x anti-alias upsample on the s-folded grid.

    xf: [B, T/s, s*C] (fold_time of the stage signal).  Output [B, T/s, 2s*C]
    holding the 2x-rate signal y2 with y2[2s*n + r, c] at channel r*C + c.
    Numerically identical to upsample1d(unfold, 2, 12) then fold — but lowers
    to one stride-1 dense conv (no lhs dilation, no groups), which is the
    difference between ~36 GB/s and full-tilt HBM streaming on XLA:TPU
    (docs/PERF.md; reference CUDA kernel solves the same lowering problem at
    anti_alias_activation_cuda.cu:35-41)."""
    c = channels or xf.shape[-1] // s
    w, pads = _folded_up_kernel(s, c)
    xp = _replicate_pad_frames(xf, c, pads)
    return conv1d(xp, jnp.asarray(w, xf.dtype), stride=1, padding=0)


def downsample1d_folded(yf: jnp.ndarray, s: int = 1, channels: int = None) -> jnp.ndarray:
    """2x anti-alias downsample on the s-folded grid: [B, N, 2s*C] -> [B, N, s*C]."""
    c = channels or yf.shape[-1] // (2 * s)
    w, pads = _folded_down_kernel(s, c)
    yp = _replicate_pad_frames(yf, c, pads)
    return conv1d(yp, jnp.asarray(w, yf.dtype), stride=1, padding=0)


@lru_cache(maxsize=128)
def _fold_conv_scatter(k: int, d: int, s: int):
    """Static scatter tensor S[K_s, q, r, k] mapping a dense 1x conv kernel
    (odd k, dilation d, torch 'same' zero padding d*(k-1)/2) onto the s-folded
    grid, plus (pad_left_frames, pad_right_frames) of ZERO frames."""
    k0 = (k - 1) // 2
    entries = []
    for r in range(s):
        for kk in range(k):
            dt, q = divmod(r + (kk - k0) * d, s)
            entries.append((dt, q, r, kk))
    dtmin = min(e[0] for e in entries)
    dtmax = max(e[0] for e in entries)
    scat = np.zeros((dtmax - dtmin + 1, s, s, k), np.float32)
    for dt, q, r, kk in entries:
        scat[dt - dtmin, q, r, kk] = 1.0
    return scat, (-dtmin, dtmax)


def conv1d_same_folded(
    xf: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray = None,
    dilation: int = 1,
    s: int = 1,
) -> jnp.ndarray:
    """Dense 1x conv (weight [k, Cin, Cout], odd k, 'same' zero pad, stride 1)
    applied on the s-folded grid: [B, N, s*Cin] -> [B, N, s*Cout].

    The folded kernel is block-Toeplitz — s times the FLOPs of the unfolded
    conv, but the MXU is idle at these widths and the fold removes the lane
    padding tax that dominates narrow-stage conv traffic."""
    k, cin, cout = weight.shape
    if s == 1:
        return conv1d(xf, weight, bias, padding=dilation * (k - 1) // 2, dilation=dilation)
    scat, (pl, pr) = _fold_conv_scatter(k, dilation, s)
    wf = jnp.einsum(
        "tqrk,kio->tqiro", jnp.asarray(scat, weight.dtype), weight
    ).reshape(scat.shape[0], s * cin, s * cout)
    xp = jnp.pad(xf, ((0, 0), (pl, pr), (0, 0)))
    out = conv1d(xp, wf, stride=1, padding=0)
    if bias is not None:
        out = out + jnp.tile(bias, s).astype(out.dtype)
    return out


def fold_2x(y2: jnp.ndarray) -> jnp.ndarray:
    """[B, 2T, C] -> [B, T, 2C] phase-major (testing/interop helper)."""
    return fold_time(y2, 2)


def unfold_2x(yf: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 2C] phase-major -> [B, 2T, C]."""
    return unfold_time(yf, 2)


def snake_folded(yf, alpha, beta, alpha_logscale: bool, phases: int):
    """Snake(/beta) on a folded signal: per-channel params tile across the
    `phases` sample slots of each frame (exp(tile(a)) == tile(exp(a)))."""
    a = jnp.tile(alpha, phases)
    if beta is None:
        return snake(yf, a, alpha_logscale)
    return snake_beta(yf, a, jnp.tile(beta, phases), alpha_logscale)


def anti_aliased_activation_folded(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray = None,
    alpha_logscale: bool = False,
    s: int = 1,
) -> jnp.ndarray:
    """anti_aliased_activation computed entirely on the s-folded grid.

    Exact reformulation (same taps, same replicate edges, same snake) of the
    composed path — the 2x intermediate is [B, T/s, 2s*C] instead of
    [B, 2T, C], so XLA sees stride-1 dense convs at >=128-lane widths."""
    xf = fold_time(x, s)
    c = x.shape[-1]
    return unfold_time(folded_aa_core(xf, alpha, beta, alpha_logscale, s, c), s)


def folded_aa_core(
    xf: jnp.ndarray, alpha: jnp.ndarray, beta, alpha_logscale: bool, s: int, c: int
) -> jnp.ndarray:
    """The up->snake->down anti-alias core on an ALREADY s-folded signal —
    the ONE definition shared by anti_aliased_activation_folded and the
    stage-folded vocoder path (models/bigvgan.py), so a tap/edge fix can
    never apply to one site and miss the other."""
    yf = upsample1d_folded(xf, s, c)
    yf = snake_folded(yf, alpha, beta, alpha_logscale, 2 * s)
    return downsample1d_folded(yf, s, c)


def _shift_add_dw(xp: jnp.ndarray, taps, out_t: int) -> jnp.ndarray:
    """Depthwise stride-1 conv as a chain of static-slice multiply-adds
    (taps: 1-D python/np sequence). XLA fuses the shifted reads into one
    elementwise pass — no grouped-conv lowering at all."""
    acc = None
    for w, t in enumerate(np.asarray(taps).tolist()):
        if t == 0.0:
            continue
        term = jnp.asarray(t, xp.dtype) * jax.lax.slice_in_dim(xp, w, w + out_t, axis=1)
        acc = term if acc is None else acc + term
    return acc


def anti_aliased_activation_polyphase(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray = None,
    alpha_logscale: bool = False,
) -> jnp.ndarray:
    """anti_aliased_activation via per-phase depthwise shift-and-add convs.

    Exact reformulation for WIDE stages (C >= 128 lanes): the 2x up/down
    resamplers decompose into their two polyphase branches (taps g/h from
    _folded_resample_taps — same filters, same replicate edges), each a
    stride-1 depthwise conv expressed as fused static-slice multiply-adds;
    the phase interleave/deinterleave is a sublane reshape. No lhs-dilated
    or grouped conv lowerings anywhere. (The round-2 negative result on
    polyphase slices was measured at C=24 where lane padding dominates;
    this path is gated to full-lane widths.)"""
    b, t, c = x.shape
    g, h = _folded_resample_taps()
    xp = pad1d(x, (3, 3), mode="replicate")
    y0 = _shift_add_dw(xp, g[:, 0], t)  # g already includes the 2x gain
    y1 = _shift_add_dw(xp, g[:, 1], t)
    y2 = jnp.stack([y0, y1], axis=2).reshape(b, 2 * t, c)
    y2 = snake_folded(y2, alpha, beta, alpha_logscale, 1)
    # deinterleave + folded-frame replicate pad (left frame = y2[0] both
    # phases, right frame = y2[2T-1] both phases — downsample1d's edges)
    yf = y2.reshape(b, t, 2, c)
    left = jnp.broadcast_to(y2[:, :1, None, :], (b, 3, 2, c))
    right = jnp.broadcast_to(y2[:, -1:, None, :], (b, 3, 2, c))
    yp = jnp.concatenate([left, yf, right], axis=1)
    z = _shift_add_dw(yp[:, :, 0], h[:, 0], t) + _shift_add_dw(yp[:, :, 1], h[:, 1], t)
    return z


def anti_aliased_activation_phase(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray = None,
    alpha_logscale: bool = False,
) -> jnp.ndarray:
    """anti_aliased_activation computed ENTIRELY in phase space — the 2x-rate
    signal is never materialized.

    Snake is elementwise, so it commutes with the phase interleave: the two
    polyphase branches of the upsampler are built as depthwise shift-add
    stencils (no grouped/lhs-dilated conv lowerings), snake is applied to
    each branch separately, and the downsampler consumes the branches
    directly (z[t] = sum_w h0[w] s0[t+w-3] + h1[w] s1[t+w-3]). This removes
    the interleave/deinterleave pair that sank the round-3 polyphase attempt
    in-graph (docs/PERF.md negative #9: the [B, 2T, C] stack materialized at
    the vocoder's B-in-sublanes layout). Taps and replicate edges are the
    composed path's (filter.py:29-58 contract); exact up to float order.

    For WIDE stages (C >= 128 lanes); at narrow C the folded path wins.
    """
    b, t, c = x.shape
    g, h = _folded_resample_taps()
    # branch stencils: slices (mode 1, exact-fused but ~24 slice ops per
    # activation — the remote compiler took >25 min on the full graph) or a
    # single stride-1 non-dilated depthwise conv per branch (mode 2, four
    # ops per activation)
    dw = _os.environ.get("INDEXTTS_WIDE_PHASE", "1") == "2"

    def branch(xp, taps, t_out):
        if not dw:
            return _shift_add_dw(xp, taps, t_out)
        k = len(taps)
        w = jnp.asarray(np.asarray(taps, np.float32)[:, None, None], xp.dtype)
        w = jnp.broadcast_to(w, (k, 1, c))  # [K, 1, C] depthwise
        return jax.lax.conv_general_dilated(
            xp, w, window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
        )[:, :t_out]

    xp = pad1d(x, (3, 3), mode="replicate")
    s0 = branch(xp, g[:, 0], t)  # phase-0 branch of the 2x signal
    s1 = branch(xp, g[:, 1], t)
    s0 = snake_folded(s0, alpha, beta, alpha_logscale, 1)
    s1 = snake_folded(s1, alpha, beta, alpha_logscale, 1)
    # downsample1d's replicate edges on the 2x signal: left pad frames hold
    # y2[0] (= phase-0 of frame 0) for BOTH branches, right pad frames hold
    # y2[2T-1] (= phase-1 of the last frame)
    left = jnp.broadcast_to(s0[:, :1], (b, 3, c))
    right = jnp.broadcast_to(s1[:, -1:], (b, 3, c))
    p0 = jnp.concatenate([left, s0, right], axis=1)
    p1 = jnp.concatenate([left, s1, right], axis=1)
    return branch(p0, h[:, 0], t) + branch(p1, h[:, 1], t)


def anti_aliased_activation(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray = None,
    alpha_logscale: bool = False,
    up_ratio: int = 2,
    down_ratio: int = 2,
    up_kernel_size: int = 12,
    down_kernel_size: int = 12,
) -> jnp.ndarray:
    """Activation1d: upsample -> snake(/beta) -> downsample
    (reference: alias_free_torch/act.py:9-28)."""
    y = upsample1d(x, up_ratio, up_kernel_size)
    if beta is None:
        y = snake(y, alpha, alpha_logscale)
    else:
        y = snake_beta(y, alpha, beta, alpha_logscale)
    return downsample1d(y, down_ratio, down_kernel_size)
