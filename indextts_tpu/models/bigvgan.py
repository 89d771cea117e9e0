"""BigVGAN2 vocoder: generator, MPD/MRD discriminators, GAN losses.

Behavioral reference: indextts/BigVGAN/models.py — generator (latent ->
waveform with ECAPA speaker conditioning at conv_pre and every upsample stage,
models.py:201-250), AMPBlock1/2 anti-aliased residual stacks (models.py:20-127),
MultiPeriodDiscriminator / MultiResolutionDiscriminator and
feature/discriminator/generator losses (models.py:278-451, eval use).

Weight norm is folded at conversion time (the reference folds at load,
models.py:252-260). Layout: channels-last [B, T, C]; the waveform output is
[B, T_wav, 1].
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import BigVGANConfig
from indextts_tpu.models.ecapa import ecapa_apply, init_ecapa
from indextts_tpu.ops.activations import leaky_relu, tanh
import os as _os

from indextts_tpu.ops.antialias import (
    anti_aliased_activation,
    anti_aliased_activation_folded,
    conv1d_same_folded,
    fold_time,
    folded_aa_core,
    unfold_time,
)
from indextts_tpu.ops.conv import conv1d, conv2d, conv_transpose1d, pad1d

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _conv_init(rng, k, cin, cout, std: Optional[float] = None):
    kw, kb = jax.random.split(rng)
    if std is not None:  # reference init_weights: normal(0, 0.01)
        w = std * jax.random.normal(kw, (k, cin, cout), jnp.float32)
    else:
        bound = 1.0 / np.sqrt(cin * k)
        w = jax.random.uniform(kw, (k, cin, cout), jnp.float32, -bound, bound)
    b = jnp.zeros((cout,), jnp.float32)
    return {"weight": w, "bias": b}


def _convT_init(rng, k, cin, cout, std: float = 0.01):
    kw, _ = jax.random.split(rng)
    # lax layout for conv_transpose1d: [K, Cout/groups, Cin]
    w = std * jax.random.normal(kw, (k, cout, cin), jnp.float32)
    return {"weight": w, "bias": jnp.zeros((cout,), jnp.float32)}


def _act_init(channels: int, snakebeta: bool, logscale: bool):
    init = jnp.zeros((channels,), jnp.float32) if logscale else jnp.ones((channels,), jnp.float32)
    p = {"alpha": init}
    if snakebeta:
        p["beta"] = init
    return p


def _amp_block_init(rng, h: BigVGANConfig, channels: int, kernel_size: int, dilations: Tuple[int, ...]):
    rngs = jax.random.split(rng, 2 * len(dilations))
    snakebeta = h.activation == "snakebeta"
    if h.resblock == "1":
        return {
            "convs1": [
                _conv_init(rngs[i], kernel_size, channels, channels, std=0.01)
                for i in range(len(dilations))
            ],
            "convs2": [
                _conv_init(rngs[len(dilations) + i], kernel_size, channels, channels, std=0.01)
                for i in range(len(dilations))
            ],
            "acts": [
                _act_init(channels, snakebeta, h.snake_logscale) for _ in range(2 * len(dilations))
            ],
        }
    return {
        "convs": [
            _conv_init(rngs[i], kernel_size, channels, channels, std=0.01)
            for i in range(len(dilations))
        ],
        "acts": [_act_init(channels, snakebeta, h.snake_logscale) for _ in range(len(dilations))],
    }


def init_bigvgan(rng: jax.Array, h: BigVGANConfig) -> Params:
    n_ups = len(h.upsample_rates)
    rngs = jax.random.split(rng, 6 + n_ups * (1 + len(h.resblock_kernel_sizes)) + n_ups)
    ri = iter(rngs)
    params: Params = {
        "conv_pre": _conv_init(next(ri), 7, h.gpt_dim, h.upsample_initial_channel),
        "ups": [],
        "resblocks": [],
        "conds": [],
    }
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        cin = h.upsample_initial_channel // (2**i)
        cout = h.upsample_initial_channel // (2 ** (i + 1))
        params["ups"].append(_convT_init(next(ri), k, cin, cout))
        for kk, dd in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
            params["resblocks"].append(_amp_block_init(next(ri), h, cout, kk, tuple(dd)))
        if h.cond_d_vector_in_each_upsampling_layer:
            params["conds"].append(_conv_init(next(ri), 1, h.speaker_embedding_dim, cout))
    ch_last = h.upsample_initial_channel // (2**n_ups)
    params["activation_post"] = _act_init(ch_last, h.activation == "snakebeta", h.snake_logscale)
    params["conv_post"] = _conv_init(next(ri), 7, ch_last, 1, std=0.01)
    params["speaker_encoder"] = init_ecapa(next(ri), h.num_mels, h.speaker_embedding_dim)
    params["cond_layer"] = _conv_init(next(ri), 1, h.speaker_embedding_dim, h.upsample_initial_channel)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def linear_interp_x4(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.interpolate(scale_factor=4, mode='linear', align_corners=False)
    along the time axis of [B, T, C] (reference: models.py:213-218)."""
    b, t, c = x.shape
    out_t = t * 4
    src = (jnp.arange(out_t, dtype=jnp.float32) + 0.5) / 4.0 - 0.5
    src = jnp.clip(src, 0.0, t - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (src - lo.astype(jnp.float32))[None, :, None].astype(x.dtype)
    return x[:, lo, :] * (1.0 - w) + x[:, hi, :] * w


# Widest channel count at which folded execution wins over the composed
# grouped-conv path (trace-verified on the v5e, docs/PERF.md round 3: the
# diagonal-dense resampler kernels cost C× extra MXU FLOPs, which stops
# paying once the composed path's lane padding tax fades).
_FOLDED_MAX_CHANNELS = 96


def _stage_fold(channels: int, t: int) -> int:
    """Time-fold factor for running a whole resblock stage on the folded grid:
    smallest power of two with s*C >= 128 lanes (the v5e lane tile), halved
    until it divides T.  1 = run unfolded/composed.

    INDEXTTS_FOLD_LANES overrides the 128-lane target (e.g. 64: fold one
    power LOWER — the block-Toeplitz densification's FLOPs scale with s, and
    the MXU pads a 96-wide matmul to one 128 tile anyway, so a half-fold
    could halve tile-work on the MXU-bound folded stages at a 4/3 memory
    padding cost). MEASURED NEGATIVE (docs/PERF.md #16): half-fold 492-509
    vs default 478-480 ms/iter in-graph — kept as a measurement knob."""
    if channels > _FOLDED_MAX_CHANNELS:
        return 1
    lanes = int(_os.environ.get("INDEXTTS_FOLD_LANES", "128"))
    s = 1
    while s * channels < lanes:
        s *= 2
    if s == 1 and lanes < 128:
        s = 2  # half-fold mode still keeps the stage on the folded grid
    while s > 1 and t % s:
        s //= 2
    return s


def _activation(p_act: Params, x: jnp.ndarray, h: BigVGANConfig, use_pallas: bool = False) -> jnp.ndarray:
    # the fused kernel puts channels in lanes; below 128 channels the lane
    # padding wastes more HBM traffic than the fusion saves, so narrow late
    # stages stay on the composed XLA path
    if use_pallas and x.shape[-1] >= 128:
        from indextts_tpu.ops.pallas.antialias import fused_anti_alias_snake

        return fused_anti_alias_snake(
            x,
            p_act["alpha"],
            p_act.get("beta"),
            alpha_logscale=h.snake_logscale,
            interpret=jax.default_backend() == "cpu",
        )
    # folded narrow stages are gated on NOT use_pallas so BENCH_PALLAS
    # measures the pure composed+Pallas configuration (the stage loop already
    # forces s=1 under use_pallas; mixing folded XLA stages in would credit
    # the Pallas config with the folded path's win)
    if not use_pallas and x.shape[-1] <= _FOLDED_MAX_CHANNELS:
        s = _stage_fold(x.shape[-1], x.shape[1])
        # honor _stage_fold's s=1 = "run unfolded/composed" contract: the
        # folded form at s=1 still densifies the resamplers to [K, C, 2C]
        # diag-dense kernels (C-times the FLOPs; measured worse, PERF.md)
        if s > 1:
            return anti_aliased_activation_folded(
                x, p_act["alpha"], p_act.get("beta"), alpha_logscale=h.snake_logscale, s=s
            )
    if _os.environ.get("INDEXTTS_WIDE_TMAJOR", "") == "1" and x.shape[-1] >= 128:
        # wide-stage attack #14: time-major blocked kernel — tap shifts are
        # major-dim register offsets and the block layout matches the graph's
        # {2,0,1} physical layout (see ops/pallas/antialias_tmajor.py)
        from indextts_tpu.ops.pallas.antialias_tmajor import fused_anti_alias_snake_tmajor

        return fused_anti_alias_snake_tmajor(
            x, p_act["alpha"], p_act.get("beta"), alpha_logscale=h.snake_logscale,
            # round-4 ablation knobs: the BEST slope-timed body (MXU banded
            # taps + poly sin, 1.69 ms/op vs VPU+exact-sin 3.2) was never
            # measured IN-GRAPH, where composed acts cost ~2.9 ms each
            mxu=_os.environ.get("INDEXTTS_WIDE_TMAJOR_MXU", "") == "1",
            poly_sin=(True if _os.environ.get("INDEXTTS_WIDE_TMAJOR_POLY", "") == "1"
                      else None),
            interpret=jax.default_backend() == "cpu",
        )
    # the WIDE_* measurement knobs are wide-stage-only forms (>=128 lanes,
    # measured 4.5x worse at C=24): gate on width like the branches above so
    # narrow stages / activation_post can't silently land on them
    if _os.environ.get("INDEXTTS_WIDE_POLY", "") == "1" and x.shape[-1] >= 128:
        from indextts_tpu.ops.antialias import anti_aliased_activation_polyphase

        return anti_aliased_activation_polyphase(
            x, p_act["alpha"], p_act.get("beta"), alpha_logscale=h.snake_logscale
        )
    if _os.environ.get("INDEXTTS_WIDE_PHASE", "") in ("1", "2") and x.shape[-1] >= 128:
        from indextts_tpu.ops.antialias import anti_aliased_activation_phase

        return anti_aliased_activation_phase(
            x, p_act["alpha"], p_act.get("beta"), alpha_logscale=h.snake_logscale
        )
    # Round-4 in-graph verdict on the tmajor MXU kernel (docs/PERF.md):
    # slope timing had flattered the composed path (chained activations
    # cross-fuse in XLA; a pallas_call's slope is its true cost) — in-graph
    # the kernel beat the f32-trunk composed path 455-460 -> 415-419
    # ms/iter, but once the ecapa bf16 cast above fixed the trunk dtype the
    # two TIE (composed 313-320 vs kernel 310-327, cross-run noise).
    # Composed stays the default: zero pallas compile time per vocoder
    # bucket and one fewer moving part. The measured-win knobs remain
    # INDEXTTS_WIDE_TMAJOR(_MXU/_POLY)=1 above.
    return anti_aliased_activation(
        x, p_act["alpha"], p_act.get("beta"), alpha_logscale=h.snake_logscale
    )


# Fused Pallas kernel for the folded activation. Slope-timed SLOWER than the
# XLA folded path at every vocoder shape (tools/profile_fused_folded.py:
# 2.9 vs 0.06 ms at s=8, 2.4 vs 1.3 at s=4, 3.5 vs 1.9 at s=2 — the per-tap
# stacked matmuls pay ku+kd times the dense FLOPs while XLA's folded convs hit
# the MXU directly; docs/PERF.md negative result #8). Kept opt-in for
# measurement: INDEXTTS_FUSED_AA=1 (read per trace, like the other knobs).


def _activation_folded(p_act: Params, xf: jnp.ndarray, h: BigVGANConfig, c: int, s: int) -> jnp.ndarray:
    """Anti-aliased activation with the signal already on the s-folded grid."""
    if (_os.environ.get("INDEXTTS_FUSED_AA", "") == "1" and s > 1
            and jax.default_backend() == "tpu"):
        from indextts_tpu.ops.pallas.antialias_folded import fused_folded_aa

        return fused_folded_aa(
            xf, p_act["alpha"], p_act.get("beta"), h.snake_logscale, s, c
        )
    return folded_aa_core(xf, p_act["alpha"], p_act.get("beta"), h.snake_logscale, s, c)


def _amp_block1_folded(
    p: Params, xf: jnp.ndarray, h: BigVGANConfig, dilations, c: int, s: int
) -> jnp.ndarray:
    """_amp_block1 on the s-folded grid — identical math, stride-1 dense convs
    only (activations via the folded resamplers, dilated convs block-Toeplitz).
    No kernel_size param: conv1d_same_folded derives k from the weight."""
    acts1 = p["acts"][::2]
    acts2 = p["acts"][1::2]
    for c1, c2, a1, a2, d in zip(p["convs1"], p["convs2"], acts1, acts2, dilations):
        xt = _activation_folded(a1, xf, h, c, s)
        xt = conv1d_same_folded(xt, c1["weight"], c1["bias"], dilation=d, s=s)
        xt = _activation_folded(a2, xt, h, c, s)
        xt = conv1d_same_folded(xt, c2["weight"], c2["bias"], dilation=1, s=s)
        xf = xt + xf
    return xf


def _amp_block2_folded(
    p: Params, xf: jnp.ndarray, h: BigVGANConfig, dilations, c: int, s: int
) -> jnp.ndarray:
    for cv, a, d in zip(p["convs"], p["acts"], dilations):
        xt = _activation_folded(a, xf, h, c, s)
        xt = conv1d_same_folded(xt, cv["weight"], cv["bias"], dilation=d, s=s)
        xf = xt + xf
    return xf


def _amp_block1(
    p: Params, x: jnp.ndarray, h: BigVGANConfig, kernel_size: int, dilations, use_pallas: bool = False
) -> jnp.ndarray:
    """[act -> dilated conv -> act -> conv]×3 with residuals (models.py:65-74)."""
    acts1 = p["acts"][::2]
    acts2 = p["acts"][1::2]
    # round-4 wide-stage attack: fuse each (activation, conv) half-branch into
    # ONE pallas_call (ops/pallas/aa_conv_branch.py) so the per-invocation
    # materialization floor is paid once per PAIR and the activation output
    # never round-trips HBM — the amortization the reference's CUDA kernel
    # exists for (anti_alias_activation_cuda.cu:35-41)
    if _os.environ.get("INDEXTTS_WIDE_BRANCH", "") == "1" and x.shape[-1] >= 128:
        from indextts_tpu.ops.pallas.aa_conv_branch import fused_aa_snake_dconv_tmajor

        interp = jax.default_backend() == "cpu"
        for c1, c2, a1, a2, d in zip(p["convs1"], p["convs2"], acts1, acts2, dilations):
            xt = fused_aa_snake_dconv_tmajor(
                x, a1["alpha"], a1.get("beta"), c1["weight"], c1["bias"],
                dilation=d, alpha_logscale=h.snake_logscale, interpret=interp,
            )
            xt = fused_aa_snake_dconv_tmajor(
                xt, a2["alpha"], a2.get("beta"), c2["weight"], c2["bias"],
                dilation=1, alpha_logscale=h.snake_logscale, interpret=interp,
            )
            x = xt + x
        return x
    for c1, c2, a1, a2, d in zip(p["convs1"], p["convs2"], acts1, acts2, dilations):
        xt = _activation(a1, x, h, use_pallas)
        pad = (kernel_size * d - d) // 2
        xt = conv1d(xt, c1["weight"], c1["bias"], padding=pad, dilation=d)
        xt = _activation(a2, xt, h, use_pallas)
        pad = (kernel_size - 1) // 2
        xt = conv1d(xt, c2["weight"], c2["bias"], padding=pad, dilation=1)
        x = xt + x
    return x


def _amp_block2(
    p: Params, x: jnp.ndarray, h: BigVGANConfig, kernel_size: int, dilations, use_pallas: bool = False
) -> jnp.ndarray:
    for c, a, d in zip(p["convs"], p["acts"], dilations):
        xt = _activation(a, x, h, use_pallas)
        pad = (kernel_size * d - d) // 2
        xt = conv1d(xt, c["weight"], c["bias"], padding=pad, dilation=d)
        x = xt + x
    return x


def bigvgan_apply(
    params: Params,
    h: BigVGANConfig,
    x: jnp.ndarray,
    mel_ref: jnp.ndarray,
    lens: Optional[jnp.ndarray] = None,
    speaker_embedding: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Generator forward (reference: models.py:201-250).

    x: GPT latents [B, T, gpt_dim]; mel_ref: prompt mel [B, frames, num_mels].
    Returns waveform [B, T_wav, 1]. `speaker_embedding` may be precomputed
    ([B, 1, spk_dim]) to amortize ECAPA across chunks — a TPU-side serving
    optimization the reference recomputes every call.
    """
    if speaker_embedding is None:
        speaker_embedding = ecapa_apply(params["speaker_encoder"], mel_ref, lens)
    # ecapa_apply computes in f32; without this cast the cond adds below
    # promote the ENTIRE vocoder trunk to f32 — 2x the HBM bytes of the bf16
    # serving policy on a memory-bound graph (measured with the wide-stage
    # kernel: 415-419 -> 310-327 ms/iter at batch 8, docs/PERF.md round 4)
    spk = speaker_embedding.astype(x.dtype)  # [B, 1, spk_dim]

    if h.feat_upsample:
        x = linear_interp_x4(x)

    x = conv1d(x, params["conv_pre"]["weight"], params["conv_pre"]["bias"], padding=3)
    x = x + conv1d(spk, params["cond_layer"]["weight"], params["cond_layer"]["bias"])

    num_kernels = len(h.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        up = params["ups"][i]
        x = conv_transpose1d(x, up["weight"], up["bias"], stride=u, padding=(k - u) // 2)
        if h.cond_d_vector_in_each_upsampling_layer:
            cd = params["conds"][i]
            x = x + conv1d(spk, cd["weight"], cd["bias"])
        c_stage = x.shape[-1]
        s = 1 if use_pallas else _stage_fold(c_stage, x.shape[1])
        # measurement knob: run s=1 stages up to the given width through the
        # folded machinery anyway — resamplers become diagonal-dense MXU
        # convs instead of the badly-lowered grouped form
        fold_wide = int(_os.environ.get("INDEXTTS_FOLD_WIDE", "0"))
        use_folded_stage = s > 1 or (not use_pallas and 0 < c_stage <= fold_wide)
        xs = None
        if use_folded_stage:
            # run the whole stage on the s-folded grid [B, T/s, s*C]: the
            # fold/unfold reshapes happen once per stage, every interior op is
            # a stride-1 dense conv or elementwise at >=128-lane width
            xf = fold_time(x, s)
            for j in range(num_kernels):
                p_rb = params["resblocks"][i * num_kernels + j]
                dd = h.resblock_dilation_sizes[j]
                out = (
                    _amp_block1_folded(p_rb, xf, h, dd, c_stage, s)
                    if h.resblock == "1"
                    else _amp_block2_folded(p_rb, xf, h, dd, c_stage, s)
                )
                xs = out if xs is None else xs + out
            x = unfold_time(xs / num_kernels, s)
        else:
            for j in range(num_kernels):
                p_rb = params["resblocks"][i * num_kernels + j]
                kk = h.resblock_kernel_sizes[j]
                dd = h.resblock_dilation_sizes[j]
                out = (
                    _amp_block1(p_rb, x, h, kk, dd, use_pallas)
                    if h.resblock == "1"
                    else _amp_block2(p_rb, x, h, kk, dd, use_pallas)
                )
                xs = out if xs is None else xs + out
            x = xs / num_kernels

    x = _activation(params["activation_post"], x, h, use_pallas)
    x = conv1d(x, params["conv_post"]["weight"], params["conv_post"]["bias"], padding=3)
    return tanh(x)


# ---------------------------------------------------------------------------
# discriminators (eval/parity scoring; reference: models.py:278-417)
# ---------------------------------------------------------------------------


def _conv2d_init(rng, kh, kw, cin, cout):
    k1, _ = jax.random.split(rng)
    bound = 1.0 / np.sqrt(cin * kh * kw)
    return {
        "weight": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32, -bound, bound),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def init_discriminator_p(rng, h: BigVGANConfig, kernel_size: int = 5):
    dm = h.discriminator_channel_mult
    chans = [1, int(32 * dm), int(128 * dm), int(512 * dm), int(1024 * dm), int(1024 * dm)]
    rngs = jax.random.split(rng, 6)
    convs = [
        _conv2d_init(rngs[i], kernel_size, 1, chans[i], chans[i + 1]) for i in range(4)
    ]
    convs.append(_conv2d_init(rngs[4], kernel_size, 1, chans[4], chans[5]))
    return {"convs": convs, "conv_post": _conv2d_init(rngs[5], 3, 1, chans[5], 1)}


def discriminator_p_apply(params, x: jnp.ndarray, period: int, kernel_size: int = 5, stride: int = 3):
    """x: [B, T, 1] -> (score, fmaps). Reshapes time into (T/period, period)
    2D maps (reference: models.py:293-312)."""
    b, t, c = x.shape
    if t % period != 0:
        n_pad = period - (t % period)
        x = pad1d(x, (0, n_pad), mode="reflect")
        t = t + n_pad
    x = x.reshape(b, t // period, period, c)
    fmap = []
    get_pad = (kernel_size - 1) // 2  # honor the param; weights are built to match
    for i, conv in enumerate(params["convs"]):
        s = (stride, 1) if i < 4 else (1, 1)
        pad = (get_pad, 0) if i < 4 else (2, 0)
        x = conv2d(x, conv["weight"], conv["bias"], stride=s, padding=pad)
        x = leaky_relu(x, 0.1)
        fmap.append(x)
    x = conv2d(x, params["conv_post"]["weight"], params["conv_post"]["bias"], padding=(1, 0))
    fmap.append(x)
    return x.reshape(b, -1), fmap


def init_mpd(rng, h: BigVGANConfig):
    rngs = jax.random.split(rng, len(h.mpd_reshapes))
    return {"discriminators": [init_discriminator_p(r, h) for r in rngs]}


def mpd_apply(params, h: BigVGANConfig, y: jnp.ndarray, y_hat: jnp.ndarray):
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for p, period in zip(params["discriminators"], h.mpd_reshapes):
        s_r, f_r = discriminator_p_apply(p, y, period)
        s_g, f_g = discriminator_p_apply(p, y_hat, period)
        y_d_rs.append(s_r)
        y_d_gs.append(s_g)
        fmap_rs.append(f_r)
        fmap_gs.append(f_g)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def init_discriminator_r(rng, h: BigVGANConfig):
    dm = h.discriminator_channel_mult
    c = int(32 * dm)
    rngs = jax.random.split(rng, 6)
    return {
        "convs": [
            _conv2d_init(rngs[0], 3, 9, 1, c),
            _conv2d_init(rngs[1], 3, 9, c, c),
            _conv2d_init(rngs[2], 3, 9, c, c),
            _conv2d_init(rngs[3], 3, 9, c, c),
            _conv2d_init(rngs[4], 3, 3, c, c),
        ],
        "conv_post": _conv2d_init(rngs[5], 3, 3, c, 1),
    }


def _stft_mag_jnp(x: jnp.ndarray, n_fft: int, hop: int, win_length: int) -> jnp.ndarray:
    """Magnitude STFT, center=False, RECTANGULAR window — DiscriminatorR's
    torch.stft call passes no window (models.py:381-389), which torch treats
    as ones over win_length, zero-padded centered to n_fft (parity pinned by
    tests/test_reference_oracle.py::TestDiscriminatorOracle)."""
    window = jnp.ones((win_length,))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = x[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec).transpose(0, 2, 1)  # [B, F, frames]


def discriminator_r_apply(params, x: jnp.ndarray, resolution):
    n_fft, hop, win_length = resolution
    xt = x[..., 0]  # [B, T]
    pad = int((n_fft - hop) / 2)
    xt = jnp.pad(xt, ((0, 0), (pad, pad)), mode="reflect")
    mag = _stft_mag_jnp(xt, n_fft, hop, win_length)  # [B, F, TT]
    # reference treats the spectrogram as [B, 1, F, TT]; ours is NHWC [B, F, TT, 1]
    h = mag[..., None]
    fmap = []
    for i, conv in enumerate(params["convs"]):
        if i == 0:
            h = conv2d(h, conv["weight"], conv["bias"], padding=(1, 4))
        elif i < 4:
            h = conv2d(h, conv["weight"], conv["bias"], stride=(1, 2), padding=(1, 4))
        else:
            h = conv2d(h, conv["weight"], conv["bias"], padding=(1, 1))
        h = leaky_relu(h, 0.1)
        fmap.append(h)
    h = conv2d(h, params["conv_post"]["weight"], params["conv_post"]["bias"], padding=(1, 1))
    fmap.append(h)
    return h.reshape(h.shape[0], -1), fmap


def init_mrd(rng, h: BigVGANConfig):
    rngs = jax.random.split(rng, len(h.resolutions))
    return {"discriminators": [init_discriminator_r(r, h) for r in rngs]}


def mrd_apply(params, h: BigVGANConfig, y: jnp.ndarray, y_hat: jnp.ndarray):
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for p, res in zip(params["discriminators"], h.resolutions):
        s_r, f_r = discriminator_r_apply(p, y, res)
        s_g, f_g = discriminator_r_apply(p, y_hat, res)
        y_d_rs.append(s_r)
        y_d_gs.append(s_g)
        fmap_rs.append(f_r)
        fmap_gs.append(f_g)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# GAN losses (reference: models.py:420-451)
# ---------------------------------------------------------------------------


def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
