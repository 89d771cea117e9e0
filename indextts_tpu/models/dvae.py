"""DiscreteVAE: the mel codebook that defines the GPT's 8192-entry speech
token vocabulary (functional JAX).

Behavioral reference: indextts/vqvae/xtts_dvae.py — 1D conv VQ-VAE
(positional_dims=1, stride-2 encoder, nearest-upsample decoder when
use_transposed_convs=False), EMA codebook `Quantize` with straight-through
estimator (xtts_dvae.py:51-129), get_codebook_indices / decode / infer
(xtts_dvae.py:323-357), and training forward with reconstruction +
commitment losses (xtts_dvae.py:362-382).

The reference's only collective — torch.distributed.all_reduce over the
codebook EMA stats (xtts_dvae.py:107-109) — becomes jax.lax.psum over a named
mesh axis in `quantize_ema_update`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import DVAEConfig
from indextts_tpu.ops.activations import relu, silu
from indextts_tpu.ops.conv import conv1d, conv2d

Params = Dict[str, Any]


from indextts_tpu.models.conformer import _conv_init_1d


def _conv_init_2d(rng, k, cin, cout):
    """torch nn.Conv2d default init (kaiming_uniform a=sqrt(5)):
    uniform(+-1/sqrt(fan_in)), fan_in = cin*k*k. Weight layout HWIO
    (channels-last, matching ops/conv.conv2d)."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / np.sqrt(cin * k * k)
    return {
        "weight": jax.random.uniform(kw, (k, k, cin, cout), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _conv_init_for(cfg: DVAEConfig):
    """positional_dims routes Conv1d vs Conv2d (xtts_dvae.py:234-240)."""
    return _conv_init_2d if cfg.positional_dims == 2 else _conv_init_1d


def _conv(cfg: DVAEConfig, x, p, stride=1, padding=0):
    if cfg.positional_dims == 2:
        return conv2d(x, p["weight"], p["bias"], stride=stride, padding=padding)
    return conv1d(x, p["weight"], p["bias"], stride=stride, padding=padding)


def _resblock_init(rng, chan, conv_init=_conv_init_1d):
    r = jax.random.split(rng, 3)
    return {
        "conv0": conv_init(r[0], 3, chan, chan),
        "conv1": conv_init(r[1], 3, chan, chan),
        "conv2": conv_init(r[2], 1, chan, chan),
    }


def _arch(cfg: DVAEConfig):
    if cfg.num_layers == 0:
        # reference branch (xtts_dvae.py:275-279): no strided stages — the
        # encoder is a single 1x1 conv channels->hidden_dim + act, and both
        # innermost and the decoder output width are hidden_dim
        return [], [], cfg.hidden_dim
    enc_chans = [cfg.hidden_dim * (2**i) for i in range(cfg.num_layers)]
    dec_chans = list(reversed(enc_chans))
    enc_chans = [cfg.channels] + enc_chans
    dec_init_chan = cfg.codebook_dim if cfg.num_resnet_blocks == 0 else dec_chans[0]
    dec_chans = [dec_init_chan] + dec_chans
    return enc_chans, dec_chans, dec_chans[0]


def init_dvae(rng: jax.Array, cfg: DVAEConfig) -> Params:
    enc_chans, dec_chans, innermost = _arch(cfg)
    conv_init = _conv_init_for(cfg)
    rngs = jax.random.split(rng, 6 + 2 * cfg.num_layers + 2 * cfg.num_resnet_blocks)
    ri = iter(rngs)
    params: Params = {"enc_convs": [], "enc_res": [], "dec_convs": [], "dec_res": []}
    if cfg.num_layers == 0:
        # the reference's layer-less encoder entry (xtts_dvae.py:276)
        params["enc_in0"] = conv_init(next(ri), 1, cfg.channels, cfg.hidden_dim)
    for cin, cout in zip(enc_chans[:-1], enc_chans[1:]):
        params["enc_convs"].append(conv_init(next(ri), cfg.kernel_size, cin, cout))
    for _ in range(cfg.num_resnet_blocks):
        params["enc_res"].append(_resblock_init(next(ri), innermost, conv_init))
    params["enc_out"] = conv_init(next(ri), 1, innermost, cfg.codebook_dim)
    if cfg.num_resnet_blocks > 0:
        params["dec_in"] = conv_init(next(ri), 1, cfg.codebook_dim, innermost)
        for _ in range(cfg.num_resnet_blocks):
            params["dec_res"].append(_resblock_init(next(ri), innermost, conv_init))
    for cin, cout in zip(dec_chans[:-1], dec_chans[1:]):
        params["dec_convs"].append(conv_init(next(ri), cfg.kernel_size, cin, cout))
    dec_out_chans = dec_chans[-1] if dec_chans else innermost
    params["dec_out"] = conv_init(next(ri), 1, dec_out_chans, cfg.channels)
    embed = jax.random.normal(next(ri), (cfg.codebook_dim, cfg.num_tokens), jnp.float32)
    params["codebook"] = {
        "embed": embed,
        "cluster_size": jnp.zeros((cfg.num_tokens,), jnp.float32),
        "embed_avg": embed,  # reference: embed.clone() (xtts_dvae.py:68)
    }
    return params


def _act(cfg: DVAEConfig, x):
    return silu(x) if cfg.activation == "silu" else relu(x)


def _resblock(cfg, p, x):
    """conv3-act-conv3-act-conv1 with residual (xtts_dvae.py:171-183)."""
    h = _act(cfg, _conv(cfg, x, p["conv0"], padding=1))
    h = _act(cfg, _conv(cfg, h, p["conv1"], padding=1))
    h = _conv(cfg, h, p["conv2"])
    return h + x


def dvae_encode(params: Params, cfg: DVAEConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, channels] -> pre-quant logits [B, T/2^L, codebook_dim].
    With positional_dims=2 (xtts_dvae.py:234-240): image [B, H, W, channels]
    -> [B, H/2^L, W/2^L, codebook_dim]."""
    pad = (cfg.kernel_size - 1) // 2
    h = mel
    if "enc_in0" in params:  # num_layers == 0 (xtts_dvae.py:276)
        h = _act(cfg, _conv(cfg, h, params["enc_in0"]))
    for p in params["enc_convs"]:
        h = _act(cfg, _conv(cfg, h, p, stride=cfg.stride, padding=pad))
    for p in params["enc_res"]:
        h = _resblock(cfg, p, h)
    return _conv(cfg, h, params["enc_out"])


def _nearest_up(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch nn.Upsample(scale_factor, mode='nearest') on channels-last data:
    time axis for 1D [B, T, C], both spatial axes for 2D [B, H, W, C]."""
    x = jnp.repeat(x, factor, axis=1)
    if x.ndim == 4:
        x = jnp.repeat(x, factor, axis=2)
    return x


def dvae_decode_embeds(params: Params, cfg: DVAEConfig, h: jnp.ndarray) -> jnp.ndarray:
    """code embeddings [B, T', codebook_dim] -> mel [B, T'*2^L, channels].
    With positional_dims=2, a FLAT [B, N, codebook_dim] sequence is folded
    to the square sqrt(N) x sqrt(N) grid first — the reference decodes 2D
    code sequences the same way (xtts_dvae.py:341-348)."""
    if cfg.positional_dims == 2 and h.ndim == 3:
        side = int(round(float(np.sqrt(h.shape[1]))))
        h = h.reshape(h.shape[0], side, side, h.shape[2])
    pad = (cfg.kernel_size - 1) // 2
    if cfg.num_resnet_blocks > 0:
        h = _conv(cfg, h, params["dec_in"])
        for p in params["dec_res"]:
            h = _resblock(cfg, p, h)
    for p in params["dec_convs"]:
        if cfg.use_transposed_convs:
            raise NotImplementedError("IndexTTS DVAE uses nearest-upsample convs")
        h = _nearest_up(h, cfg.stride)
        h = _act(cfg, _conv(cfg, h, p, padding=pad))
    return _conv(cfg, h, params["dec_out"])


def quantize(codebook: Params, flat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest codebook entry (xtts_dvae.py:86-92). flat: [..., dim].
    Returns (quantized [..., dim], codes [...])."""
    embed = codebook["embed"]  # [dim, n]
    dist = (
        (flat**2).sum(-1, keepdims=True)
        - 2 * flat @ embed
        + (embed**2).sum(0, keepdims=True)
    )
    codes = jnp.argmin(dist, axis=-1)
    quantized = embed.T[codes]
    return quantized, codes


def get_codebook_indices(params: Params, cfg: DVAEConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """Tokenize: mel [B, T, C] -> codes [B, T/2^L] (xtts_dvae.py:323-330)."""
    logits = dvae_encode(params, cfg, mel)
    _, codes = quantize(params["codebook"], logits)
    return codes


def decode(params: Params, cfg: DVAEConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """Detokenize: codes [B, T'] -> mel [B, T, C] (xtts_dvae.py:332-351)."""
    embeds = params["codebook"]["embed"].T[codes]
    return dvae_decode_embeds(params, cfg, embeds)


def dvae_infer(params: Params, cfg: DVAEConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """Round-trip tokenize -> detokenize (xtts_dvae.py:353-357)."""
    return decode(params, cfg, get_codebook_indices(params, cfg, mel))


def dvae_forward(params: Params, cfg: DVAEConfig, mel: jnp.ndarray):
    """Training-style forward: (recon_loss, commitment_loss, out)
    (xtts_dvae.py:362-382, straight-through estimator)."""
    logits = dvae_encode(params, cfg, mel)
    quantized, codes = quantize(params["codebook"], logits)
    commitment = jnp.mean((jax.lax.stop_gradient(quantized) - logits) ** 2)
    quantized_st = logits + jax.lax.stop_gradient(quantized - logits)
    out = dvae_decode_embeds(params, cfg, quantized_st)
    # reference crops the LAST positional dim only (out[..., :img.shape[-1]]
    # in NCHW, xtts_dvae.py:377): time for 1D, width for 2D
    if cfg.positional_dims == 2:
        out = out[:, :, : mel.shape[2]]
    else:
        out = out[:, : mel.shape[1]]
    recon = jnp.mean((mel - out) ** 2)
    return recon, commitment, out


def discretization_loss(
    soft_onehot: jnp.ndarray, dim: int, expected_variance: float
) -> jnp.ndarray:
    """Fit discrete-bin utilization to a normal PDF (reference:
    xtts_dvae.py:135-168 without the store_past accumulator): average the
    soft assignments over all other dims, center, and sum the negative
    normal log-likelihood."""
    other = tuple(i for i in range(soft_onehot.ndim) if i != dim)
    averaged = soft_onehot.sum(axis=other) / soft_onehot.sum()
    averaged = averaged - averaged.mean()
    scale = expected_variance
    log_prob = -0.5 * (averaged / scale) ** 2 - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi)
    return jnp.sum(-log_prob)


def quantize_ema_update(
    codebook: Params,
    flat: jnp.ndarray,
    n_embed: int,
    decay: float = 0.99,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Params:
    """EMA codebook update (xtts_dvae.py:103-116). Under pmap/shard_map the
    per-device statistics are all-reduced with jax.lax.psum over `axis_name` —
    the TPU-native form of the reference's torch.distributed.all_reduce
    (xtts_dvae.py:107-109)."""
    flat2 = flat.reshape(-1, flat.shape[-1])
    _, codes = quantize(codebook, flat2)
    onehot = jax.nn.one_hot(codes, n_embed, dtype=flat2.dtype)
    onehot_sum = onehot.sum(0)  # [n]
    embed_sum = flat2.T @ onehot  # [dim, n]
    if axis_name is not None:
        onehot_sum = jax.lax.psum(onehot_sum, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)
    cluster_size = codebook["cluster_size"] * decay + onehot_sum * (1 - decay)
    embed_avg = codebook["embed_avg"] * decay + embed_sum * (1 - decay)
    n = cluster_size.sum()
    cluster = (cluster_size + eps) / (n + n_embed * eps) * n
    embed = embed_avg / cluster[None, :]
    return {"embed": embed, "cluster_size": cluster_size, "embed_avg": embed_avg}
