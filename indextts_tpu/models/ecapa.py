"""ECAPA-TDNN speaker encoder (functional JAX).

Behavioral reference: indextts/BigVGAN/ECAPA_TDNN.py:429-581 — TDNN blocks
with reflect 'same' padding (SpeechBrain Conv1d), Res2Net with dilation,
SE blocks, multi-layer feature aggregation, attentive statistics pooling
(mean+std with global context), BatchNorm (eval mode running stats), and a
final 1x1 conv projection. Used inside BigVGAN.forward for speaker
conditioning (models.py:191,202).

Layout: channels-last [B, T, C]. Params are nested dicts of jnp arrays.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops.activations import relu, sigmoid, tanh
from indextts_tpu.ops.conv import conv1d, sb_same_pad
from indextts_tpu.ops.norms import batch_norm_inference

Params = Dict[str, Any]

# fixed architecture hyperparameters (reference: ECAPA_TDNN.py:470-484)
CHANNELS = (512, 512, 512, 512, 1536)
KERNEL_SIZES = (5, 3, 3, 3, 1)
DILATIONS = (1, 2, 3, 4, 1)
ATTENTION_CHANNELS = 128
RES2NET_SCALE = 8
SE_CHANNELS = 128


# torch Conv1d default init (kaiming_uniform(a=sqrt(5)) ~ U(-b, b)): ONE
# definition lives in conformer.py — three hand-copies had already drifted
# into existence across ecapa/dvae/conformer before round 3's dedup
from indextts_tpu.models.conformer import _conv_init_1d as _init_conv


def _init_bn(c):
    return {
        "weight": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "running_mean": jnp.zeros((c,), jnp.float32),
        "running_var": jnp.ones((c,), jnp.float32),
    }


def _init_tdnn(rng, cin, cout, k):
    return {"conv": _init_conv(rng, k, cin, cout), "bn": _init_bn(cout)}


def init_ecapa(rng: jax.Array, input_size: int = 100, lin_neurons: int = 512) -> Params:
    rngs = jax.random.split(rng, 64)
    ri = iter(rngs)
    params: Params = {}
    params["block0"] = _init_tdnn(next(ri), input_size, CHANNELS[0], KERNEL_SIZES[0])
    for i in range(1, 4):
        cin, cout = CHANNELS[i - 1], CHANNELS[i]
        hid = cout // RES2NET_SCALE
        block = {
            "tdnn1": _init_tdnn(next(ri), cin, cout, 1),
            "res2net": [
                _init_tdnn(next(ri), hid, hid, KERNEL_SIZES[i]) for _ in range(RES2NET_SCALE - 1)
            ],
            "tdnn2": _init_tdnn(next(ri), cout, cout, 1),
            "se_conv1": _init_conv(next(ri), 1, cout, SE_CHANNELS),
            "se_conv2": _init_conv(next(ri), 1, SE_CHANNELS, cout),
        }
        params[f"block{i}"] = block
    params["mfa"] = _init_tdnn(next(ri), CHANNELS[-2] * 3, CHANNELS[-1], KERNEL_SIZES[-1])
    params["asp_tdnn"] = _init_tdnn(next(ri), CHANNELS[-1] * 3, ATTENTION_CHANNELS, 1)
    params["asp_conv"] = _init_conv(next(ri), 1, ATTENTION_CHANNELS, CHANNELS[-1])
    params["asp_bn"] = _init_bn(CHANNELS[-1] * 2)
    params["fc"] = _init_conv(next(ri), 1, CHANNELS[-1] * 2, lin_neurons)
    return params


def _tdnn_block(p: Params, x: jnp.ndarray, kernel_size: int, dilation: int) -> jnp.ndarray:
    """conv(same, reflect) -> relu -> batchnorm (reference: ECAPA_TDNN.py:79-128)."""
    if kernel_size > 1:
        x = sb_same_pad(x, kernel_size, dilation, mode="reflect")
    x = conv1d(x, p["conv"]["weight"], p["conv"]["bias"], dilation=dilation)
    x = relu(x)
    return batch_norm_inference(
        x, p["bn"]["weight"], p["bn"]["bias"], p["bn"]["running_mean"], p["bn"]["running_var"]
    )


def _length_masks(x: jnp.ndarray, lengths: Optional[jnp.ndarray]):
    """[B, 1-per-frame] mask from relative lengths (reference: length_to_mask,
    ECAPA_TDNN.py:16-61 — lengths are fractions of the padded length)."""
    b, t, _ = x.shape
    if lengths is None:
        return jnp.ones((b, t, 1), dtype=jnp.float32)
    # strict float < (ceil semantics), NOT round: the reference's
    # length_to_mask compares arange < lengths*T directly, so 0.345*100
    # keeps 35 frames — rounding would drop one and shift the SE/ASP
    # statistics for fractional relative lengths
    abs_len = lengths.astype(jnp.float32) * t
    mask = (jnp.arange(t, dtype=jnp.float32)[None, :] < abs_len[:, None]).astype(jnp.float32)
    return mask[:, :, None]


def _se_block(p: Params, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Squeeze-and-excitation with masked mean (reference: ECAPA_TDNN.py:194-242)."""
    total = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    s = (x * mask).sum(axis=1, keepdims=True) / total
    s = relu(conv1d(s, p["se_conv1"]["weight"], p["se_conv1"]["bias"]))
    s = sigmoid(conv1d(s, p["se_conv2"]["weight"], p["se_conv2"]["bias"]))
    return s * x


def _res2net(p_list: List[Params], x: jnp.ndarray, kernel_size: int, dilation: int) -> jnp.ndarray:
    """Res2Net split-accumulate over channel chunks (reference: ECAPA_TDNN.py:131-191)."""
    chunks = jnp.split(x, RES2NET_SCALE, axis=-1)
    outs = [chunks[0]]
    y = None
    for i in range(1, RES2NET_SCALE):
        inp = chunks[i] if i == 1 else chunks[i] + y
        y = _tdnn_block(p_list[i - 1], inp, kernel_size, dilation)
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def _asp(params: Params, x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Attentive statistics pooling -> [B, 1, 2C]
    (reference: ECAPA_TDNN.py:245-338, global_context=True)."""
    total = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    m = mask / total
    mean = (m * x).sum(axis=1, keepdims=True)  # [B, 1, C]
    std = jnp.sqrt(jnp.clip((m * (x - mean) ** 2).sum(axis=1, keepdims=True), eps, None))
    attn_in = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
    )
    attn = _tdnn_block(params["asp_tdnn"], attn_in, 1, 1)
    attn = conv1d(tanh(attn), params["asp_conv"]["weight"], params["asp_conv"]["bias"])
    attn = jnp.where(mask == 0, -jnp.inf, attn)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1).astype(x.dtype)
    mean = (attn * x).sum(axis=1)  # [B, C]
    std = jnp.sqrt(jnp.clip((attn * (x - mean[:, None, :]) ** 2).sum(axis=1), eps, None))
    return jnp.concatenate([mean, std], axis=-1)[:, None, :]  # [B, 1, 2C]


def ecapa_apply(params: Params, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: [B, T, n_mels] -> speaker embedding [B, 1, lin_neurons]
    (reference: ECAPA_TDNN.py:543-581)."""
    mask = _length_masks(x, lengths)
    feats = []
    h = _tdnn_block(params["block0"], x, KERNEL_SIZES[0], DILATIONS[0])
    feats.append(h)
    for i in range(1, 4):
        p = params[f"block{i}"]
        residual = h
        h = _tdnn_block(p["tdnn1"], h, 1, 1)
        h = _res2net(p["res2net"], h, KERNEL_SIZES[i], DILATIONS[i])
        h = _tdnn_block(p["tdnn2"], h, 1, 1)
        h = _se_block(p, h, mask)
        h = h + residual
        feats.append(h)
    h = jnp.concatenate(feats[1:], axis=-1)  # multi-layer aggregation
    h = _tdnn_block(params["mfa"], h, KERNEL_SIZES[-1], DILATIONS[-1])
    h = _asp(params, h, mask)
    h = batch_norm_inference(
        h,
        params["asp_bn"]["weight"],
        params["asp_bn"]["bias"],
        params["asp_bn"]["running_mean"],
        params["asp_bn"]["running_var"],
    )
    return conv1d(h, params["fc"]["weight"], params["fc"]["bias"])
