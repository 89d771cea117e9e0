"""1D/2D convolution primitives with torch-compatible semantics.

All model tensors use channels-last layout ([B, T, C] / [B, H, W, C]) — the
layout XLA:TPU prefers — while weights are stored in lax-native [K..., Cin,
Cout] order (the torch->jax converter transposes once at load time). Padding
semantics (torch explicit int pads, SpeechBrain "same" reflect pads, causal
pads) are reproduced exactly so published checkpoints evaluate bit-comparably.

Behavioral references: torch.nn.Conv1d/ConvTranspose1d as used by
indextts/BigVGAN/models.py, indextts/BigVGAN/nnet/CNN.py:305-519 (reflect
"same" padding), indextts/gpt/conformer/subsampling.py (2D valid convs).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

PadLike = Union[int, str, Tuple[int, int]]


def _pad_pair(padding: PadLike, kernel_size: int, dilation: int) -> Tuple[int, int]:
    if isinstance(padding, str):
        if padding == "valid":
            return (0, 0)
        if padding == "same":  # torch Conv1d same (stride 1, symmetric)
            total = dilation * (kernel_size - 1)
            return (total // 2, total - total // 2)
        raise ValueError(padding)
    if isinstance(padding, int):
        return (padding, padding)
    return tuple(padding)  # type: ignore[return-value]


def conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: PadLike = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """x: [B, T, Cin]; weight: [K, Cin/groups, Cout] -> [B, T', Cout]."""
    pads = _pad_pair(padding, weight.shape[0], dilation)
    out = lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=(stride,),
        padding=(pads,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_transpose1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d semantics.

    x: [B, T, Cin]; weight: [K, Cout/groups, Cin] (lax layout for the
    underlying fractionally-strided conv after kernel flip).
    out length = (T-1)*stride - 2*padding + K + output_padding.
    """
    k = weight.shape[0]
    # transposed conv == lhs-dilated conv with flipped kernel
    w = jnp.flip(weight, axis=0)
    pad_l = k - 1 - padding
    pad_r = k - 1 - padding + output_padding
    if groups == 1:
        out = lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1,),
            padding=((pad_l, pad_r),),
            lhs_dilation=(stride,),
            dimension_numbers=("NHC", "HOI", "NHC"),
        )
    else:
        # grouped transposed conv (depthwise anti-alias upsampler):
        # run the lhs-dilated conv with feature groups. lax requires the
        cin = x.shape[-1]
        cout_per_group = weight.shape[1]
        # weight came in as [K, Cout/groups, Cin]; for grouped conv we need
        # [K, Cin/groups, Cout]. torch stores transposed-conv weight as
        # [Cin, Cout/groups, K]; the converter gives us [K, Cout/groups, Cin].
        # Regroup: Cin = groups * (Cin/groups); each group's kernel block is
        # [K, Cin/groups, Cout/groups].
        cin_per_group = cin // groups
        wg = w.reshape(k, cout_per_group, groups, cin_per_group)
        wg = jnp.transpose(wg, (0, 3, 2, 1)).reshape(k, cin_per_group, groups * cout_per_group)
        out = lax.conv_general_dilated(
            x,
            wg.astype(x.dtype),
            window_strides=(1,),
            padding=((pad_l, pad_r),),
            lhs_dilation=(stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=groups,
        )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int], str] = 0,
    dilation: Union[int, Tuple[int, int]] = 1,
) -> jnp.ndarray:
    """x: [B, H, W, Cin]; weight: [Kh, Kw, Cin, Cout]."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        pads = ((padding, padding), (padding, padding))
    elif isinstance(padding, str):
        pads = padding
    else:
        pads = ((padding[0], padding[0]), (padding[1], padding[1]))
    out = lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=stride,
        padding=pads,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def pad1d(x: jnp.ndarray, pad: Tuple[int, int], mode: str = "constant", value: float = 0.0) -> jnp.ndarray:
    """Pad the time axis of [B, T, C] with torch F.pad semantics
    (constant / reflect / replicate)."""
    cfg = ((0, 0), tuple(pad), (0, 0))
    if mode == "constant":
        return jnp.pad(x, cfg, mode="constant", constant_values=value)
    if mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    if mode == "replicate":
        return jnp.pad(x, cfg, mode="edge")
    raise ValueError(mode)


def sb_same_pad(x: jnp.ndarray, kernel_size: int, dilation: int, mode: str = "reflect") -> jnp.ndarray:
    """SpeechBrain Conv1d 'same' padding (reference: nnet/CNN.py:430-446 +
    get_padding_elem): symmetric dilation*(kernel-1)//2 pads in reflect mode
    for stride-1 odd kernels (the only configuration ECAPA uses)."""
    total = dilation * (kernel_size - 1)
    return pad1d(x, (total // 2, total - total // 2), mode=mode)


def weight_norm_fold(weight_v: jnp.ndarray, weight_g: jnp.ndarray) -> jnp.ndarray:
    """Fold torch weight_norm (g * v/||v||, norm over all dims except dim=0)
    at conversion time — the reference folds at load via remove_weight_norm()
    (models.py:252-260, infer.py:66). Operates in torch layout [Cout, ...].
    dim=0 only: every reference module weight-norms the default dim."""
    import numpy as np

    v = np.asarray(weight_v)
    g = np.asarray(weight_g)
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
    return (g * (v / norm)).astype(v.dtype)
