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
from functools import lru_cache

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
    # depthwise transposed conv: identical filter per channel
    w = jnp.asarray(filt)[:, None, None] * jnp.ones((1, 1, c), dtype=x.dtype)  # [K, 1(out/g), C(in)]
    xp = pad1d(x, (pad, pad), mode="replicate")
    y = ratio * conv_transpose1d(xp, w, stride=stride, padding=0, groups=c)
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
    w = jnp.asarray(filt)[:, None, None] * jnp.ones((1, 1, c), dtype=x.dtype)  # [K, 1(in/g), C(out)]
    xp = pad1d(x, (pad_left, pad_right), mode="replicate")
    return conv1d(xp, w, stride=ratio, padding=0, groups=c)


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
