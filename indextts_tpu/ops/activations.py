"""Activation functions.

Snake/SnakeBeta follow indextts/BigVGAN/activations.py:9-122 (x + 1/(a+1e-9)·
sin²(ax), optional exp() for log-scale parameters); gelu_new is HF GPT-2's
tanh-approximated GELU (build_hf_gpt_transformer default, model.py:264).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

_NO_DIV_BY_ZERO = 1e-9

# degree-9 odd minimax polynomial for sin on [-pi, pi] (least-squares fit;
# max abs error 3.64e-5 over [-50, 50] incl. fp32 range reduction)
_SIN_C0 = 9.9999728997e-01
_SIN_C1 = -1.6665146137e-01
_SIN_C2 = 8.3198438631e-03
_SIN_C3 = -1.9424185428e-04
_SIN_C4 = 2.2248903691e-06
_INV_TWO_PI = 1.0 / (2.0 * math.pi)
_TWO_PI = 2.0 * math.pi


def approx_sin(u):
    """Range-reduced polynomial sin, fp32 in/out. Max abs error 3.64e-5 —
    ~100x below bf16 resolution (2^-8 ~ 3.9e-3 relative).

    XLA's exact sin dominates the VPU in the vocoder's anti-aliased snake
    (measured 6.4 ms per activation site at the last BigVGAN stage vs ~0 for
    this polynomial, tools/profile_sin.py); in bf16 the difference is below
    output quantization, so bf16 snake uses this by default. The reference's
    own fused CUDA kernel computes sinf in fp32 fast-math territory
    (anti_alias_activation_cuda.cu) — same spirit.
    """
    k = jnp.round(u * _INV_TWO_PI)
    r = u - k * _TWO_PI
    r2 = r * r
    p = _SIN_C0 + r2 * (_SIN_C1 + r2 * (_SIN_C2 + r2 * (_SIN_C3 + r2 * _SIN_C4)))
    return r * p


def _sin_for(x, approx: Optional[bool]):
    use_approx = (x.dtype == jnp.bfloat16) if approx is None else approx
    return approx_sin if use_approx else jnp.sin


def snake(x, alpha, alpha_logscale: bool = False, approx_sin_: Optional[bool] = None):
    """x: [..., C] with per-channel alpha [C]. approx_sin_: None = approximate
    iff bf16 (error below quantization); force with True/False."""
    sin_fn = _sin_for(x, approx_sin_)
    a = jnp.exp(alpha) if alpha_logscale else alpha
    a = a.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    out = xf + (1.0 / (a + _NO_DIV_BY_ZERO)) * sin_fn(xf * a) ** 2
    return out.astype(x.dtype)


def snake_beta(x, alpha, beta, alpha_logscale: bool = False, approx_sin_: Optional[bool] = None):
    """x + 1/(b+eps)·sin²(ax) with per-channel alpha/beta [C]."""
    sin_fn = _sin_for(x, approx_sin_)
    if alpha_logscale:
        a = jnp.exp(alpha)
        b = jnp.exp(beta)
    else:
        a, b = alpha, beta
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    out = xf + (1.0 / (b + _NO_DIV_BY_ZERO)) * sin_fn(xf * a) ** 2
    return out.astype(x.dtype)


def gelu_new(x):
    """HF 'gelu_new' (GPT-2 tanh approximation)."""
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf**3)))
    return out.astype(x.dtype)


def gelu(x):
    """Exact erf GELU (perceiver GEGLU uses F.gelu, perceiver.py:204-207)."""
    from jax.scipy.special import erf

    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + erf(xf / math.sqrt(2.0)))).astype(x.dtype)


def silu(x):
    return x * jnp.reciprocal(1.0 + jnp.exp(-x.astype(jnp.float32))).astype(x.dtype)


def glu(x, axis: int = -1):
    """torch F.glu: first half * sigmoid(second half)."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jnp.reciprocal(1.0 + jnp.exp(-b.astype(jnp.float32))).astype(x.dtype)


def leaky_relu(x, negative_slope: float = 0.01):
    """torch F.leaky_relu; default slope 0.01 MATCHES torch (every vocoder
    call site passes 0.1 explicitly — a divergent default would silently
    10x the negative slope for any future torch-parity port)."""
    return jnp.where(x >= 0, x, x * negative_slope)


def relu(x):
    return jnp.maximum(x, 0)


def tanh(x):
    return jnp.tanh(x)


def sigmoid(x):
    return jnp.reciprocal(1.0 + jnp.exp(-x.astype(jnp.float32))).astype(x.dtype)
