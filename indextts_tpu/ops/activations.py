"""Activation functions.

Snake/SnakeBeta follow indextts/BigVGAN/activations.py:9-122 (x + 1/(a+1e-9)·
sin²(ax), optional exp() for log-scale parameters); gelu_new is HF GPT-2's
tanh-approximated GELU (build_hf_gpt_transformer default, model.py:264).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_NO_DIV_BY_ZERO = 1e-9


def snake(x, alpha, alpha_logscale: bool = False):
    """x: [..., C] with per-channel alpha [C]."""
    a = jnp.exp(alpha) if alpha_logscale else alpha
    a = a.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    out = xf + (1.0 / (a + _NO_DIV_BY_ZERO)) * jnp.sin(xf * a) ** 2
    return out.astype(x.dtype)


def snake_beta(x, alpha, beta, alpha_logscale: bool = False):
    """x + 1/(b+eps)·sin²(ax) with per-channel alpha/beta [C]."""
    if alpha_logscale:
        a = jnp.exp(alpha)
        b = jnp.exp(beta)
    else:
        a, b = alpha, beta
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    out = xf + (1.0 / (b + _NO_DIV_BY_ZERO)) * jnp.sin(xf * a) ** 2
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


def leaky_relu(x, negative_slope: float = 0.1):
    return jnp.where(x >= 0, x, x * negative_slope)


def relu(x):
    return jnp.maximum(x, 0)


def tanh(x):
    return jnp.tanh(x)


def sigmoid(x):
    return jnp.reciprocal(1.0 + jnp.exp(-x.astype(jnp.float32))).astype(x.dtype)
