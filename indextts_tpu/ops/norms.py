"""Normalization layers (functional, channels-last).

Behavioral references: torch LayerNorm/GroupNorm/BatchNorm1d as used across
the reference models; GroupNorm32 fp32 compute (indextts/utils/arch_util.py:19-21);
perceiver RMSNorm = F.normalize(x, dim=-1) * sqrt(d) * gamma
(indextts/gpt/perceiver.py:167-186).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def layer_norm(x, gamma, beta, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(x.dtype)


def rms_norm(x, gamma: Optional[jnp.ndarray], scale: float, eps: float = 1e-12):
    """F.normalize(x, dim=-1) * scale * gamma (torch eps clamps the norm)."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt((xf**2).sum(axis=-1, keepdims=True))
    out = xf / jnp.maximum(norm, eps) * scale
    if gamma is not None:
        out = out * gamma.astype(jnp.float32)
    return out.astype(x.dtype)


def group_norm(x, gamma, beta, num_groups: int, eps: float = 1e-5):
    """GroupNorm over channels-last [..., T, C]; fp32 compute then cast back
    (GroupNorm32 semantics, arch_util.py:19-21)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    *lead, t, c = xf.shape
    g = num_groups
    xg = xf.reshape(*lead, t, g, c // g)
    # normalize over (time, within-group channels) per torch GroupNorm on [B, C, T]
    axes = (-3, -1)
    mean = xg.mean(axis=axes, keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=axes, keepdims=True)
    xg = (xg - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = xg.reshape(*lead, t, c) * gamma + beta
    return out.astype(orig_dtype)


def batch_norm_inference(x, gamma, beta, running_mean, running_var, eps: float = 1e-5):
    """Eval-mode BatchNorm1d over the channel axis of [..., C]."""
    inv = jnp.reciprocal(jnp.sqrt(running_var.astype(jnp.float32) + eps))
    out = (x.astype(jnp.float32) - running_mean) * inv * gamma + beta
    return out.astype(x.dtype)
