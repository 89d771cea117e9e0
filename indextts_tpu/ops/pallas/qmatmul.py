"""Int8-weight matmul kernel for the weight-streaming-bound decode path.

The AR decode reads every GPT matrix from HBM each step. XLA's int8 path
dequantizes through an HBM-materialized bf16 intermediate (measured: only
~8% gain), so this kernel does the dequant in VMEM: weights stream from HBM
as int8 blocks through Pallas's pipelined BlockSpecs, convert to bf16 in
registers, and hit the MXU — HBM sees half the bytes of bf16 weights.

y[B, N] = x[B, K] @ (wq[K, N].astype(bf16)) * scale[1, N] (+ bias)

Grid: (N/Nt, K/Kt) with K innermost so each output block stays resident in
VMEM across the K accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _kernel(x_ref, w_ref, s_ref, o_ref, *, n_k: int):
    from jax.experimental import pallas as pl

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = w_ref[:].astype(jnp.bfloat16)
    o_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = o_ref[:] * s_ref[:].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret"))
def int8_matmul(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    tile_n: int = 512,
    tile_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, K] (any float dtype); wq: [K, N] int8; scale: [..., N] f32.
    Returns [B, N] in x.dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k = x.shape
    k2, n = wq.shape
    assert k == k2
    scale2 = scale.reshape(1, n)
    # pad to tiles
    n_pad = -n % tile_n
    k_pad = -k % tile_k
    b_pad = -b % 8
    if n_pad or k_pad:
        wq = jnp.pad(wq, ((0, k_pad), (0, n_pad)))
        scale2 = jnp.pad(scale2, ((0, 0), (0, n_pad)))
    if k_pad or b_pad:
        x = jnp.pad(x, ((0, b_pad), (0, k_pad)))
    bp, kp, np_ = x.shape[0], k + k_pad, n + n_pad
    n_k = kp // tile_k

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(np_ // tile_n, n_k),
        in_specs=[
            pl.BlockSpec((bp, tile_k), lambda ni, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda ni, ki: (0, ni), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, tile_n), lambda ni, ki: (0, ni), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, np_), jnp.float32),
        interpret=interpret,
    )(x, wq, scale2)
    out = out[:b, :n].astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
