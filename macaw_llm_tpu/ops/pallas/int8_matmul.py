"""Pallas int8 weight-only matmul for the decode path.

Decode streams every weight once per token, so it is HBM-bandwidth-bound.
XLA's dequantize-then-matmul materializes a bf16 copy of the weights (the
int8 saving mostly evaporates); this kernel streams the int8 blocks into
VMEM, converts there, and feeds the MXU — the HBM read stays 1 byte/param.

out[m, n] = sum_k x[m, k] * w_int8[k, n] * scale[n]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]                                     # [M, K] bf16
    w = w_ref[:].astype(jnp.bfloat16)                # [K, bn] int8 -> bf16
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0][None, :]).astype(o_ref.dtype)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_n",))
def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                block_n: int = 512) -> jnp.ndarray:
    """x [M, K] (bf16/fp32) @ int8 w [K, N] * scale -> [M, N] in x.dtype.

    scale: [1, N] or [N] fp32 per-output-channel. Pads M to 8 sublanes and
    N to the block size; K must be a multiple of 128 (true for all LLaMA
    dims here). Interprets on non-TPU backends.
    """
    m, k = x.shape
    n = w_q.shape[1]
    scale = scale.reshape(1, -1).astype(jnp.float32)

    xp = _pad_to(x, 8, 0)
    wq = _pad_to(w_q, block_n, 1)
    sp = _pad_to(scale, block_n, 1)
    mp, np_ = xp.shape[0], wq.shape[1]

    out = pl.pallas_call(
        _kernel,
        grid=(np_ // block_n,),
        in_specs=[
            pl.BlockSpec((mp, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xp, wq, sp)
    return out[:m, :n]
