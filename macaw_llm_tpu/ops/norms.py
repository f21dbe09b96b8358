"""Normalization ops.

RMSNorm matches the reference's LlamaRMSNorm (modeling.py:302-319): variance
computed in fp32, rsqrt, result cast back to the weight dtype so bf16
activations stay bf16 on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMS normalization over the last axis, variance in fp32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    variance = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jnp.reciprocal(jnp.sqrt(variance + eps))
    return (weight * xf.astype(dtype)).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """Standard LayerNorm over the last axis (CLIP/Whisper towers).

    Stats in fp32 for bf16 stability, output cast back to input dtype.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)
