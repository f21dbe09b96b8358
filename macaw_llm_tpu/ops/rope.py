"""Rotary position embeddings, rotate-half formulation.

Matches the reference math (modeling.py:76-123): inv_freq = base^(-2i/d),
cos/sin gathered by position ids, rotate_half(x) = [-x2, x1] on split halves.
Unlike the reference's cached-buffer approach (LlamaRotaryEmbedding
cos_cached/sin_cached), we compute cos/sin inside the jitted function — XLA
constant-folds or fuses the small einsum, and there is no dynamic cache
re-expansion (which would be a retrace hazard on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, head_dim: int,
                 base: float = 10000.0,
                 dtype: jnp.dtype = jnp.float32):
    """cos/sin tables for given integer positions.

    Args:
      positions: int array [...]. Typically [B, S] or [S].
      head_dim: per-head dimension (even).
    Returns:
      (cos, sin) each shaped positions.shape + (head_dim,).
    """
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                               / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., d/2]
    angles = jnp.concatenate([angles, angles], axis=-1)           # [..., d]
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray,
               cos: jnp.ndarray, sin: jnp.ndarray):
    """Apply rotary embedding to q/k.

    q, k: [B, S, N, D] (batch, seq, heads, head_dim)
    cos, sin: [B, S, D] or [S, D] — broadcast over the heads axis.
    """
    cos = jnp.expand_dims(cos, axis=-2)  # [..., 1, D]
    sin = jnp.expand_dims(sin, axis=-2)
    q_out = q * cos + _rotate_half(q) * sin
    k_out = k * cos + _rotate_half(k) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
