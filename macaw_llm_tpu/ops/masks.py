"""Additive attention masks.

Reference semantics: `_make_causal_mask` (modeling.py:44-58) builds a lower-
triangular additive mask filled with finfo.min supporting a KV-cache offset;
`_expand_mask` (modeling.py:62-73) inverts a [B, S] padding mask into an
additive [B, 1, T, S] mask. On TPU we keep masks in fp32 and add them to
pre-softmax logits (softmax is computed in fp32 anyway).
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def causal_mask(q_len: int, kv_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """[1, 1, q_len, kv_len] additive causal mask.

    Query position i (offset by kv_len - q_len, the past length) may attend
    to kv positions <= i + (kv_len - q_len).
    """
    offset = kv_len - q_len
    q_pos = jnp.arange(q_len)[:, None] + offset
    k_pos = jnp.arange(kv_len)[None, :]
    allowed = k_pos <= q_pos
    mask = jnp.where(allowed, 0.0, NEG_INF).astype(dtype)
    return mask[None, None, :, :]


def padding_mask(attention_mask: jnp.ndarray, q_len: int,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Expand [B, S] {0,1} mask to additive [B, 1, q_len, S]."""
    inverted = (1.0 - attention_mask.astype(jnp.float32))
    mask = inverted * NEG_INF
    return jnp.broadcast_to(
        mask[:, None, None, :],
        (attention_mask.shape[0], 1, q_len, attention_mask.shape[1]),
    ).astype(dtype)


def combine_masks(*masks) -> jnp.ndarray:
    """Sum additive masks, clamping at NEG_INF (reference clamps post-add
    with torch.max(w, finfo.min), modeling.py:196-199)."""
    total = None
    for m in masks:
        if m is None:
            continue
        total = m if total is None else total + m
    if total is None:
        return None
    return jnp.maximum(total, NEG_INF)
