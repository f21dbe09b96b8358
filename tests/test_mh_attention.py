"""Parity tests for the fused short-seq multi-head attention kernel
(ops/pallas/mh_attention.py) against the einsum reference
(ops.attention.dot_product_attention) — the exact-math contract the
LLM prefill path relies on (llama._attention routes short no-cache
attention through it; reference LlamaAttention modeling.py:190-208).

Runs in Pallas interpret mode on the CPU mesh (tests/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macaw_llm_tpu.ops import causal_mask, combine_masks, padding_mask
from macaw_llm_tpu.ops.attention import dot_product_attention
from macaw_llm_tpu.ops.pallas.mh_attention import (NEG_INF,
                                                  fits_mh_attention,
                                                  mh_attention)

rng = np.random.RandomState(0)


def _case(b, s, n, d, dtype):
    mk = lambda: jnp.asarray(rng.randn(b, s, n, d) * 0.3, dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("causal,pad_row,dtype", [
    (True, True, jnp.bfloat16),    # LLM prefill: causal + padded rows
    (True, False, jnp.bfloat16),
    (False, False, jnp.float32),   # encoder-style, fp32 exactness
    (False, True, jnp.float32),
])
def test_matches_einsum(causal, pad_row, dtype):
    b, s, n, d = 2, 312, 4, 128
    q, k, v = _case(b, s, n, d, dtype)
    am = np.ones((b, s), np.int32)
    if pad_row:
        am[-1, s // 2:] = 0
    bias = jnp.where(jnp.asarray(am) == 1, 0.0, NEG_INF).astype(
        jnp.float32)
    mask = combine_masks(causal_mask(s, s) if causal else None,
                         padding_mask(jnp.asarray(am), s))
    ref = dot_product_attention(q, k, v, mask)
    out = mh_attention(q, k, v, bias, causal=causal)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    valid = np.broadcast_to(
        np.asarray(am)[:, :, None, None].astype(bool), diff.shape)
    tol = 6e-3 if dtype == jnp.bfloat16 else 3e-5
    assert diff[valid].max() < tol, diff[valid].max()


def test_no_bias_odd_shapes_and_head_dim_64():
    # CLIP-like: 197 tokens (non-8/128-aligned), 12 heads of 64
    q, k, v = _case(2, 197, 12, 64, jnp.float32)
    ref = dot_product_attention(q, k, v, None)
    out = mh_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=3e-5)


def test_fully_masked_row_is_finite_zero():
    q, k, v = _case(1, 64, 2, 128, jnp.float32)
    am = np.zeros((1, 64), np.int32)  # ALL keys masked
    bias = jnp.full((1, 64), NEG_INF, jnp.float32)
    out = np.asarray(mh_attention(q, k, v, bias, causal=False), np.float32)
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_grads_match_einsum_reference():
    q, k, v = _case(2, 136, 4, 64, jnp.float32)

    def loss(fn):
        f = lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    mask = causal_mask(136, 136)
    ge = loss(lambda q, k, v: dot_product_attention(q, k, v, mask))
    gm = loss(lambda q, k, v: mh_attention(q, k, v, None, causal=True))
    for a, b in zip(ge, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fits_predicate():
    assert fits_mh_attention(312, 312, 128)     # the 7b fused-prefill shape
    assert fits_mh_attention(197, 197, 64)      # CLIP frames
    assert not fits_mh_attention(312, 512, 128)  # cross lengths
    assert not fits_mh_attention(2048, 2048, 128)  # long-context
