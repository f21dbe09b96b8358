"""Pallas flash attention vs the einsum reference path (interpret mode on
CPU; the same kernel compiles for TPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from macaw_llm_tpu.ops import causal_mask, combine_masks, \
    dot_product_attention, padding_mask
from macaw_llm_tpu.ops.pallas import flash_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode():
    """Interpret on CPU; with MACAW_TEST_TPU=1 the kernels compile for
    the real chip (Mosaic) — the on-chip numerics run VERDICT r1 asked
    for (interpret-mode passes don't validate Mosaic block rules)."""
    import os
    if os.environ.get("MACAW_TEST_TPU") == "1":
        yield
        return
    with pltpu.force_tpu_interpret_mode():
        yield


def ref_attention(q, k, v, mask=None):
    return dot_product_attention(q, k, v, mask)


def make_qkv(b=1, s=256, n=2, d=64, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, s, n, d), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(b, s, n, d), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(b, s, n, d), jnp.float32) * 0.3
    return q, k, v


class TestForward:
    def test_causal_matches_reference(self):
        q, k, v = make_qkv(s=256)
        out = fa.flash_attention(q, k, v, block_q=128, block_k=128)
        exp = ref_attention(q, k, v, causal_mask(256, 256))
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                                   rtol=2e-3, atol=2e-5)

    def test_non_causal(self):
        q, k, v = make_qkv(s=128)
        out = fa.flash_attention(q, k, v, causal=False, block_q=128,
                                 block_k=128)
        exp = ref_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                                   rtol=2e-3, atol=2e-5)

    def test_padding_bias(self):
        q, k, v = make_qkv(b=2, s=128)
        am = np.ones((2, 128), np.int32)
        am[0, 100:] = 0
        bias = jnp.where(jnp.asarray(am) == 1, 0.0, fa.NEG_INF)
        out = fa.flash_attention(q, k, v, padding_bias=bias, block_q=128,
                                 block_k=128)
        exp = ref_attention(q, k, v, combine_masks(
            causal_mask(128, 128), padding_mask(jnp.asarray(am), 128)))
        # padded query rows are undefined in both; compare valid rows
        np.testing.assert_allclose(np.asarray(out)[0, :100],
                                   np.asarray(exp)[0, :100], rtol=2e-3,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(out)[1], np.asarray(exp)[1],
                                   rtol=2e-3, atol=2e-5)

    def test_unaligned_seq_len_padding(self):
        q, k, v = make_qkv(s=315)  # the fused multimodal length
        out = fa.flash_attention(q, k, v, block_q=128, block_k=128)
        exp = ref_attention(q, k, v, causal_mask(315, 315))
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                                   rtol=2e-3, atol=2e-5)


class TestBackward:
    def test_grads_match_reference(self):
        q, k, v = make_qkv(s=128, n=1)

        def loss_flash(q, k, v):
            return fa.flash_attention(q, k, v, block_q=128,
                                      block_k=128).sum()

        def loss_ref(q, k, v):
            return ref_attention(q, k, v, causal_mask(128, 128)).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-5,
                                       err_msg=f"d{name}")

    def test_grads_with_padding_bias(self):
        q, k, v = make_qkv(b=2, s=128, n=1)
        am = np.ones((2, 128), np.int32)
        am[1, 64:] = 0
        bias = jnp.where(jnp.asarray(am) == 1, 0.0, fa.NEG_INF)
        mask = combine_masks(causal_mask(128, 128),
                             padding_mask(jnp.asarray(am), 128))

        # exclude padded query rows from the loss on both sides
        wmask = jnp.asarray(am, jnp.float32)[:, :, None, None]

        def loss_flash(q, k, v):
            return (fa.flash_attention(q, k, v, padding_bias=bias,
                                       block_q=128, block_k=128)
                    * wmask).sum()

        def loss_ref(q, k, v):
            return (ref_attention(q, k, v, mask) * wmask).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-5,
                                       err_msg=f"d{name}")
