"""Pallas int8 matvec kernel vs the XLA fused-dequant reference path.

Interpret mode on CPU (the kernel compiles via Mosaic only on TPU). The
two paths round at different points (the XLA path rounds the bf16 matmul
accumulator before scaling; the kernel scales the fp32 accumulator), so
agreement is to bf16 precision, not bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from macaw_llm_tpu.ops.pallas.matvec import matvec_int8
from macaw_llm_tpu.utils import quantize as qz


def _mk(k, n, b, seed=0):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.05)
    q, s = qz.quantize_tensor(w)
    x = jnp.asarray(rng.randn(b, k).astype(np.float32) * 0.1, jnp.bfloat16)
    return x, q, s


def test_matvec_matches_xla_path():
    x, q, s = _mk(k=256, n=512, b=16)
    ref = qz.matmul(x[:, None], {"q": q, "s": s}, jnp.bfloat16)[:, 0]
    out = matvec_int8(x, q, s.astype(jnp.float32), block_n=128)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1.6e-2, atol=1e-5)


def test_matvec_auto_block_and_odd_batch():
    # K=11008-style non-power-of-two contraction dim, batch 8
    x, q, s = _mk(k=352, n=256, b=8, seed=1)
    ref = qz.matmul(x[:, None], {"q": q, "s": s}, jnp.bfloat16)[:, 0]
    out = matvec_int8(x, q, s.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1.6e-2, atol=1e-5)


def test_matvec_pipelined_matches_grid_kernel():
    """The manually-pipelined variant is the SAME math as the grid kernel
    (fp32 accumulate, scale after) — bitwise agreement expected, across
    depths and a non-divisible auto-block shape."""
    from macaw_llm_tpu.ops.pallas.matvec import matvec_int8_pipelined
    for depth in (1, 2, 4):
        x, q, s = _mk(k=256, n=1024, b=16, seed=depth)
        ref = matvec_int8(x, q, s.astype(jnp.float32), block_n=128)
        out = matvec_int8_pipelined(x, q, s.astype(jnp.float32),
                                    block_n=128, depth=depth)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(ref, np.float32))
    # odd contraction dim + auto block + depth > n_blocks clamp
    x, q, s = _mk(k=352, n=256, b=8, seed=9)
    ref = matvec_int8(x, q, s.astype(jnp.float32))
    out = matvec_int8_pipelined(x, q, s.astype(jnp.float32), depth=8)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_decode_kernel_dispatch():
    """set_decode_kernel('pallas') routes the S==1 int8 matmul through the
    kernel and produces identical decode logits."""
    x, q, s = _mk(k=256, n=512, b=4, seed=2)
    rec = {"q": q, "s": s}
    ref = qz.matmul(x[:, None], rec, jnp.bfloat16)
    try:
        qz.set_decode_kernel("pallas")
        out = qz.matmul(x[:, None], rec, jnp.bfloat16)
    finally:
        qz.set_decode_kernel("xla")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1.6e-2, atol=1e-5)
