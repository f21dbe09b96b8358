"""Does XLA:TPU emit native s8xs8->s32 MXU matmuls, and at what speedup?

v5e lists 394 TOPS int8 vs 197 TFLOP/s bf16. If a plain
lax.dot_general(int8, int8, preferred_element_type=int32) runs ~2x the
bf16 matmul at prefill shapes, a W8A8 prefill mode (per-token activation
scales x per-channel weight scales) is the single biggest lever left on
the 7b prefill step (LLM = 407 of 519 ms at 84% bf16 MFU).

Usage: python scripts/bench_int8_mxu.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _readback(out):
    return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def timeit(name, fn, steps=20, flops=None):
    fn()
    _readback(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn()
    _readback(out)
    dt = (time.perf_counter() - t0) / steps
    rate = f"  {flops / dt / 1e12:7.1f} T(FL)OP/s" if flops else ""
    print(f"{name:52s} {dt * 1000:8.2f} ms{rate}", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    # prefill shape: [B*S, K] @ [K, N] at 7b qkv-ish sizes
    m, k, n = 4992, 4096, 12288
    flops = 2 * m * k * n

    xb = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    wb = jnp.asarray(rng.randn(k, n), jnp.bfloat16)
    xi = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)
    wi = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)

    dot_bf = jax.jit(lambda a, b: a @ b)
    timeit("bf16 x bf16 [4992,4096]x[4096,12288]",
           lambda: dot_bf(xb, wb), flops=flops)

    dot_i8 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    timeit("int8 x int8 -> int32 (native MXU?)",
           lambda: dot_i8(xi, wi), flops=flops)

    # the full W8A8 op: quantize activations per-row, int8 dot, rescale
    ws = jnp.asarray(np.abs(rng.randn(1, n)).astype(np.float32))

    @jax.jit
    def w8a8(x, wq, ws):
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        xs = (amax.astype(jnp.float32) / 127.0)
        q = jnp.round(x.astype(jnp.float32) / jnp.maximum(xs, 1e-12))
        q = jnp.clip(q, -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(q, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)

    timeit("W8A8 end-to-end (quant + int8 dot + rescale)",
           lambda: w8a8(xb, wi, ws), flops=flops)

    # int4 weights? (v5e MXU also supports s4 operand streams via int8)
    dot_mixed = jax.jit(lambda a, b: jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    timeit("int8 operands converted to bf16 dot (weight-only path)",
           lambda: dot_mixed(xi, wi), flops=flops)


if __name__ == "__main__":
    main()
