"""Isolated decode-attention micro-benchmark: bf16 vs int8 KV cache read.

Answers one question on the real chip: does the int8 cache's
convert+scale path fuse into the attention dots (halving the HBM read,
~2x on the attention slice of the decode budget), or does XLA
materialize the bf16-converted cache per layer (a regression)?

Usage: python scripts/bench_kv_quant.py [--batch 16] [--seq 440]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq", type=int, default=440)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from macaw_llm_tpu.ops.attention import (dot_product_attention,
                                             dot_product_attention_quant)

    b, s, n, d, L = (args.batch, args.seq, args.heads, args.dim,
                     args.layers)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, 1, n, d) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(L, b, s, n, d) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.randn(L, b, s, n, d) * 0.1, jnp.bfloat16)

    def quantize(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        sc = amax / 127.0
        qv = jnp.clip(jnp.round(x.astype(jnp.float32)
                                / jnp.maximum(sc, 1e-20)[..., None]),
                      -127, 127).astype(jnp.int8)
        return qv, sc

    kq, ks = jax.jit(quantize)(k)
    vq, vs = jax.jit(quantize)(v)
    jax.block_until_ready((kq, ks, vq, vs))

    @jax.jit
    def attn_bf16(q, k, v):
        def body(acc, kv):
            kk, vv = kv
            out = dot_product_attention(q, kk, vv, None)
            return acc + out.sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (k, v))
        return acc

    @jax.jit
    def attn_int8(q, kq, vq, ks, vs):
        def body(acc, kv):
            kk, vv, sk, sv = kv
            out = dot_product_attention_quant(
                q, kk.astype(q.dtype), vv.astype(q.dtype), sk, sv, None)
            return acc + out.sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              (kq, vq, ks, vs))
        return acc

    def timed(f, *a):
        float(f(*a))  # compile + warm
        float(f(*a))
        ts = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            float(f(*a))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    t_bf = timed(attn_bf16, q, k, v)
    t_q = timed(attn_int8, q, kq, vq, ks, vs)
    bytes_bf = 2 * L * b * s * n * d * 2
    bytes_q = L * b * s * n * (2 * d + 8)
    print(f"decode attention over [L={L}, B={b}, S={s}, N={n}, D={d}]:")
    print(f"  bf16 cache: {t_bf * 1e3:7.2f} ms  "
          f"({bytes_bf / t_bf / 1e9:6.1f} GB/s effective)")
    print(f"  int8 cache: {t_q * 1e3:7.2f} ms  "
          f"({bytes_q / t_q / 1e9:6.1f} GB/s effective)  "
          f"speedup {t_bf / t_q:.2f}x")


if __name__ == "__main__":
    main()
