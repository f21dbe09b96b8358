"""Our flash kernel vs the official jax.experimental TPU flash kernel.

Shapes: Whisper tower (B16 S1500 N8 D64), LLM prefill (B16 S312 N32
D128 causal), long-context (B1 S8192 N8 D128 causal).

Usage: python scripts/bench_flash_compare.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from macaw_llm_tpu.ops.attention import flash_sdpa
from macaw_llm_tpu.ops.pallas.flash_attention import flash_attention as ours

from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention as theirs)


def _readback(out):
    return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def timeit(name, fn, steps=8):
    try:
        fn()
        _readback(fn())
    except Exception as e:
        print(f"{name:56s}   FAILED: {str(e)[:90]}", flush=True)
        return None
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn()
    _readback(out)
    dt = (time.perf_counter() - t0) / steps * 1000
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)

    for tag, (b, s, n, d), causal in (
            ("whisper  b16 s1500 n8 d64 ", (16, 1500, 8, 64), False),
            ("llm      b16 s312 n32 d128", (16, 312, 32, 128), True),
            ("longctx  b1 s8192 n8 d128 ", (1, 8192, 8, 128), True)):
        q = jnp.asarray(rng.randn(b, s, n, d), jnp.bfloat16)

        f_ours = jax.jit(functools.partial(
            lambda q: ours(q, q, q, None, causal=causal)
            if d == 128 else flash_sdpa(q, q, q)))
        timeit(f"{tag} OURS (512/1024 or sdpa-pad)", lambda: f_ours(q))

        # theirs wants [B, N, S, D]
        qt = jnp.transpose(q, (0, 2, 1, 3))
        bs = BlockSizes(
            block_q=min(512, s), block_k_major=min(512, s),
            block_k=min(512, s), block_b=1,
            block_q_major_dkv=min(512, s), block_k_major_dkv=min(512, s),
            block_k_dkv=min(512, s), block_q_dkv=min(512, s),
            block_k_major_dq=min(512, s), block_k_dq=min(512, s),
            block_q_dq=min(512, s))
        f_th = jax.jit(functools.partial(
            theirs, causal=causal, sm_scale=d ** -0.5, block_sizes=bs))
        timeit(f"{tag} OFFICIAL (512 blocks)", lambda: f_th(qt, qt, qt))


if __name__ == "__main__":
    main()
