"""Isolated decode-matvec micro-benchmark: XLA fused dequant vs the
Pallas weight-streaming kernel (ops/pallas/matvec.py).

Runs the four packed decode matvec shapes of the 7b profile back-to-back
under a layer scan (the real decode structure: 32 iterations streaming
~202 MB of int8 weights each) and reports effective HBM bandwidth. The
winner becomes serve/bench's decode kernel (utils/quantize.set_decode_kernel).

Usage: python scripts/bench_matvec.py [--batch 16] [--layers 32]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# 7b packed decode shapes: qkv, wo, gateup, down
SHAPES = [(4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--block-n", type=int, default=0)
    p.add_argument("--depth", type=int, default=4,
                   help="DMA pipeline depth for the manually-pipelined "
                        "variant (2 = classic double buffering)")
    p.add_argument("--skip", default="",
                   help="comma-separated impls to skip: xla,pallas,pipe")
    p.add_argument("--chain", type=int, default=8,
                   help="dispatches per readback (amortizes the relay "
                        "RTT out of the per-call time; 1 = old timing)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from macaw_llm_tpu.ops.pallas.matvec import (matvec_int8,
                                                 matvec_int8_pipelined)
    from macaw_llm_tpu.utils import quantize as qz

    b, L = args.batch, args.layers
    rng = np.random.RandomState(0)

    # build random int8 records directly: a bandwidth benchmark does not
    # need realistic values, and sourcing them from fp32 randn materializes
    # ~26 GB of float64 on the host + ~12 GB fp32 peaks on the chip.
    weights = []
    for k, n in SHAPES:
        q = jnp.asarray(
            rng.randint(-127, 128, (L, k, n), dtype=np.int8))
        s = jnp.asarray(
            (rng.rand(L, 1, n).astype(np.float32) + 0.5) * 2e-4)
        weights.append((q, s))
    jax.block_until_ready(weights)
    int8_bytes = sum(L * k * n for k, n in SHAPES)

    x0 = jnp.asarray(rng.randn(b, SHAPES[0][0]) * 0.1, jnp.bfloat16)

    @jax.jit
    def run_xla(x, weights):
        def body(acc, ws):
            h = acc
            for (q, s), (k, n) in zip(ws, SHAPES):
                y = (h[:, : q.shape[0]] if h.shape[1] >= q.shape[0]
                     else jnp.pad(h, ((0, 0), (0, q.shape[0] - h.shape[1]))))
                h = qz.matmul(y[:, None], {"q": q, "s": s},
                              jnp.bfloat16)[:, 0]
            return h[:, :SHAPES[0][0]] * 1e-3, None
        out, _ = jax.lax.scan(body, x, weights)
        return out.sum()

    @jax.jit
    def run_pallas(x, weights):
        def body(acc, ws):
            h = acc
            for (q, s), (k, n) in zip(ws, SHAPES):
                y = (h[:, : q.shape[0]] if h.shape[1] >= q.shape[0]
                     else jnp.pad(h, ((0, 0), (0, q.shape[0] - h.shape[1]))))
                h = matvec_int8(y, q, s.astype(jnp.float32),
                                block_n=args.block_n)
            return h[:, :SHAPES[0][0]] * 1e-3, None
        out, _ = jax.lax.scan(body, x, weights)
        return out.sum()

    @jax.jit
    def run_pipelined(x, weights):
        def body(acc, ws):
            h = acc
            for (q, s), (k, n) in zip(ws, SHAPES):
                y = (h[:, : q.shape[0]] if h.shape[1] >= q.shape[0]
                     else jnp.pad(h, ((0, 0), (0, q.shape[0] - h.shape[1]))))
                h = matvec_int8_pipelined(y, q, s.astype(jnp.float32),
                                          block_n=args.block_n,
                                          depth=args.depth)
            return h[:, :SHAPES[0][0]] * 1e-3, None
        out, _ = jax.lax.scan(body, x, weights)
        return out.sum()

    def timed(f):
        """Per-call time with the tunnel RTT amortized: dispatch
        ``--chain`` calls back-to-back (the device runs them serially)
        and force ONE readback at the end — the same pipelined-timing
        rule bench.py uses (BENCH.md header). chain=1 reproduces the old
        per-call-readback timing."""
        float(f(x0, weights))
        float(f(x0, weights))
        ts = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            for _ in range(args.chain - 1):
                f(x0, weights)
            float(f(x0, weights))
            ts.append((time.perf_counter() - t0) / args.chain)
        return statistics.median(ts)

    skip = set(args.skip.split(","))
    print(f"decode weight stream x{L} layers, batch {b} "
          f"({int8_bytes / 1e9:.2f} GB int8):")
    t_x = None
    if "xla" not in skip:
        t_x = timed(run_xla)
        print(f"  xla fused dequant: {t_x * 1e3:7.2f} ms  "
              f"({int8_bytes / t_x / 1e9:6.1f} GB/s effective)")
    if "pallas" not in skip:
        t_p = timed(run_pallas)
        print(f"  pallas streaming : {t_p * 1e3:7.2f} ms  "
              f"({int8_bytes / t_p / 1e9:6.1f} GB/s effective)"
              + (f"  speedup {t_x / t_p:.2f}x" if t_x else ""))
    if "pipe" not in skip:
        t_q = timed(run_pipelined)
        print(f"  pipelined depth{args.depth}: {t_q * 1e3:7.2f} ms  "
              f"({int8_bytes / t_q / 1e9:6.1f} GB/s effective)"
              + (f"  speedup {t_x / t_q:.2f}x" if t_x else ""))


if __name__ == "__main__":
    main()
