"""Pallas int8 weight-streaming matvec for single-token decode.

Decode is HBM-bandwidth-bound: every generated token streams every weight
byte of the model (the reference pays this through HF's greedy loop over
torch CUDA matmuls, modeling.py:959). The XLA fused dequant-matmul path
(utils/quantize.matmul) reaches ~456 GB/s effective on a v5e for the
packed [4096, 12288] decode matvecs; the hardware ceiling is ~819 GB/s.

This kernel streams the int8 weight HBM -> VMEM in ``block_n`` column
tiles through Pallas's automatic grid pipelining (double-buffered DMA:
while tile j is in the MXU, tile j+1 is in flight), with the activation
row block resident in VMEM across the whole grid (its index map is
constant, so Mosaic fetches it once). The per-output-channel scales ride
in the same tile stream and are applied to the fp32 accumulator — the
weight operand of the dot is the raw int8 tile converted in-register,
exactly `utils/quantize.matmul`'s math.

Why this can beat the XLA path despite round 1's deleted int8 matmul
kernel (BENCH.md): that kernel targeted *prefill-shaped* matmuls, where
XLA's MXU scheduling wins; decode matvecs are pure streaming loads where
the win comes from deeper DMA pipelining and fewer kernel ramps, not from
compute scheduling. Measured on chip before being switched on:
`scripts/bench_matvec.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(x_ref, q_ref, s_ref, o_ref, *, compute):
    acc = jnp.dot(x_ref[:], q_ref[:].astype(compute),
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype"))
def matvec_int8(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                block_n: int = 0, out_dtype=None) -> jnp.ndarray:
    """x [B, K] (bf16) @ int8 q [K, N] with per-output fp32 scales s.

    Returns [B, N] in ``out_dtype`` (default: x.dtype). Exact same math as
    ``utils/quantize.matmul``: (x @ q) * s, with the int8->bf16 convert on
    the weight operand (int8 magnitudes <= 127 are exact in bf16).

    block_n=0 picks a tile that keeps the weight block near 2 MB (deep
    enough DMA bursts, small enough for double buffering under the ~16 MB
    VMEM budget next to the resident activations).
    """
    b, k = x.shape
    k2, n = q.shape
    assert k == k2, (x.shape, q.shape)
    s = s.reshape(1, n)
    out_dtype = out_dtype or x.dtype

    if block_n <= 0:
        # ~2 MB int8 weight tile, lane-dim multiple of 128
        block_n = max(128, min(1024, ((2 << 20) // k) // 128 * 128))
    while n % block_n:
        block_n //= 2
    assert block_n >= 128 and n % block_n == 0, (n, block_n)

    grid = (n // block_n,)
    kernel = functools.partial(_kernel, compute=jnp.bfloat16)
    flops = 2 * b * k * n
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=k * n + b * k * 2 + b * n * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(x, q, s)


def _kernel_pipelined(x_ref, q_hbm, s_hbm, o_ref, qbuf, sbuf, qsem, ssem,
                      *, block_n: int, depth: int, n_blocks: int, compute):
    """grid=(): one invocation owns the whole weight stream. Manual
    ``depth``-deep DMA pipeline: at iteration i the copy for tile
    i+depth-1 is started before waiting on tile i, so up to ``depth``
    column tiles are in flight on the HBM->VMEM DMA engine at once
    (Pallas's automatic grid pipeline is fixed at 2)."""
    def qdma(i, slot):
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(i * block_n, block_n)], qbuf.at[slot],
            qsem.at[slot])

    def sdma(i, slot):
        return pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(i * block_n, block_n)], sbuf.at[slot],
            ssem.at[slot])

    for i in range(min(depth - 1, n_blocks)):  # static warm-up
        qdma(i, i).start()
        sdma(i, i).start()
    x = x_ref[:]

    def body(i, _):
        slot = jax.lax.rem(i, depth)
        nxt = i + depth - 1

        @pl.when(nxt < n_blocks)
        def _():
            ns = jax.lax.rem(nxt, depth)
            qdma(nxt, ns).start()
            sdma(nxt, ns).start()

        qdma(i, slot).wait()
        sdma(i, slot).wait()
        acc = jnp.dot(x, qbuf[slot].astype(compute),
                      preferred_element_type=jnp.float32)
        o_ref[:, pl.ds(i * block_n, block_n)] = (
            acc * sbuf[slot].astype(jnp.float32)).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("block_n", "depth", "out_dtype"))
def matvec_int8_pipelined(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                          block_n: int = 0, depth: int = 4,
                          out_dtype=None) -> jnp.ndarray:
    """``matvec_int8`` with a manual ``depth``-deep DMA pipeline (the
    double-buffered variant the r3 verdict asked to measure; depth 2 ==
    classic double buffering). Same math: (Q(x) is NOT quantized here —
    bf16 activations) x @ int8 q, per-output-channel scales applied to
    the fp32 accumulator.

    block_n=0 sizes tiles so ``depth`` weight tiles stay under ~8 MB of
    VMEM next to the resident activations and the [B, N] output.
    """
    b, k = x.shape
    k2, n = q.shape
    assert k == k2, (x.shape, q.shape)
    s = s.reshape(1, n)
    out_dtype = out_dtype or x.dtype

    if block_n <= 0:
        budget = (8 << 20) // max(depth, 1)
        block_n = max(128, min(1024, (budget // k) // 128 * 128))
    while n % block_n:
        block_n //= 2
    assert block_n >= 128 and n % block_n == 0, (n, block_n)
    n_blocks = n // block_n
    depth = max(1, min(depth, n_blocks))

    kernel = functools.partial(
        _kernel_pipelined, block_n=block_n, depth=depth,
        n_blocks=n_blocks, compute=jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
            pl.BlockSpec(memory_space=pltpu.ANY),   # q streamed from HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # s streamed from HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((depth, k, block_n), jnp.int8),
            pltpu.VMEM((depth, 1, block_n), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=k * n + b * k * 2 + b * n * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(x, q, s)
