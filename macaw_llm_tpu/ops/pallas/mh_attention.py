"""Pallas TPU fused attention for SHORT sequences: whole-seq tiles, many
heads per grid step.

The streaming flash kernel (flash_attention.py) and the einsum path both
lose the short-seq game to per-call fixed costs, measured on v5e at the
7b fused-prefill shape [B=16, S=312, N=32, D=128]:

  * einsum (dot_product_attention): 4.94 ms/call — materializes the
    [B, N, S, S] fp32 logits in HBM (399 MB written + re-read around the
    softmax).
  * flash, single (q, k) block: 4.09 ms/call — no HBM logits, but the
    grid is (B*N, 1, 1) = 512 steps and the ~8 us/step fixed cost is the
    whole bill (compute floor is ~0.3 ms).

This kernel keeps the whole (padded) sequence in VMEM like the
single-block flash, but processes ``HB`` heads per grid step (statically
unrolled), cutting the grid to B*N/HB steps. Same math as
``dot_product_attention``: bf16 MXU operands, fp32 logits/softmax
(single-pass — no online rescaling needed since all keys are resident),
probs cast to the V dtype for the PV dot. Rows with no valid key (fully
padded) produce zeros, not NaN.

Scope: S_q == S_k (self-attention, no KV cache), S up to ~640 (the
[S, S] fp32 logits tile must sit in VMEM next to 4*HB [S, D] tiles).
Long sequences stay on the streaming flash kernel; decode stays on the
cache paths. Backward (training) recomputes through the einsum reference
via custom_vjp — prefill/serving is the hot path this kernel exists for,
and the bwd contract stays exact.

Reference behavior matched: LlamaAttention's fp32-softmax attention
(reference modeling.py:190-208) and CLIP/Whisper encoder self-attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

# VMEM budget for one grid step's working set (blocks + logits temps).
# Conservative vs the 16 MB scoped limit: leaves room for Mosaic's
# double-buffering of the in/out blocks.
_VMEM_BUDGET = 6 << 20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_hb(n: int, sp: int, sk: int, d: int, itemsize: int) -> int:
    """Largest divisor of ``n`` whose working set fits the VMEM budget:
    4 blocks (q, k, v, o) of [HB, S, D] + ~2 live [S, S] fp32 temps
    (logits and probs; Mosaic reuses across the unrolled head loop)."""
    temps = 2 * sp * _round_up(sk, 128) * 4
    for hb in (16, 8, 6, 4, 3, 2, 1):
        if n % hb:
            continue
        blocks = 4 * hb * sp * _round_up(d, 128) * itemsize
        if blocks + temps <= _VMEM_BUDGET:
            return hb
    return 1


def _mh_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
               *, scale: float, heads: int, causal: bool, sq: int):
    """One grid step: ``heads`` full self-attentions, all-VMEM."""
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 0)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 1)
        cmask = k_idx <= q_idx
    for i in range(heads):  # static unroll
        s = jax.lax.dot_general(
            q_ref[i], k_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0][None, :]
        if causal:
            s = jnp.where(cmask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        # guard fully-masked rows: exp(NEG_INF - NEG_INF) would be NaN
        p = jnp.exp(s - jnp.maximum(m, -1e30))
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[i] = (o / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def _mh_fwd(q, k, v, bias, scale, causal):
    b, sq, n, d = q.shape
    sp = _round_up(sq, 8)      # q rows: sublane multiple
    skp = _round_up(sq, 128)   # key/lane dim of the logits tile
    # one padded length for q AND k keeps the blocks square-ish and the
    # kernel simple; pad keys with NEG_INF bias so they never win softmax
    spad = max(sp, skp)
    if bias is None and spad != sq:
        bias = jnp.zeros((b, sq), jnp.float32)
    pad = spad - sq
    if pad:
        widths = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, widths), jnp.pad(k, widths), jnp.pad(v, widths)
        bias = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=NEG_INF)

    # fold [B, S, N, D] -> [B*N, S, D]
    def fold(x):
        bb, s, nn, dd = x.shape
        return x.transpose(0, 2, 1, 3).reshape(bb * nn, s, dd)

    qf, kf, vf = fold(q), fold(k), fold(v)
    hb = _pick_hb(n, spad, spad, d, q.dtype.itemsize)
    grid = (b * n // hb,)

    in_specs = [
        pl.BlockSpec((hb, spad, d), lambda h: (h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, spad, d), lambda h: (h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, spad, d), lambda h: (h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf]
    if bias is not None:
        # all HB heads of a grid step belong to one batch row (HB | N);
        # rank-3 [B, 1, S] so the block's trailing dims satisfy Mosaic's
        # (8, 128) tiling rule the same way flash_attention's bias does
        in_specs.append(pl.BlockSpec(
            (1, 1, spad), lambda h, n=n, hb=hb: ((h * hb) // n, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32)[:, None, :])
        kernel = functools.partial(_mh_kernel, scale=scale, heads=hb,
                                   causal=causal, sq=spad)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref):
            _mh_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale,
                       heads=hb, causal=causal, sq=spad)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hb, spad, d), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n, spad, d), q.dtype),
        interpret=_interpret(),
    )(*args)
    out = out.reshape(b, n, spad, d).transpose(0, 2, 1, 3)
    return out[:, :sq]


def _reference(q, k, v, bias, scale, causal):
    """The exact einsum math this kernel replaces (the bwd recompute
    path; mirrors ops.attention.dot_product_attention)."""
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias[:, None, None, :]
    if causal:
        sq = q.shape[1]
        idx = jnp.arange(sq)
        logits = jnp.where(idx[None, None, :, None] >= idx[None, None,
                                                          None, :],
                           logits, NEG_INF)
    logits = jnp.maximum(logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - jnp.maximum(m, -1e30))
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.where(l == 0.0, 1.0, l)
    return jnp.einsum("bnqk,bknd->bqnd", p.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mh_core(q, k, v, bias, scale, causal):
    return _mh_fwd(q, k, v, bias, scale, causal)


def _mh_core_fwd(q, k, v, bias, scale, causal):
    return _mh_fwd(q, k, v, bias, scale, causal), (q, k, v, bias)


def _mh_core_bwd(scale, causal, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, bias, scale,
                                                causal), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, (None if bias is None else jnp.zeros_like(bias))


_mh_core.defvjp(_mh_core_fwd, _mh_core_bwd)


def mh_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 padding_bias: Optional[jnp.ndarray] = None, *,
                 causal: bool = False,
                 scale: Optional[float] = None) -> jnp.ndarray:
    """Fused short-seq self-attention. q/k/v: [B, S, N, D] (S_q == S_k);
    padding_bias: additive fp32 [B, S] ({0, NEG_INF}), non-differentiable
    (stop_gradient applied — same contract as flash_attention).
    """
    assert q.shape == k.shape == v.shape, (q.shape, k.shape, v.shape)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if padding_bias is not None:
        padding_bias = jax.lax.stop_gradient(padding_bias)
    return _mh_core(q, k, v, padding_bias, scale, causal)


def fits_mh_attention(sq: int, sk: int, d: int) -> bool:
    """True when the whole-seq [S, S] fp32 logits tile + one head's
    blocks fit the kernel's VMEM budget (the HB=1 lower bound)."""
    if sq != sk:
        return False
    sp = max(_round_up(sq, 8), _round_up(sq, 128))
    return (2 * sp * sp * 4 + 4 * sp * _round_up(d, 128) * 2
            <= _VMEM_BUDGET)
