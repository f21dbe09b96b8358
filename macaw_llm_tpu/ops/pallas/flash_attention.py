"""Pallas TPU flash attention (forward + custom-VJP backward), streaming K/V.

Replaces the materialized [B, N, S, S] attention of the einsum path
(reference LlamaAttention materializes attn_weights and does softmax in
fp32, modeling.py:190-208) with an online-softmax kernel that never writes
the S x S matrix to HBM.

Kernel structure (the canonical TPU shape): the grid's innermost dimension
iterates sequentially over K/V blocks, so K and V stream HBM -> VMEM in
``block_k`` tiles with automatic double-buffering — VMEM holds only one
q/k/v tile plus fp32 running (max, sum, acc) scratch that persists across
the sequential grid steps. This keeps VMEM use independent of sequence
length (a full-K/V-resident design OOMs scoped VMEM past ~16 MB — found on
hardware with the 32k-entry alignment-attention memory).

  * causal masking by block index; blocks entirely above the diagonal are
    predicated off
  * optional additive padding bias [B, S_k]
  * custom VJP: dq kernel (K blocks innermost) + dk/dv kernel (Q blocks
    innermost), both recomputing p = exp(qk - lse) flash-style

Layout contract: q, k, v are [B, S, N, D]; internally folded to [B*N, S, D].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _clamp_blocks(block_q: int, block_k: int, sq: int, sk: int):
    """Shrink blocks toward the (padded) sequence lengths without breaking
    Mosaic tiling: a Q block is a sublane dim (multiple of 8), a K block is
    the minor dim of the logits tile (multiple of 128)."""
    return (min(block_q, _round_up(sq, 8)),
            min(block_k, _round_up(sk, 128)))


# single-block threshold: the [block_q, block_k] fp32 logits tile. 2 MB
# covers the fused-prefill shape (312x312 -> 320x384 = 0.49 MB) and any
# seq pair up to ~724x724 while leaving bwd's three live [bq, bk] fp32
# temps (s, p, ds) + accumulators well under the 16 MB scoped-VMEM limit.
_SINGLE_BLOCK_LOGITS_BYTES = 2 << 20


def _auto_blocks(block_q, block_k, sq: int, sk: int):
    """Resolve block sizes when the caller didn't pick them (None).

    Short sequences get ONE (q, k) block covering the whole (padded)
    sequence, collapsing the grid to (B*N, 1, 1): the per-grid-step fixed
    cost dominates short-seq attention (measured on v5e: the default
    256/256 blocks make a 2048-step grid at the 7b fused-prefill shape
    [16, 312, 32, 128] and lose to the einsum path, while the einsum path
    itself burns 4.9 ms/call materializing [B, N, S, S] fp32 logits in
    HBM — scripts/bench_tower_internals.py, _attn_bench r5). Long
    sequences keep the streaming defaults (VMEM-bounded).
    """
    bq, bk = _round_up(sq, 8), _round_up(sk, 128)
    if (block_q is None and block_k is None
            and bq * bk * 4 <= _SINGLE_BLOCK_LOGITS_BYTES):
        return bq, bk
    return _clamp_blocks(block_q or DEFAULT_BLOCK_Q,
                         block_k or DEFAULT_BLOCK_K, sq, sk)


def _interpret() -> bool:
    """Pallas TPU kernels only run compiled on TPU; interpret elsewhere
    (CPU tests, debugging)."""
    return jax.default_backend() != "tpu"


def _fold(x):
    """[B, S, N, D] -> [B*N, S, D]"""
    b, s, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * n, s, d)


def _unfold(x, b, n):
    bn, s, d = x.shape
    return x.reshape(b, n, s, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, scale: float, block_q: int, block_k: int, causal: bool):
    qi, kj = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # skip K blocks entirely above the causal diagonal of this Q block
    run = (kj * block_k <= qi * block_q + block_q - 1) if causal else True

    @pl.when(run)
    def _step():
        # MXU operands stay in the input dtype (bf16): casting to fp32
        # before the dot drops the matmul to the ~8x slower fp32 MXU path
        # (measured 6 ms -> ~1 ms for one Whisper-shape attention). The
        # accumulate is fp32 via preferred_element_type — the exact
        # numeric contract of the einsum path (dot_product_attention),
        # which also feeds bf16 operands.
        q = q_ref[0]                                   # [bq, d]
        k = k_ref[0]                                   # [bk, d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0][None, :]
        if causal:
            q_idx = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_idx = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_idx <= q_idx, s, NEG_INF)

        m_prev, l_prev, acc_prev = m_scr[:], l_scr[:], acc_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        m_scr[:] = m_new
        l_scr[:] = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        # probs cast to the V dtype for the MXU (einsum path does the
        # same: probs.astype(q.dtype) before the PV dot)
        acc_scr[:] = acc_prev * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kj == nk - 1)
    def _finalize():
        l = l_scr[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[:] + jnp.log(l_safe))[:, 0]


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, causal):
    b, sq, n, d = q.shape
    sk = k.shape[1]
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    bn = b * n
    grid = (bn, pl.cdiv(sq, block_q), pl.cdiv(sk, block_k))

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, block_k),
                         lambda h, i, j, n=n: (h // n, 0, j),
                         memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32)[:, None, :])
        kernel = functools.partial(
            _fwd_kernel, scale=scale, block_q=block_q, block_k=block_k,
            causal=causal)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                   acc_scr):
            _fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref,
                        m_scr, l_scr, acc_scr, scale=scale,
                        block_q=block_q, block_k=block_k, causal=causal)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda h, i, j: (h, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bn, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bn, 1, sq), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return _unfold(out, b, n), lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, dq_scr,
                   *, scale, block_q, block_k, causal):
    qi, kj = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    run = (kj * block_k <= qi * block_q + block_q - 1) if causal else True

    @pl.when(run)
    def _step():
        # bf16 MXU operands, fp32 accumulate (see _fwd_kernel note)
        q = q_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0][:, None]
        delta = delta_ref[0, 0][:, None]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0][None, :]
        if causal:
            q_idx = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_idx = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_idx <= q_idx, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(k.dtype)
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kj == nk - 1)
    def _finalize():
        dq_ref[0] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale, block_q, block_k, causal):
    kj, qi = pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # Q blocks strictly above this K block's diagonal contribute nothing
    run = (qi * block_q + block_q - 1 >= kj * block_k) if causal else True

    @pl.when(run)
    def _step():
        # bf16 MXU operands, fp32 accumulate (see _fwd_kernel note)
        q = q_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0][:, None]
        delta = delta_ref[0, 0][:, None]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0][None, :]
        if causal:
            q_idx = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_idx = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_idx <= q_idx, s, NEG_INF)
        p = jnp.exp(s - lse)                           # [bq, bk]
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _finalize():
        # dL/dk = scale * ds^T @ q (ds is w.r.t. the SCALED logits)
        dk_ref[0] = (dk_scr[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(res, g, scale, block_q, block_k, causal, g_lse=None):
    q, k, v, bias, out, lse = res
    do = g
    b, sq, n, d = q.shape
    sk = k.shape[1]
    bn = b * n

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                           # [B, S, N]
    delta_f = delta.transpose(0, 2, 1).reshape(bn, 1, sq)
    if g_lse is not None:
        # direct lse dependence (ring-attention combine): dL/ds_ij gains
        # + p_ij * g_lse_i, i.e. delta_eff = delta - g_lse
        delta_f = delta_f - g_lse.astype(jnp.float32)
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    dof = _fold(do)

    has_bias = bias is not None
    bias_args = [bias.astype(jnp.float32)[:, None, :]] if has_bias else []

    # ---- dq: grid (h, qi, kj) ----
    dq_in_specs = [
        pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0),
                     memory_space=pltpu.VMEM),                      # q
        pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0),
                     memory_space=pltpu.VMEM),                      # k
        pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0),
                     memory_space=pltpu.VMEM),                      # v
    ]
    if has_bias:
        dq_in_specs.append(
            pl.BlockSpec((1, 1, block_k),
                         lambda h, i, j, n=n: (h // n, 0, j),
                         memory_space=pltpu.VMEM))
    dq_in_specs += [
        pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0),
                     memory_space=pltpu.VMEM),                      # do
        pl.BlockSpec((1, 1, block_q), lambda h, i, j: (h, 0, i),
                     memory_space=pltpu.VMEM),                      # lse
        pl.BlockSpec((1, 1, block_q), lambda h, i, j: (h, 0, i),
                     memory_space=pltpu.VMEM),                      # delta
    ]

    def dq_kernel(*refs):
        if has_bias:
            (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
             dq_ref, dq_scr) = refs
        else:
            (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
             dq_scr) = refs
            bias_ref = None
        _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                       delta_ref, dq_ref, dq_scr, scale=scale,
                       block_q=block_q, block_k=block_k, causal=causal)

    dqf = pl.pallas_call(
        dq_kernel,
        grid=(bn, pl.cdiv(sq, block_q), pl.cdiv(sk, block_k)),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bn, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=_interpret(),
    )(qf, kf, vf, *bias_args, dof, lse, delta_f)

    # ---- dk/dv: grid (h, kj, qi) ----
    dkv_in_specs = [
        pl.BlockSpec((1, block_q, d), lambda h, j, i: (h, i, 0),
                     memory_space=pltpu.VMEM),                      # q
        pl.BlockSpec((1, block_k, d), lambda h, j, i: (h, j, 0),
                     memory_space=pltpu.VMEM),                      # k
        pl.BlockSpec((1, block_k, d), lambda h, j, i: (h, j, 0),
                     memory_space=pltpu.VMEM),                      # v
    ]
    if has_bias:
        dkv_in_specs.append(
            pl.BlockSpec((1, 1, block_k),
                         lambda h, j, i, n=n: (h // n, 0, j),
                         memory_space=pltpu.VMEM))
    dkv_in_specs += [
        pl.BlockSpec((1, block_q, d), lambda h, j, i: (h, i, 0),
                     memory_space=pltpu.VMEM),                      # do
        pl.BlockSpec((1, 1, block_q), lambda h, j, i: (h, 0, i),
                     memory_space=pltpu.VMEM),                      # lse
        pl.BlockSpec((1, 1, block_q), lambda h, j, i: (h, 0, i),
                     memory_space=pltpu.VMEM),                      # delta
    ]

    def dkv_kernel(*refs):
        if has_bias:
            (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
             dk_ref, dv_ref, dk_scr, dv_scr) = refs
        else:
            (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref,
             dv_ref, dk_scr, dv_scr) = refs
            bias_ref = None
        _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                        delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                        scale=scale, block_q=block_q, block_k=block_k,
                        causal=causal)

    dkf, dvf = pl.pallas_call(
        dkv_kernel,
        grid=(bn, pl.cdiv(sk, block_k), pl.cdiv(sq, block_q)),
        in_specs=dkv_in_specs,
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda h, j, i: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda h, j, i: (h, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bn, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bn, sk, d), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        interpret=_interpret(),
    )(qf, kf, vf, *bias_args, dof, lse, delta_f)

    dq = _unfold(dqf, b, n)
    dk = _unfold(dkf, b, n)
    dv = _unfold(dvf, b, n)
    dbias = None
    if has_bias:
        dbias = jnp.zeros_like(bias)  # additive bias grads not propagated
    return dq, dk, dv, dbias


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_core(q, k, v, bias, scale, block_q, block_k, causal):
    out, _ = _flash_fwd(q, k, v, bias, scale, block_q, block_k, causal)
    return out


def _flash_core_fwd(q, k, v, bias, scale, block_q, block_k, causal):
    out, lse = _flash_fwd(q, k, v, bias, scale, block_q, block_k, causal)
    return out, (q, k, v, bias, out, lse)


def _flash_core_bwd(scale, block_q, block_k, causal, res, g):
    return _flash_bwd(res, g, scale, block_q, block_k, causal)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_core_lse(q, k, v, bias, scale, block_q, block_k, causal):
    return _flash_fwd(q, k, v, bias, scale, block_q, block_k, causal)


def _flash_core_lse_fwd(q, k, v, bias, scale, block_q, block_k, causal):
    out, lse = _flash_fwd(q, k, v, bias, scale, block_q, block_k, causal)
    return (out, lse), (q, k, v, bias, out, lse)


def _flash_core_lse_bwd(scale, block_q, block_k, causal, res, g):
    g_out, g_lse = g
    return _flash_bwd(res, g_out, scale, block_q, block_k, causal,
                      g_lse=g_lse)


_flash_core_lse.defvjp(_flash_core_lse_fwd, _flash_core_lse_bwd)


def flash_attention_with_lse(q, k, v, padding_bias=None, *,
                             causal: bool = True,
                             scale: Optional[float] = None,
                             block_q: Optional[int] = None,
                             block_k: Optional[int] = None):
    """flash_attention that also returns the per-query logsumexp
    [B, S, N] fp32 — the ring-attention chunk combiner needs it.

    ``padding_bias`` is non-differentiable (see ``flash_attention``)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if padding_bias is not None:
        padding_bias = jax.lax.stop_gradient(padding_bias)
    b, sq, n, d = q.shape
    sk = k.shape[1]
    block_q, block_k = _auto_blocks(block_q, block_k, sq, sk)
    pad_q = (-sq) % block_q
    pad_k = (-sk) % block_k
    bias = padding_bias
    qp, kp, vp = q, k, v
    if pad_q:
        qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    if pad_k:
        kp = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        if bias is None:
            bias = jnp.zeros((b, sk), jnp.float32)
        bias = jnp.pad(bias, ((0, 0), (0, pad_k)), constant_values=NEG_INF)
    out, lse = _flash_core_lse(qp, kp, vp, bias, scale, block_q, block_k,
                               causal)
    # lse comes back folded [B*N, 1, Sq_padded]
    lse = lse.reshape(b, n, -1)[:, :, :sq].transpose(0, 2, 1)
    return out[:, :sq], lse


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    padding_bias: Optional[jnp.ndarray] = None, *,
                    causal: bool = True,
                    scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None) -> jnp.ndarray:
    """Flash attention. q/k/v: [B, S, N, D]; padding_bias: additive fp32
    [B, S_k] (0 for keep, NEG_INF for masked) or None. Returns [B, S, N, D].

    ``padding_bias`` is NON-DIFFERENTIABLE: it is a {0, -inf} padding mask,
    not a learned bias, and the backward kernel does not propagate a bias
    cotangent (``_flash_bwd`` would return zeros). ``stop_gradient`` is
    applied here so that contract is explicit rather than a silent wrong
    gradient — route learned biases through ``ops.dot_product_attention``.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if padding_bias is not None:
        padding_bias = jax.lax.stop_gradient(padding_bias)
    sq, sk = q.shape[1], k.shape[1]
    block_q, block_k = _auto_blocks(block_q, block_k, sq, sk)
    # pad seq lens up to block multiples
    pad_q = (-sq) % block_q
    pad_k = (-sk) % block_k
    if pad_q or pad_k:
        qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        bias = padding_bias
        if pad_k:
            if bias is None:
                bias = jnp.zeros((q.shape[0], sk), jnp.float32)
            bias = jnp.pad(bias, ((0, 0), (0, pad_k)),
                           constant_values=NEG_INF)
        out = _flash_core(qp, kp, vp, bias, scale, block_q, block_k, causal)
        return out[:, :sq]
    return _flash_core(q, k, v, padding_bias, scale, block_q, block_k,
                       causal)
