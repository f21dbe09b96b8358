"""Ring attention: causal attention over a sequence sharded across chips.

The reference has no long-context machinery at all (SURVEY §5.7 — max
fused length ≈ 315). This module makes context length scale with the mesh:
q/k/v live sequence-sharded over a mesh axis; each device computes flash
attention of its local queries against the K/V chunk it currently holds,
then passes K/V around the ring with ``jax.lax.ppermute`` (ICI
neighbor traffic), combining per-chunk partial results with a numerically
stable logsumexp merge.

Causality across chunks: with contiguous sharding, device i's queries may
attend fully to chunks from devices < i, causally to its own chunk, and
not at all to chunks from devices > i (those steps are masked; the
load-balancing zig-zag layout is future work).

Differentiable end-to-end (flash kernel has a custom VJP; ppermute is
linear), so it serves training as well as prefill.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from macaw_llm_tpu.ops.pallas.flash_attention import (
    NEG_INF, flash_attention_with_lse)


def _combine(out_a, lse_a, out_b, lse_b):
    """Merge two partial attention results via logsumexp weights.
    out: [B, S, N, D] (fp32), lse: [B, S, N]."""
    lse_max = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - lse_max)[..., None]
    wb = jnp.exp(lse_b - lse_max)[..., None]
    lse = lse_max + jnp.log(wa[..., 0] + wb[..., 0])
    out = (out_a * wa + out_b * wb) / (wa + wb)
    return out, lse


def _ring_body(axis_name: str, q, k, v, my_idx, n_dev, block_q, block_k):
    """Per-device computation inside shard_map. q/k/v: local chunks
    [B, S_local, N, D]."""
    scale = q.shape[-1] ** -0.5

    def step(carry, step_idx):
        k_cur, v_cur, out, lse = carry
        # chunks travel i -> i+1 each step, so the chunk held at step t
        # originated at my_idx - t
        src = (my_idx - step_idx) % n_dev

        # src == me: causal within chunk; src < me: full; src > me: skip
        causal_here = src == my_idx
        o_c, l_c = flash_attention_with_lse(
            q, k_cur, v_cur, causal=True, scale=scale,
            block_q=block_q, block_k=block_k)
        o_f, l_f = flash_attention_with_lse(
            q, k_cur, v_cur, causal=False, scale=scale,
            block_q=block_q, block_k=block_k)
        o_new = jnp.where(causal_here, o_c.astype(jnp.float32),
                          o_f.astype(jnp.float32))
        l_new = jnp.where(causal_here, l_c, l_f)
        skip = src > my_idx
        l_new = jnp.where(skip, NEG_INF, l_new)
        o_new = jnp.where(skip, 0.0, o_new)

        out, lse = _combine(out, lse, o_new, l_new)

        # pass K/V to the next device in the ring (receive from prev)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, out, lse), None

    out0 = jnp.zeros(q.shape, jnp.float32)
    lse0 = jnp.full(q.shape[:3], NEG_INF, jnp.float32)
    (_, _, out, lse), _ = jax.lax.scan(
        step, (k, v, out0, lse0), jnp.arange(n_dev))
    return out.astype(q.dtype)


def zigzag_indices(seq_len: int, n_dev: int) -> jnp.ndarray:
    """Load-balancing permutation for causal ring attention.

    With contiguous sharding, device i's queries attend to i+1 chunks and
    device n-1 does n x the work of device 0. The zig-zag layout splits
    the sequence into 2n blocks and gives device i blocks (i, 2n-1-i):
    every device then owns one early and one late block, and per ring
    step does exactly two block-pair units of attention — balanced.

    Returns perm such that x[:, perm] lays the sequence out so a
    contiguous split over n_dev yields those block pairs.
    x_orig == x_perm[:, inverse_permutation(perm)].
    """
    assert seq_len % (2 * n_dev) == 0, (seq_len, n_dev)
    blk = seq_len // (2 * n_dev)
    idx = []
    for i in range(n_dev):
        idx.append(jnp.arange(i * blk, (i + 1) * blk))
        j = 2 * n_dev - 1 - i
        idx.append(jnp.arange(j * blk, (j + 1) * blk))
    return jnp.concatenate(idx)


def inverse_permutation(perm: jnp.ndarray) -> jnp.ndarray:
    inv = jnp.zeros_like(perm)
    return inv.at[perm].set(jnp.arange(perm.shape[0]))


def _flash_pair(q, k, v, causal, block_q, block_k):
    scale = q.shape[-1] ** -0.5
    return flash_attention_with_lse(q, k, v, causal=causal, scale=scale,
                                    block_q=block_q, block_k=block_k)


def _ring_body_zigzag(axis_name: str, q, k, v, my_idx, n_dev,
                      block_q, block_k):
    """Zig-zag ring body. Local chunks hold TWO global blocks:
    half 0 = block ``my_idx`` (early), half 1 = block ``2n-1-my_idx``
    (late). Exactly two flash calls per ring step on every device.
    """
    half = q.shape[1] // 2
    q0, q1 = q[:, :half], q[:, half:]

    def step(carry, t):
        k_cur, v_cur, out0, lse0, out1, lse1 = carry
        src = (my_idx - t) % n_dev
        k0, k1 = k_cur[:, :half], k_cur[:, half:]
        v0, v1 = v_cur[:, :half], v_cur[:, half:]

        # q1 (late block 2n-1-me) attends fully to k0 (early block src):
        # 2n-1-me >= n > src always
        o10, l10 = _flash_pair(q1, k0, v0, False, block_q, block_k)
        out1, lse1 = _combine(out1, lse1,
                              o10.astype(jnp.float32), l10)

        def diagonal():
            # src == me: both halves attend causally to themselves
            o00, l00 = _flash_pair(q0, k0, v0, True, block_q, block_k)
            o11, l11 = _flash_pair(q1, k1, v1, True, block_q, block_k)
            return (o00.astype(jnp.float32), l00,
                    o11.astype(jnp.float32), l11)

        def off_diagonal():
            # exactly one of (q0 x k0 full | q1 x k1 full) is causal-valid:
            # q0 (block me) vs k0 (block src): full iff me > src
            # q1 (2n-1-me) vs k1 (2n-1-src): full iff src > me
            lt = src < my_idx
            qs = jnp.where(lt, q0, q1)
            ks = jnp.where(lt, k0, k1)
            vs = jnp.where(lt, v0, v1)
            o, l = _flash_pair(qs, ks, vs, False, block_q, block_k)
            o = o.astype(jnp.float32)
            neg = jnp.full_like(l, NEG_INF)
            return (jnp.where(lt, o, 0.0), jnp.where(lt, l, neg),
                    jnp.where(lt, 0.0, o), jnp.where(lt, neg, l))

        o0n, l0n, o1n, l1n = jax.lax.cond(src == my_idx, diagonal,
                                          off_diagonal)
        out0, lse0 = _combine(out0, lse0, o0n, l0n)
        out1, lse1 = _combine(out1, lse1, o1n, l1n)

        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, out0, lse0, out1, lse1), None

    z = jnp.zeros(q0.shape, jnp.float32)
    neg = jnp.full(q0.shape[:3], NEG_INF, jnp.float32)
    (_, _, out0, _, out1, _), _ = jax.lax.scan(
        step, (k, v, z, neg, z, neg), jnp.arange(n_dev))
    return jnp.concatenate([out0, out1], axis=1).astype(q.dtype)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                   mesh: Mesh, axis: str = "tensor",
                   layout: str = "contiguous",
                   block_q: int = 256, block_k: int = 256) -> jnp.ndarray:
    """Causal self-attention with the sequence sharded over ``axis``.

    q/k/v: [B, S, N, D] global arrays (S divisible by the axis size; by
    2 x axis size for layout="zigzag"). Returns [B, S, N, D] sharded the
    same way.

    layout="zigzag": inputs must already be permuted with
    ``zigzag_indices(S, n_dev)`` (RoPE positions and labels permuted by
    the caller too) — balances causal work across the ring.
    The batch dim shards over every other mesh axis.
    """
    n_dev = mesh.shape[axis]
    # shard the batch dim over the other mesh axes — but only those whose
    # size evenly divides the (remaining) batch, else shard_map rejects it
    batch_axes, rem = [], q.shape[0]
    for a in mesh.axis_names:
        if a != axis and mesh.shape[a] > 1 and rem % mesh.shape[a] == 0:
            batch_axes.append(a)
            rem //= mesh.shape[a]
    spec = P(tuple(batch_axes) or None, axis, None, None)

    def body(q_l, k_l, v_l):
        my_idx = jax.lax.axis_index(axis)
        if layout == "zigzag":
            return _ring_body_zigzag(axis, q_l, k_l, v_l, my_idx, n_dev,
                                     block_q, block_k)
        return _ring_body(axis, q_l, k_l, v_l, my_idx, n_dev,
                          block_q, block_k)

    # check_vma=False: pallas_call out_shapes carry no varying-axis
    # metadata, which the vma checker would reject
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)
