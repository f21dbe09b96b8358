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


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                   mesh: Mesh, axis: str = "tensor",
                   block_q: int = 256, block_k: int = 256) -> jnp.ndarray:
    """Causal self-attention with the sequence sharded over ``axis``.

    q/k/v: [B, S, N, D] global arrays (S divisible by the axis size).
    Returns [B, S, N, D] sharded the same way.
    """
    n_dev = mesh.shape[axis]
    spec = P(None, axis, None, None)

    def body(q_l, k_l, v_l):
        my_idx = jax.lax.axis_index(axis)
        return _ring_body(axis, q_l, k_l, v_l, my_idx, n_dev,
                          block_q, block_k)

    # check_vma=False: pallas_call out_shapes carry no varying-axis
    # metadata, which the vma checker would reject
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)
