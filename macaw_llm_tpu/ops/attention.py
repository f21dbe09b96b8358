"""Attention ops.

Three layers of API:

* ``dot_product_attention`` — the einsum core used everywhere. Softmax in
  fp32 (reference does the same: modeling.py:202-203), additive mask.
* ``mha_init`` / ``mha_apply`` — generic multi-head attention with separate
  q/k/v/out projections and optional biases; used by the CLIP and Whisper
  towers (HF CLIPAttention / WhisperAttention semantics, incl. Whisper's
  pre-scaled queries).
* ``torch_mha_init`` / ``torch_mha_apply`` — exact torch.nn.MultiheadAttention
  semantics with ``add_bias_kv=True, add_zero_attn=True`` — the reference's
  five alignment/temporal attention modules (modeling.py:879-910) are built
  from this op. Packed in-proj weights, a learned bias K/V row and a zero
  row appended to the key/value memory.

All apply functions are batch-first: [B, S, E].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None,
                          scale: Optional[float] = None) -> jnp.ndarray:
    """Core attention. q: [B, Sq, N, D], k/v: [B, Sk, N, D].

    mask: additive [B or 1, 1 or N, Sq, Sk] fp32 mask or None.
    Returns [B, Sq, N, D]. Softmax computed in fp32.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k.astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask
        logits = jnp.maximum(logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v)


def dot_product_attention_quant(q: jnp.ndarray, k_q: jnp.ndarray,
                                v_q: jnp.ndarray, k_s: jnp.ndarray,
                                v_s: jnp.ndarray,
                                mask: Optional[jnp.ndarray] = None,
                                scale: Optional[float] = None
                                ) -> jnp.ndarray:
    """Attention over an int8-quantized K/V cache (decode path).

    q: [B, Sq, N, D] float; k_q/v_q: [B, Sk, N, D] — int8 values already
    converted to the compute dtype (integers <= 127 are exact in bf16, and
    XLA fuses the convert into the dot's HBM read, so the cache streams
    1 byte/element); k_s/v_s: [B, Sk, N] fp32 per-position-per-head
    scales. The scales are constant along the contracted D axis, so they
    commute with both dots exactly: K's scale multiplies the logits, V's
    scale folds into the probs — the same after-the-dot trick as the int8
    weight path (utils/quantize.matmul).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k_q.astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
    logits = logits * jnp.transpose(k_s, (0, 2, 1))[:, :, None, :]
    if mask is not None:
        logits = logits + mask
        logits = jnp.maximum(logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = (probs * jnp.transpose(v_s, (0, 2, 1))[:, :, None, :]
             ).astype(q.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v_q.astype(q.dtype))


def flash_sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               scale: Optional[float] = None,
               block_q: int = 512, block_k: int = 1024) -> jnp.ndarray:
    """Non-causal, unmasked flash attention for encoder self/cross
    attention. q/k/v: [B, S, N, D]. Pads D up to a 128-lane multiple
    (zero-padded D contributes nothing to QK logits, and the padded output
    columns are sliced off), so towers with D=64/96 heads can use the
    streaming kernel instead of materializing [B, N, S, S] logits in HBM.
    """
    from macaw_llm_tpu.ops.pallas.flash_attention import flash_attention

    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    pad_d = (-d) % 128
    if pad_d:
        widths = ((0, 0), (0, 0), (0, 0), (0, pad_d))
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
    out = flash_attention(q, k, v, None, causal=False, scale=scale,
                          block_q=block_q, block_k=block_k)
    return out[..., :d] if pad_d else out


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, e = x.shape
    return x.reshape(b, s, num_heads, e // num_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, s, n, d = x.shape
    return x.reshape(b, s, n * d)


# ---------------------------------------------------------------------------
# Generic MHA (CLIP / Whisper towers)
# ---------------------------------------------------------------------------

def mha_init(rng, embed_dim: int, num_heads: int, *, bias: bool = True,
             initializer_range: float = 0.02,
             param_dtype=jnp.float32) -> dict:
    ks = jax.random.split(rng, 4)
    init = jax.nn.initializers.normal(initializer_range)
    params = {
        "q": {"w": init(ks[0], (embed_dim, embed_dim), param_dtype)},
        "k": {"w": init(ks[1], (embed_dim, embed_dim), param_dtype)},
        "v": {"w": init(ks[2], (embed_dim, embed_dim), param_dtype)},
        "o": {"w": init(ks[3], (embed_dim, embed_dim), param_dtype)},
    }
    if bias:
        for name in ("q", "k", "v", "o"):
            params[name]["b"] = jnp.zeros((embed_dim,), param_dtype)
    return params


def pack_mha(params: dict) -> dict:
    """Inference layout: concatenate the q/k/v projection weights into ONE
    [E, 3E] in-proj stream (stacked [L, E, 3E] for layer stacks).

    The same trick as ``pack_llama_for_decode`` (utils/quantize.py) applied
    to the encoder towers: one [B*S, E] x [E, 3E] matmul replaces three
    [E, E] dots — longer HBM bursts and a bigger MXU tile, which is where
    the towers' ~35% MFU went (CLIP runs small 197-token tiles).
    ``mha_apply`` dispatches on the "qkv" key; exact same math (split
    after the dot). Inference-only: training/import use the unpacked
    q/k/v names."""
    q, k, v = params["q"], params["k"], params["v"]
    packed = {"w": jnp.concatenate([q["w"], k["w"], v["w"]], axis=-1)}
    if "b" in q:
        packed["b"] = jnp.concatenate([q["b"], k["b"], v["b"]], axis=-1)
    return {"qkv": packed, "o": params["o"]}


def _proj(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    # dense() flattens [B, S, E] -> [B*S, E] around the dot: XLA lowers
    # the rank-3 form catastrophically at tower shapes (ops/linear.py has
    # the measured numbers: 4987 ms -> 41 ms for CLIP's 12 layers).
    from macaw_llm_tpu.ops.linear import dense
    return dense(x, p["w"], p.get("b"))


def mha_apply(params: dict, num_heads: int,
              q_in: jnp.ndarray, kv_in: Optional[jnp.ndarray] = None,
              mask: Optional[jnp.ndarray] = None,
              use_flash: bool = False) -> jnp.ndarray:
    """Self- or cross-attention with per-projection weights. [B, S, E] in/out.

    use_flash: route the unmasked case through the streaming Pallas kernel
    (encoder towers; avoids the [B, N, S, S] HBM logits).
    """
    if "qkv" in params:
        # packed inference layout (pack_mha): self-attention only
        assert kv_in is None or kv_in is q_in, \
            "packed qkv layout is self-attention only"
        e = q_in.shape[-1]
        y = _proj(params["qkv"], q_in)
        q = _split_heads(y[..., :e], num_heads)
        k = _split_heads(y[..., e:2 * e], num_heads)
        v = _split_heads(y[..., 2 * e:], num_heads)
    else:
        if kv_in is None:
            kv_in = q_in
        q = _split_heads(_proj(params["q"], q_in), num_heads)
        k = _split_heads(_proj(params["k"], kv_in), num_heads)
        v = _split_heads(_proj(params["v"], kv_in), num_heads)
    # flash only past the measured crossover: at short sequences the
    # einsum path wins (CLIP's 197-token frames: 35.8 ms vs 47.8 ms flash
    # for 96 frames on v5e) because the streaming kernel pads head_dim
    # 64->128 and pays per-grid-step overhead, while the materialized
    # [B, N, S, S] logits are small. At Whisper's 1500 tokens the
    # materialization (1.15 GB fp32 at b16) costs more than the kernel
    # (30.5 ms vs 37.3 ms) — same shape-dependent crossover as the LLM's
    # einsum-below-2k rule (bench.py).
    if use_flash and mask is None and k.shape[1] >= 1024:
        if (k.shape[1] <= 1536 and q.shape[1] <= 1536
                and jnp.dtype(q.dtype).itemsize == 2):
            # bf16 only: the fp32 single-block kernel needs 18.1 MB of
            # scoped VMEM (> the 16 MB limit — measured compile OOM)
            # single-block grid for Whisper-length (1500) sequences: the
            # whole seq fits one (block_q, block_k) tile, cutting the
            # grid to B*N steps (measured 4.5 vs 5.1 ms per attention at
            # b16x8 heads — scripts/bench_tower_internals.py block sweep)
            out = flash_sdpa(q, k, v, block_q=1536, block_k=1536)
        else:
            out = flash_sdpa(q, k, v)
    else:
        out = dot_product_attention(q, k, v, mask)
    return _proj(params["o"], _merge_heads(out))


def dropout_attention_chunked(qh: jnp.ndarray, kh: jnp.ndarray,
                              vh: jnp.ndarray, *, scale: float,
                              rate: float, rng: jax.Array,
                              chunk: int = 0) -> jnp.ndarray:
    """Attention-prob dropout without materializing [.., Sq, Sk] probs.

    Streams K/V in chunks with an online softmax; torch's
    ``dropout(softmax(logits)) @ V`` commutes with the online
    normalization because the dropout mask scales the numerator terms
    only: accumulate the DROPPED unnormalized probs against V and the
    UNDROPPED row-sums, divide at the end. Each chunk's mask comes from
    ``fold_in(rng, chunk_idx)``, regenerated (not stored) in the backward
    pass via jax.checkpoint — peak HBM is one [B, N, Sq, chunk] fp32
    logits tile instead of the full probs + mask (0.9 GB for one
    alignment attention over the 32k-token vocab memory at 7b batch 8).

    qh: [B, Sq, N, D]; kh/vh: [B, Sk, N, D], or [Sk, N, D] for a
    batch-shared memory. Returns [B, Sq, N, D] in qh.dtype.
    chunk=0 picks a chunk size targeting ~64 MB logits tiles.
    """
    shared = kh.ndim == 3
    b, sq, n, d = qh.shape
    sk = kh.shape[0] if shared else kh.shape[1]
    if chunk <= 0:
        chunk = max(128, (64 * 2**20) // max(b * n * sq * 4, 1))
        chunk = min(sk, ((chunk + 127) // 128) * 128)
    pad = (-sk) % chunk
    kaxis = 0 if shared else 1
    if pad:
        widths = [(0, 0)] * kh.ndim
        widths[kaxis] = (0, pad)
        kh = jnp.pad(kh, widths)
        vh = jnp.pad(vh, widths)
    nchunks = (sk + pad) // chunk
    if shared:
        ks = kh.reshape(nchunks, chunk, n, d)
        vs = vh.reshape(nchunks, chunk, n, d)
        eq = "bqnd,knd->bnqk"
    else:
        ks = kh.reshape(b, nchunks, chunk, n, d).transpose(1, 0, 2, 3, 4)
        vs = vh.reshape(b, nchunks, chunk, n, d).transpose(1, 0, 2, 3, 4)
        eq = "bqnd,bknd->bnqk"
    valid_len = sk  # keys >= sk are padding: forced to -inf

    @jax.checkpoint
    def one_chunk(q, k_c, v_c, idx):
        logits = jnp.einsum(eq, q, k_c,
                            preferred_element_type=jnp.float32) * scale
        kpos = idx * chunk + jnp.arange(chunk)
        logits = jnp.where(kpos[None, None, None, :] < valid_len, logits,
                           jnp.finfo(jnp.float32).min)
        m = jnp.max(logits, axis=-1)                       # [B, N, Sq]
        p = jnp.exp(logits - m[..., None])
        keep = jax.random.bernoulli(jax.random.fold_in(rng, idx),
                                    1.0 - rate, p.shape)
        pd = jnp.where(keep, p, 0.0).astype(v_c.dtype)
        part = jnp.einsum("bnqk,knd->bnqd" if shared else
                          "bnqk,bknd->bnqd", pd, v_c,
                          preferred_element_type=jnp.float32)
        return m, p.sum(-1), part

    def body(carry, xs):
        m_run, l_run, acc = carry
        k_c, v_c, idx = xs
        m_c, l_c, part = one_chunk(qh, k_c, v_c, idx)
        m_new = jnp.maximum(m_run, m_c)
        corr_run = jnp.exp(m_run - m_new)
        corr_c = jnp.exp(m_c - m_new)
        acc = acc * corr_run[..., None] + part * corr_c[..., None]
        l_run = l_run * corr_run + l_c * corr_c
        return (m_new, l_run, acc), None

    neg = jnp.full((b, n, sq), jnp.finfo(jnp.float32).min, jnp.float32)
    zeros_l = jnp.zeros((b, n, sq), jnp.float32)
    zeros_a = jnp.zeros((b, n, sq, d), jnp.float32)
    (_, l, acc), _ = jax.lax.scan(body, (neg, zeros_l, zeros_a),
                                  (ks, vs, jnp.arange(nchunks)))
    out = acc / (jnp.maximum(l, 1e-20)[..., None] * (1.0 - rate))
    return out.transpose(0, 2, 1, 3).astype(qh.dtype)


# ---------------------------------------------------------------------------
# torch.nn.MultiheadAttention parity (alignment attention)
# ---------------------------------------------------------------------------

def torch_mha_init(rng, embed_dim: int, num_heads: int, *,
                   add_bias_kv: bool = True,
                   param_dtype=jnp.float32) -> dict:
    """Parameter layout mirrors torch: packed in_proj [3E, E] (+[3E] bias),
    out_proj [E, E] (+[E] bias), bias_k/bias_v [E].

    torch initializes in_proj with xavier_uniform_, bias_k/v with
    xavier_normal_, out_proj with kaiming_uniform (Linear default) and zero
    biases.
    """
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    xavier_u = jax.nn.initializers.glorot_uniform()
    xavier_n = jax.nn.initializers.glorot_normal()
    params = {
        "in_proj_w": xavier_u(k1, (3 * embed_dim, embed_dim), param_dtype),
        "in_proj_b": jnp.zeros((3 * embed_dim,), param_dtype),
        "out_proj_w": jax.nn.initializers.lecun_uniform()(
            k2, (embed_dim, embed_dim), param_dtype),
        "out_proj_b": jnp.zeros((embed_dim,), param_dtype),
    }
    if add_bias_kv:
        # torch shapes bias_k/v as [1, 1, E]; we store [E].
        params["bias_k"] = xavier_n(k3, (1, embed_dim), param_dtype)[0]
        params["bias_v"] = xavier_n(k4, (1, embed_dim), param_dtype)[0]
    return params


def torch_mha_apply(params: dict, num_heads: int,
                    query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray,
                    *, add_zero_attn: bool = True,
                    dropout_rate: float = 0.0,
                    dropout_rng: Optional[jax.Array] = None,
                    use_flash: bool = False) -> jnp.ndarray:
    """torch.nn.MultiheadAttention forward, batch-first [B, S, E].

    Semantics replicated (torch functional.multi_head_attention_forward):
      1. packed in-projection: q,k,v = split(x @ in_proj_w.T + in_proj_b)
      2. bias_k/bias_v appended as one extra key/value position
      3. add_zero_attn appends one all-zero key/value position
      4. scaled dot-product softmax over keys, attn drop, out-projection
    Dropout only applied when a dropout_rng is passed (training).
    use_flash: streaming-kernel attention for the no-dropout case.
    """
    e = query.shape[-1]
    w = params["in_proj_w"].astype(query.dtype)
    b = params["in_proj_b"].astype(query.dtype)
    wq, wk, wv = w[:e], w[e:2 * e], w[2 * e:]
    bq, bk, bv = b[:e], b[e:2 * e], b[2 * e:]

    q = query @ wq.T + bq
    k = key @ wk.T + bk
    v = value @ wv.T + bv

    bsz = q.shape[0]
    if "bias_k" in params:
        bias_k = jnp.broadcast_to(params["bias_k"].astype(k.dtype), (bsz, 1, e))
        bias_v = jnp.broadcast_to(params["bias_v"].astype(v.dtype), (bsz, 1, e))
        k = jnp.concatenate([k, bias_k], axis=1)
        v = jnp.concatenate([v, bias_v], axis=1)
    if add_zero_attn:
        zeros = jnp.zeros((bsz, 1, e), dtype=k.dtype)
        k = jnp.concatenate([k, zeros], axis=1)
        v = jnp.concatenate([v, zeros], axis=1)

    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)

    scale = (e // num_heads) ** -0.5
    if dropout_rate > 0.0 and dropout_rng is not None:
        # training: streaming online-softmax with in-chunk dropout — the
        # [B, N, Sq, Sk] probs tensor never exists in HBM
        out = dropout_attention_chunked(qh, kh, vh, scale=scale,
                                        rate=dropout_rate,
                                        rng=dropout_rng)
    elif use_flash:
        out = flash_sdpa(qh, kh, vh, scale=scale)
    else:
        logits = jnp.einsum("bqnd,bknd->bnqk", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(query.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", probs, vh)
    out = _merge_heads(out)
    return out @ params["out_proj_w"].astype(out.dtype).T + \
        params["out_proj_b"].astype(out.dtype)


def torch_mha_apply_shared_kv(params: dict, num_heads: int,
                              query: jnp.ndarray, memory: jnp.ndarray,
                              *, add_zero_attn: bool = True,
                              dropout_rate: float = 0.0,
                              dropout_rng: Optional[jax.Array] = None,
                              kv_cache: Optional[tuple] = None
                              ) -> jnp.ndarray:
    """torch_mha_apply specialized for a batch-shared K=V memory.

    The reference's alignment attention repeats the [V, H] token-embedding
    matrix per batch element and projects it B times (modeling.py:974-975,
    :986-1026). The projections are identical across the batch, so here
    ``memory`` is the unbatched [M, E] matrix, projected ONCE — an exact
    (bit-for-bit up to reduction order) equivalent at 1/B of the K/V FLOPs
    and HBM traffic.

    kv_cache: optional precomputed (k, v) [M2, E] pair (already including
    bias/zero rows) from ``shared_kv_project`` — skips the in-graph K/V
    projection. Only valid when no gradient must flow to the K/V weights
    or the memory (the cache is a constant to autodiff).
    """
    e = query.shape[-1]
    w = params["in_proj_w"].astype(query.dtype)
    b = params["in_proj_b"].astype(query.dtype)
    wq = w[:e]
    bq = b[:e]
    q = query @ wq.T + bq                       # [B, Sq, E]

    if kv_cache is not None:
        k, v = kv_cache
        k = k.astype(query.dtype)
        v = v.astype(query.dtype)
        rows_k, rows_v = [k], [v]
    else:
        wk, wv = w[e:2 * e], w[2 * e:]
        bk, bv = b[e:2 * e], b[2 * e:]
        k = memory @ wk.T + bk                  # [M, E] — once
        v = memory @ wv.T + bv
        rows_k, rows_v = [k], [v]
    if kv_cache is None and "bias_k" in params:
        rows_k.append(params["bias_k"].astype(k.dtype)[None, :])
        rows_v.append(params["bias_v"].astype(v.dtype)[None, :])
    if kv_cache is None and add_zero_attn:
        zero = jnp.zeros((1, e), k.dtype)
        rows_k.append(zero)
        rows_v.append(zero)
    k = jnp.concatenate(rows_k, axis=0)         # [M+2, E]
    v = jnp.concatenate(rows_v, axis=0)

    bsz, sq, _ = q.shape
    d = e // num_heads
    qh = q.reshape(bsz, sq, num_heads, d)
    kh = k.reshape(-1, num_heads, d)
    vh = v.reshape(-1, num_heads, d)

    scale = d ** -0.5
    if dropout_rate > 0.0 and dropout_rng is not None:
        # training: stream the 32k-row vocab memory in chunks — the
        # [B, N, Sq, |V|] probs tensor (0.6-0.9 GB at 7b) never exists
        out = dropout_attention_chunked(qh, kh, vh, scale=scale,
                                        rate=dropout_rate,
                                        rng=dropout_rng)
    else:
        logits = jnp.einsum("bqnd,mnd->bnqm", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(query.dtype)
        out = jnp.einsum("bnqm,mnd->bqnd", probs, vh)
    out = out.reshape(bsz, sq, e)
    return out @ params["out_proj_w"].astype(out.dtype).T + \
        params["out_proj_b"].astype(out.dtype)


def shared_kv_project(params: dict, memory: jnp.ndarray,
                      *, add_zero_attn: bool = True
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project a batch-shared K=V memory once: [M, E] -> ([M2, E], [M2, E])
    with the torch bias_k/bias_v row and the add_zero_attn row appended.

    The result depends only on the parameters, so inference paths can
    precompute it once per weight set (see ``fusion.precompute_align_cache``)
    instead of re-projecting the 32007-row vocab memory every step.
    """
    e = memory.shape[-1]
    w = params["in_proj_w"].astype(memory.dtype)
    b = params["in_proj_b"].astype(memory.dtype)
    wk, wv = w[e:2 * e], w[2 * e:]
    bk, bv = b[e:2 * e], b[2 * e:]
    k = memory @ wk.T + bk
    v = memory @ wv.T + bv
    rows_k, rows_v = [k], [v]
    if "bias_k" in params:
        rows_k.append(params["bias_k"].astype(k.dtype)[None, :])
        rows_v.append(params["bias_v"].astype(v.dtype)[None, :])
    if add_zero_attn:
        zero = jnp.zeros((1, e), k.dtype)
        rows_k.append(zero)
        rows_v.append(zero)
    return jnp.concatenate(rows_k, axis=0), jnp.concatenate(rows_v, axis=0)


def torch_mha_apply_shared_kv_einsum(params: dict, num_heads: int,
                                     query: jnp.ndarray,
                                     kv_cache: tuple) -> jnp.ndarray:
    """Einsum alignment attention streaming the (optionally int8) cached
    K/V directly — the inference fast path at prefill batch sizes.

    Measured on v5e at 7b b16 (scripts/bench_align_variants.py): 5.8 /
    7.0 / 10.8 ms for the image/audio/video alignments vs 10.9 / 11.0 /
    14.0 ms through the streaming flash kernel — at ~50 queries per
    example the materialized [B, N, Sq, |V|] logits are cheap, while the
    Pallas grid (16 heads x 32 K-blocks per modality) pays per-step
    overhead, plus the cache-dequant materialization and the fold
    transposes. int8 cache rows are streamed raw into the dot (integers
    <= 127 are exact in bf16) with the per-row scales applied to the
    logits (K) and probs (V) AFTER the dots — exact, since each scale is
    constant along the contracted E-per-head axis.

    kv_cache: ((k, k_scale), (v, v_scale)) from
    ``fusion.precompute_align_cache`` internals — scale None for a plain
    bf16 cache, [M2, 1] fp32 per-row scales for int8.
    """
    e = query.shape[-1]
    n = num_heads
    d = e // n
    b, sq, _ = query.shape
    (kq, ks), (vq, vs) = kv_cache
    m2 = kq.shape[0]

    w = params["in_proj_w"].astype(query.dtype)
    bias = params["in_proj_b"].astype(query.dtype)
    q = query @ w[:e].T + bias[:e]
    qh = q.reshape(b, sq, n, d)
    k8 = kq.reshape(m2, n, d)
    v8 = vq.reshape(m2, n, d)

    logits = jnp.einsum("bqnd,knd->bnqk", qh, k8.astype(query.dtype),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    if ks is not None:
        logits = logits * ks[:, 0][None, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    if vs is not None:
        probs = probs * vs[:, 0][None, None, None, :]
    out = jnp.einsum("bnqk,knd->bqnd", probs.astype(query.dtype),
                     v8.astype(query.dtype))
    out = out.reshape(b, sq, e)
    return out @ params["out_proj_w"].astype(out.dtype).T + \
        params["out_proj_b"].astype(out.dtype)


def torch_mha_apply_shared_kv_flash(params: dict, num_heads: int,
                                    query: jnp.ndarray,
                                    memory: jnp.ndarray,
                                    *, add_zero_attn: bool = True,
                                    kv_cache: Optional[tuple] = None
                                    ) -> jnp.ndarray:
    """Flash-kernel version of torch_mha_apply_shared_kv (inference/no-
    dropout path).

    The batch-shared K/V memory lets the whole attention fold into ONE
    standard non-causal flash attention call: heads become the batch axis
    and (batch x queries) become the query sequence, so the online-softmax
    kernel never materializes the [B, N, q, |V|] logits in HBM.
    Falls back to the einsum path when K/V would not fit VMEM.

    kv_cache: optional precomputed (k, v) [M2, E] pair from
    ``shared_kv_project`` — skips the per-step K/V projection entirely.
    """
    from macaw_llm_tpu.ops.pallas.flash_attention import flash_attention

    e = query.shape[-1]
    d = e // num_heads
    bsz, sq, _ = query.shape

    w = params["in_proj_w"].astype(query.dtype)
    bias = params["in_proj_b"].astype(query.dtype)
    wq = w[:e]
    bq = bias[:e]

    q = query @ wq.T + bq                        # [B, Sq, E]
    if kv_cache is not None:
        k, v = kv_cache
        k = k.astype(query.dtype)
        v = v.astype(query.dtype)
    else:
        k, v = shared_kv_project(params, memory, add_zero_attn=add_zero_attn)
    m2 = k.shape[0]

    # the streaming kernel holds only one (block_q, d)+(2 x block_k, d)
    # tile set in VMEM, so K/V length no longer gates the flash path
    block_k = 1024

    # fold: heads -> batch, (batch x queries) -> sequence
    qh = q.reshape(bsz, sq, num_heads, d).transpose(2, 0, 1, 3) \
        .reshape(num_heads, bsz * sq, 1, d)
    kh = k.reshape(m2, num_heads, d).transpose(1, 0, 2)[:, :, None, :]
    vh = v.reshape(m2, num_heads, d).transpose(1, 0, 2)[:, :, None, :]

    out = flash_attention(qh, kh, vh, None, causal=False,
                          scale=d ** -0.5, block_q=512, block_k=block_k)
    out = out.reshape(num_heads, bsz, sq, d).transpose(1, 2, 0, 3) \
        .reshape(bsz, sq, e)
    return out @ params["out_proj_w"].astype(out.dtype).T + \
        params["out_proj_b"].astype(out.dtype)
