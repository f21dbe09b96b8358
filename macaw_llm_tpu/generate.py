"""Autoregressive generation: jit-compiled prefill + decode with a static
KV cache.

Reference behavior: ``llm.generate(inputs_embeds=..., max_new_tokens=128,
eos_token_id=2, bos_token_id=1, pad_token_id=32006)`` (modeling.py:959) —
greedy decode that consumes embeddings on step 0 and token ids afterwards
(reference prepare_inputs_for_generation, modeling.py:624-652), with
position ids derived from the attention-mask cumsum (modeling.py:630-636).

TPU-native design: one jitted prefill over the fused sequence, then a
``lax.while_loop`` decode with a preallocated [B, S+max_new] cache —
static shapes throughout, early exit when every row has emitted EOS.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from macaw_llm_tpu.config import EOS_ID, LlamaConfig, PAD_ID
from macaw_llm_tpu.models import llama


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray      # [B, max_new_tokens], PAD after EOS
    num_steps: jnp.ndarray   # scalar: decode iterations actually run


def _sample(logits: jnp.ndarray, rng: Optional[jax.Array],
            temperature, top_k: int) -> jnp.ndarray:
    """Next-token choice from [B, V] logits.

    ``temperature`` may be a scalar or a per-row [B] array (traced) —
    rows with temperature == 0 decode greedily even when batched with
    sampling rows, preserving per-request semantics. Greedy everywhere
    when ``rng`` is None."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if rng is None:
        return greedy
    temp = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), greedy.shape)     # [B]
    scaled = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-6)[:, None]
    if top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled < kth, jnp.finfo(jnp.float32).min,
                           scaled)
    sampled = jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temp > 0.0, sampled, greedy)


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "eos_id",
                                   "pad_id", "top_k", "cache_dtype"))
def generate(params: dict, cfg: LlamaConfig, *,
             inputs_embeds: jnp.ndarray,
             attention_mask: Optional[jnp.ndarray] = None,
             max_new_tokens: int = 128,
             eos_id: int = EOS_ID,
             pad_id: int = PAD_ID,
             temperature=0.0,
             top_k: int = 0,
             rng: Optional[jax.Array] = None,
             budgets: Optional[jnp.ndarray] = None,
             cache_dtype: Optional[str] = None) -> GenerateResult:
    """Generate from fused embeddings. inputs_embeds [B, S, H].

    ``budgets`` is an optional per-row [B] int32 cap on generated tokens
    (<= max_new_tokens): a row is finished once its budget is exhausted
    and emits PAD afterwards, and the decode loop exits as soon as every
    row is finished — batching a short request with long ones never
    spends decode steps past the longest *requested* budget.
    ``temperature`` may be per-row (see _sample).
    ``cache_dtype="int8"`` stores the KV cache quantized (half the HBM
    and half the decode attention read; see llama.KVCache)."""
    b, s, _ = inputs_embeds.shape
    total = s + max_new_tokens
    dtype = inputs_embeds.dtype

    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    # cache-length mask: prompt mask + ones for the generated region
    full_mask = jnp.concatenate(
        [attention_mask.astype(jnp.int32),
         jnp.ones((b, max_new_tokens), jnp.int32)], axis=1)

    # positions from mask cumsum (reference modeling.py:630-636)
    prompt_pos = jnp.maximum(
        jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)
    prompt_len = attention_mask.astype(jnp.int32).sum(axis=1)  # [B]

    cache = llama.KVCache.create(
        cfg, b, total, dtype if cache_dtype is None else cache_dtype)
    # prefill produces HIDDEN states only; logits are projected for the
    # single sampled position per row — the full [B, S, 32k] fp32 prefill
    # logits (1.3 GB at 7b batch 32) never exist, which is what lets
    # batch 32 decode fit one chip alongside the prefill peak.
    h, cache = llama.forward_hidden(
        params, cfg, inputs_embeds,
        attention_mask=full_mask, positions=prompt_pos, kv_cache=cache)
    # sample at the LAST VALID prompt position per row — for right-padded
    # prompts logits[:, -1] sits on a PAD slot (HF/the reference sample
    # there anyway; this is a deliberate fix). Left-padded and unpadded
    # prompts are unchanged (last valid == last position).
    last_valid = jnp.max(attention_mask.astype(jnp.int32)
                         * jnp.arange(s)[None, :], axis=1)      # [B]
    h_last = jnp.take_along_axis(h, last_valid[:, None, None], axis=1)
    first_logits = llama.logits_from_hidden(
        params, h_last, llama.valid_vocab(cfg))[:, 0]
    next_tok = _sample(first_logits, rng, temperature, top_k)

    class State(NamedTuple):
        cache: llama.KVCache
        tok: jnp.ndarray          # [B]
        out: jnp.ndarray          # [B, max_new]
        finished: jnp.ndarray     # [B] bool
        step: jnp.ndarray         # scalar int32
        rng: jax.Array

    if budgets is None:
        budgets = jnp.full((b,), max_new_tokens, jnp.int32)
    else:
        budgets = jnp.minimum(budgets.astype(jnp.int32), max_new_tokens)

    out0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(jnp.where(next_tok == eos_id, eos_id, next_tok))
    state = State(cache=cache, tok=next_tok, out=out0,
                  finished=(next_tok == eos_id) | (budgets <= 1),
                  step=jnp.ones((), jnp.int32),
                  rng=rng if rng is not None else jax.random.PRNGKey(0))

    def cond(st: State):
        return (st.step < max_new_tokens) & (~st.finished.all())

    def body(st: State):
        emb = params["embed_tokens"].astype(dtype)[st.tok][:, None, :]
        pos = (prompt_len + st.step - 1)[:, None]
        logits, cache = llama.forward(
            params, cfg, inputs_embeds=emb, attention_mask=full_mask,
            positions=pos, kv_cache=st.cache, dtype=dtype)
        rng, sub = jax.random.split(st.rng)
        nxt = _sample(logits[:, -1], sub if rng is not None else None,
                      temperature, top_k)
        nxt = jnp.where(st.finished, pad_id, nxt)
        out = st.out.at[:, st.step].set(nxt)
        finished = (st.finished | (nxt == eos_id)
                    | (st.step + 1 >= budgets))
        return State(cache=cache, tok=jnp.where(st.finished, pad_id, nxt),
                     out=out, finished=finished, step=st.step + 1, rng=rng)

    final = jax.lax.while_loop(cond, body, state)
    return GenerateResult(tokens=final.out, num_steps=final.step)


def generate_from_ids(params: dict, cfg: LlamaConfig, *,
                      input_ids: jnp.ndarray,
                      attention_mask: Optional[jnp.ndarray] = None,
                      **kw) -> GenerateResult:
    """Text-only convenience wrapper (Alpaca path, no media)."""
    embeds = llama.embed(params, input_ids)
    return generate(params, cfg, inputs_embeds=embeds,
                    attention_mask=attention_mask, **kw)


@partial(jax.jit, static_argnames=("cfg", "num_beams", "max_new_tokens",
                                   "eos_id", "pad_id", "length_penalty"))
def beam_search(params: dict, cfg: LlamaConfig, *,
                inputs_embeds: jnp.ndarray,
                attention_mask: Optional[jnp.ndarray] = None,
                num_beams: int = 4,
                max_new_tokens: int = 128,
                eos_id: int = EOS_ID,
                pad_id: int = PAD_ID,
                length_penalty: float = 1.0) -> GenerateResult:
    """Beam search from fused embeddings (the reference supports this via
    HF GenerationMixin + _reorder_cache, modeling.py:654-659; cache
    reordering here is a gather over the beam-expanded batch axis).

    Returns the best beam per example, PAD after EOS.
    """
    b, s, h = inputs_embeds.shape
    total = s + max_new_tokens
    dtype = inputs_embeds.dtype
    bb = b * num_beams
    neg = jnp.finfo(jnp.float32).min

    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    full_mask = jnp.concatenate(
        [attention_mask.astype(jnp.int32),
         jnp.ones((b, max_new_tokens), jnp.int32)], axis=1)
    full_mask_bb = jnp.repeat(full_mask, num_beams, axis=0)
    prompt_pos = jnp.maximum(
        jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)
    prompt_len = attention_mask.astype(jnp.int32).sum(axis=1)   # [B]
    prompt_len_bb = jnp.repeat(prompt_len, num_beams, axis=0)

    # prefill once per example, then beam-expand the cache
    cache = llama.KVCache.create(cfg, b, total, dtype)
    logits, cache = llama.forward(
        params, cfg, inputs_embeds=inputs_embeds,
        attention_mask=full_mask, positions=prompt_pos, kv_cache=cache,
        dtype=dtype)
    cache = llama.KVCache(
        k=jnp.repeat(cache.k, num_beams, axis=1),
        v=jnp.repeat(cache.v, num_beams, axis=1),
        length=cache.length)

    last_valid = jnp.max(attention_mask.astype(jnp.int32)
                         * jnp.arange(s)[None, :], axis=1)
    first_logits = jnp.take_along_axis(
        logits, last_valid[:, None, None], axis=1)[:, 0]
    logprobs0 = jax.nn.log_softmax(first_logits.astype(jnp.float32), -1)
    top0 = jax.lax.top_k(logprobs0, num_beams)            # ([B,k], [B,k])
    scores = top0[0]                                      # [B, beams]
    tok0 = top0[1].astype(jnp.int32)                      # [B, beams]

    out0 = jnp.full((b, num_beams, max_new_tokens), pad_id, jnp.int32)
    out0 = out0.at[:, :, 0].set(tok0)
    finished0 = tok0 == eos_id

    class BeamState(NamedTuple):
        cache: llama.KVCache
        tok: jnp.ndarray        # [B, beams]
        out: jnp.ndarray        # [B, beams, max_new]
        scores: jnp.ndarray     # [B, beams]
        finished: jnp.ndarray   # [B, beams] bool
        step: jnp.ndarray

    state = BeamState(cache=cache, tok=tok0, out=out0, scores=scores,
                      finished=finished0, step=jnp.ones((), jnp.int32))

    vocab = params["lm_head"].shape[-1] if not isinstance(
        params["lm_head"], dict) else params["lm_head"]["q"].shape[-1]

    def cond(st: BeamState):
        return (st.step < max_new_tokens) & (~st.finished.all())

    def body(st: BeamState):
        tok_flat = st.tok.reshape(bb)
        emb = params["embed_tokens"].astype(dtype)[tok_flat][:, None, :]
        pos = (prompt_len_bb + st.step - 1)[:, None]
        logits, cache = llama.forward(
            params, cfg, inputs_embeds=emb, attention_mask=full_mask_bb,
            positions=pos, kv_cache=st.cache, dtype=dtype)
        lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
        lp = lp.reshape(b, num_beams, vocab)
        # finished beams may only extend with PAD at no cost
        pad_only = jnp.full((vocab,), neg).at[pad_id].set(0.0)
        lp = jnp.where(st.finished[:, :, None], pad_only[None, None, :], lp)
        cand = st.scores[:, :, None] + lp                  # [B, beams, V]
        flat = cand.reshape(b, num_beams * vocab)
        new_scores, idx = jax.lax.top_k(flat, num_beams)   # [B, beams]
        beam_idx = idx // vocab                            # [B, beams]
        tok_idx = (idx % vocab).astype(jnp.int32)

        # reorder everything by selected parent beam (_reorder_cache)
        batch_offset = jnp.arange(b)[:, None] * num_beams
        flat_parent = (batch_offset + beam_idx).reshape(bb)  # [B*beams]
        cache = llama.KVCache(k=cache.k[:, flat_parent],
                              v=cache.v[:, flat_parent],
                              length=cache.length)
        out = jnp.take_along_axis(st.out, beam_idx[:, :, None], axis=1)
        finished = jnp.take_along_axis(st.finished, beam_idx, axis=1)
        tok_idx = jnp.where(finished, pad_id, tok_idx)
        out = out.at[:, :, st.step].set(tok_idx)
        finished = finished | (tok_idx == eos_id)
        return BeamState(cache=cache, tok=tok_idx, out=out,
                         scores=new_scores, finished=finished,
                         step=st.step + 1)

    final = jax.lax.while_loop(cond, body, state)
    # best beam by length-penalized score
    lengths = jnp.sum((final.out != pad_id).astype(jnp.float32), axis=-1)
    norm = final.scores / jnp.maximum(lengths, 1.0) ** length_penalty
    best = jnp.argmax(norm, axis=1)                        # [B]
    tokens = jnp.take_along_axis(final.out, best[:, None, None],
                                 axis=1)[:, 0]
    return GenerateResult(tokens=tokens, num_steps=final.step)
