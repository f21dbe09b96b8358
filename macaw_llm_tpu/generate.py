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


# ---------------------------------------------------------------------------
# Speculative decoding (prompt-lookup drafts + batched verify)
# ---------------------------------------------------------------------------

def _ngram_propose(hist: jnp.ndarray, hist_len: jnp.ndarray,
                   draft_len: int, ngram: int,
                   pad_id: int) -> jnp.ndarray:
    """Prompt-lookup drafting: propose the ``draft_len`` tokens that
    followed the most recent earlier occurrence of the current
    ``ngram``-token suffix in the row's history.

    hist [B, L] int32 (prompt then generated, PAD elsewhere);
    hist_len [B] valid lengths. Rows with no match propose PAD (which the
    verify step rejects — plain decode speed, never wrong output).
    """
    b, L = hist.shape
    rows = jnp.arange(b)[:, None]
    s0 = hist_len - ngram                                   # suffix start
    suffix = hist[rows, jnp.clip(s0[:, None] + jnp.arange(ngram), 0, L - 1)]
    # match[p] == True iff hist[p : p + ngram] == suffix
    match = jnp.ones((b, L - ngram + 1), bool)
    for j in range(ngram):
        match &= hist[:, j:L - ngram + 1 + j] == suffix[:, j:j + 1]
    p = jnp.arange(L - ngram + 1)[None, :]
    # candidate must end strictly before the suffix occurrence itself
    valid = match & (p < s0[:, None]) & (s0[:, None] >= 0)
    best = jnp.max(jnp.where(valid, p, -1), axis=1)         # [B]
    idx = best[:, None] + ngram + jnp.arange(draft_len)[None, :]
    vals = hist[rows, jnp.clip(idx, 0, L - 1)]
    ok = (best[:, None] >= 0) & (idx < hist_len[:, None])
    return jnp.where(ok, vals, pad_id).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "eos_id",
                                   "pad_id", "draft_len", "ngram",
                                   "cache_dtype", "proposer"))
def generate_speculative(params: dict, cfg: LlamaConfig, *,
                         inputs_embeds: jnp.ndarray,
                         prompt_ids: jnp.ndarray,
                         attention_mask: Optional[jnp.ndarray] = None,
                         max_new_tokens: int = 128,
                         eos_id: int = EOS_ID,
                         pad_id: int = PAD_ID,
                         draft_len: int = 4,
                         ngram: int = 2,
                         cache_dtype: Optional[str] = None,
                         proposer: str = "ngram",
                         oracle_tokens: Optional[jnp.ndarray] = None
                         ) -> GenerateResult:
    """Greedy decoding with speculative verification.

    Decode is HBM-bound: one verify forward over ``draft_len + 1``
    positions streams the same weight bytes as a single-token step, so
    every accepted draft token is nearly free. Drafts come from
    prompt-lookup (``proposer="ngram"``): the continuation of the most
    recent earlier occurrence of the current n-token suffix in
    [prompt_ids; generated] — no draft model, strong on the reference's
    grounded VQA/AVSD answers that copy prompt spans. The output is
    IDENTICAL to ``generate``'s greedy output for any drafts (rejected
    drafts fall back to the verified token), which the tests pin.

    inputs_embeds [B, S_f]: the fused multimodal prefill sequence.
    prompt_ids [B, S_p]: right-padded TEXT token ids (the n-gram corpus);
    pass the same input_ids the fusion consumed.
    proposer="oracle" (with oracle_tokens [B, max_new]) replaces the
    drafter with ground truth — the mechanism's acceptance=1 upper bound,
    used by scripts/bench_speculative.py.

    Beyond-reference capability (the reference greedy-decodes one token
    per forward through HF generate, modeling.py:959).
    """
    assert proposer in ("ngram", "oracle")
    if proposer == "oracle":
        assert oracle_tokens is not None
    b, s, _ = inputs_embeds.shape
    k = draft_len
    total = s + max_new_tokens + k  # verify writes may overshoot by <= k
    dtype = inputs_embeds.dtype

    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    full_mask = jnp.concatenate(
        [attention_mask.astype(jnp.int32),
         jnp.ones((b, max_new_tokens + k), jnp.int32)], axis=1)
    prompt_pos = jnp.maximum(
        jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)

    cache = llama.KVCache.create(
        cfg, b, total, dtype if cache_dtype is None else cache_dtype)
    h, cache = llama.forward_hidden(
        params, cfg, inputs_embeds,
        attention_mask=full_mask, positions=prompt_pos, kv_cache=cache)
    last_valid = jnp.max(attention_mask.astype(jnp.int32)
                         * jnp.arange(s)[None, :], axis=1)
    h_last = jnp.take_along_axis(h, last_valid[:, None, None], axis=1)
    first_logits = llama.logits_from_hidden(
        params, h_last, llama.valid_vocab(cfg))[:, 0]
    next_tok = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)

    # n-gram corpus: prompt text directly followed by generated tokens
    # (per-row placement — right-padded prompts leave no PAD gap)
    sp = prompt_ids.shape[1]
    L = sp + max_new_tokens
    plen = jnp.sum((prompt_ids != pad_id).astype(jnp.int32), axis=1)
    hist0 = jnp.concatenate(
        [prompt_ids.astype(jnp.int32),
         jnp.full((b, max_new_tokens), pad_id, jnp.int32)], axis=1)

    out0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(next_tok)
    rows = jnp.arange(b)

    class SpecState(NamedTuple):
        cache: llama.KVCache
        tok: jnp.ndarray       # [B] last emitted token (not yet in cache)
        out: jnp.ndarray       # [B, max_new]
        n_emit: jnp.ndarray    # [B] tokens emitted so far
        row_len: jnp.ndarray   # [B] valid cache length per row
        finished: jnp.ndarray  # [B] bool
        rounds: jnp.ndarray    # scalar: verify forwards actually run

    row_len0 = jnp.full((b,), s, jnp.int32)
    state = SpecState(cache=cache._replace(length=row_len0), tok=next_tok,
                      out=out0, n_emit=jnp.ones((b,), jnp.int32),
                      row_len=row_len0,
                      finished=(next_tok == eos_id),
                      rounds=jnp.zeros((), jnp.int32))

    def cond(st: SpecState):
        return (~st.finished.all()) & (st.n_emit.min() < max_new_tokens)

    def body(st: SpecState):
        # ---- draft ----
        if proposer == "oracle":
            idx = st.n_emit[:, None] + jnp.arange(k)[None, :]
            drafts = jnp.where(
                idx < max_new_tokens,
                oracle_tokens[rows[:, None], jnp.clip(idx, 0,
                                                      max_new_tokens - 1)],
                pad_id).astype(jnp.int32)
        else:
            hist = hist0.at[rows[:, None],
                            jnp.clip(plen[:, None] + jnp.arange(
                                max_new_tokens), 0, L - 1)].set(st.out)
            drafts = _ngram_propose(hist, plen + st.n_emit, k, ngram,
                                    pad_id)

        # ---- verify forward over [tok, d1..dk] ----
        seq = jnp.concatenate([st.tok[:, None], drafts], axis=1)  # [B,k+1]
        emb = params["embed_tokens"].astype(dtype)[seq]
        cache_in = st.cache._replace(length=st.row_len)
        logits, cache = llama.forward(
            params, cfg, inputs_embeds=emb, attention_mask=full_mask,
            kv_cache=cache_in, dtype=dtype)
        # forward already masks padded vocab columns to -inf
        t = jnp.argmax(logits, axis=-1).astype(jnp.int32)         # [B,k+1]

        # ---- accept: longest matching prefix, stop at EOS/budget ----
        m = drafts == t[:, :k]                                    # [B, k]
        lead = jnp.cumprod(m.astype(jnp.int32), axis=1)           # [B, k]
        i_idx = jnp.arange(k + 1)[None, :]
        within_accept = i_idx <= jnp.sum(lead, axis=1)[:, None]   # i <= a
        # eos_before[i]: an EOS strictly before index i in this round
        eos_before = jnp.concatenate(
            [jnp.zeros((b, 1), bool),
             jnp.cumsum((t[:, :k] == eos_id).astype(jnp.int32),
                        axis=1) > 0], axis=1)
        vi = (within_accept & ~eos_before
              & ((st.n_emit[:, None] + i_idx) < max_new_tokens)
              & ~st.finished[:, None])                            # [B,k+1]
        nv = jnp.sum(vi.astype(jnp.int32), axis=1)                # [B]

        # ---- emit ----
        pos = st.n_emit[:, None] + i_idx
        vals = jnp.where(vi, t, pad_id)
        # only write the valid region; mode="drop" clips budget overflow
        out = st.out.at[rows[:, None],
                        jnp.where(vi, pos, max_new_tokens)].set(
            vals, mode="drop")
        new_emit = st.n_emit + nv
        hit_eos = jnp.any(vi & (t == eos_id), axis=1)
        finished = (st.finished | hit_eos
                    | (new_emit >= max_new_tokens))
        last_i = jnp.maximum(nv - 1, 0)
        new_tok = jnp.where(st.finished, st.tok,
                            t[rows, last_i])
        return SpecState(cache=cache._replace(length=st.row_len),
                         tok=new_tok, out=out, n_emit=new_emit,
                         row_len=st.row_len + nv, finished=finished,
                         rounds=st.rounds + 1)

    final = jax.lax.while_loop(cond, body, state)
    return GenerateResult(tokens=final.out, num_steps=final.rounds)


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
