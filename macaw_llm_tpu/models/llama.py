"""LLaMA decoder, TPU-native.

Covers the reference's vendored LLaMA (modeling.py:94-659): RoPE attention
with KV cache, SwiGLU MLP, RMSNorm pre-norm layers, CLM head with shifted
cross-entropy ignoring -100, and an ``inputs_embeds`` entry point (the hook
through which multimodal prefixes enter, modeling.py:417-425).

Architecture differences from the reference (deliberate, TPU-first):
  * Layer parameters are **stacked** along a leading ``num_layers`` axis and
    the stack is traversed with ``jax.lax.scan`` — one compiled layer body
    instead of N unrolled layers (faster compile, natural remat unit,
    FSDP sharding rules apply uniformly).
  * KV cache is a preallocated static-shape buffer updated with
    ``lax.dynamic_update_slice`` (the reference concatenates tensors per
    step, modeling.py:186-189 — a dynamic shape XLA cannot compile).
  * RoPE cos/sin are computed in-jit (no cached buffers to re-expand).
  * Optional GQA (num_kv_heads) — config, not new code.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from macaw_llm_tpu.config import IGNORE_ID, LlamaConfig
from macaw_llm_tpu.utils import quantize as qz
from macaw_llm_tpu.ops import (apply_rope, causal_mask, combine_masks,
                               dot_product_attention, padding_mask, rms_norm,
                               rope_cos_sin, silu)


class KVCache(NamedTuple):
    """Static-shape per-layer KV cache. k/v: [L, B, S_max, N_kv, D].

    dtype=int8 stores the cache quantized (symmetric per-position-per-head
    scales in ``k_scale``/``v_scale`` [L, B, S_max, N_kv] fp32) — half the
    HBM traffic of the decode attention read, which is what decode is
    bound by. The scales are applied OUTSIDE the attention dots (to the
    logits for K, to the probs for V — exact, since each scale is constant
    along the contracted D axis), so the matmuls stream raw int8 operands
    converted on the fly, the same trick as the int8 weight path
    (utils/quantize.matmul)."""

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # scalar int32: number of valid positions
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_layers, batch, max_len, cfg.kv_heads, cfg.head_dim)
        dtype = jnp.dtype(dtype)
        if dtype == jnp.int8:
            return cls(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       length=jnp.zeros((), jnp.int32),
                       k_scale=jnp.zeros(shape[:-1], jnp.float32),
                       v_scale=jnp.zeros(shape[:-1], jnp.float32))
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=jnp.zeros((), jnp.int32))


def _quant_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., D] -> (int8 [..., D], fp32 scale [...]): symmetric per-vector
    int8 over the head dim (the contracted axis of both attention dots)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 127.0
    q = jnp.round(xf / jnp.maximum(scale, 1e-20)[..., None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: LlamaConfig,
                param_dtype=jnp.float32) -> dict:
    """Random init matching reference scheme (normal(initializer_range),
    modeling.py:325-335)."""
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.padded_vocab
    nkv = cfg.kv_heads * cfg.head_dim
    keys = jax.random.split(rng, 16)
    init = jax.nn.initializers.normal(cfg.initializer_range)
    L = cfg.num_layers

    def stacked(key, shape):
        return init(key, (L,) + shape, param_dtype)

    params = {
        "embed_tokens": init(keys[0], (v, h), param_dtype),
        "layers": {
            "attn": {
                "wq": stacked(keys[1], (h, h)),
                "wk": stacked(keys[2], (h, nkv)),
                "wv": stacked(keys[3], (h, nkv)),
                "wo": stacked(keys[4], (h, h)),
            },
            "mlp": {
                "gate": stacked(keys[5], (h, i)),
                "up": stacked(keys[6], (h, i)),
                "down": stacked(keys[7], (i, h)),
            },
            "input_norm": jnp.ones((L, h), param_dtype),
            "post_norm": jnp.ones((L, h), param_dtype),
        },
        "norm": jnp.ones((h,), param_dtype),
        "lm_head": init(keys[8], (h, v), param_dtype),
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _attention(cfg: LlamaConfig, p: dict, h: jnp.ndarray,
               mask: Optional[jnp.ndarray],
               cos: jnp.ndarray, sin: jnp.ndarray,
               kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
               cache_pos: Optional[jnp.ndarray],
               flash_bias: Optional[jnp.ndarray] = None,
               use_flash: bool = False,
               lora: Optional[dict] = None,
               lora_scale: float = 1.0,
               ring_mesh=None,
               ring_axis: str = "tensor",
               ring_layout: str = "zigzag"):
    """One attention block. h: [B, S, H]. Returns (out, (k_new, v_new)).

    use_flash routes the no-cache (prefill/training) path through the
    Pallas flash-attention kernel; flash_bias is the additive fp32 [B, S]
    padding bias for it."""
    b, s, _ = h.shape
    n, nkv, d = cfg.num_heads, cfg.kv_heads, cfg.head_dim
    compute = h.dtype
    if "qkv" in p:
        # decode-packed layout (pack_llama_for_decode): one [H, (n+2kv)d]
        # stream instead of three — longer HBM bursts, measured 456 vs
        # 283 GB/s effective on v5e matvecs
        assert lora is None, "packed layout is inference-only"
        fused = qz.matmul(h, p["qkv"], compute)
        q2 = fused[..., :n * d]
        k2 = fused[..., n * d:(n + nkv) * d]
        v2 = fused[..., (n + nkv) * d:]
    else:
        q2 = qz.matmul(h, p["wq"], compute)
        k2 = qz.matmul(h, p["wk"], compute)
        v2 = qz.matmul(h, p["wv"], compute)
    if lora is not None:
        from macaw_llm_tpu.train.lora import lora_delta
        q2 = q2 + lora_delta(h, lora["qa"], lora["qb"], lora_scale)
        v2 = v2 + lora_delta(h, lora["va"], lora["vb"], lora_scale)
    q = q2.reshape(b, s, n, d)
    k = k2.reshape(b, s, nkv, d)
    v = v2.reshape(b, s, nkv, d)
    q, k = apply_rope(q, k, cos, sin)

    quant_cache = False
    if kv is not None:
        # kv = (ck_all [L, B, S, N, D], cv_all, ks_all, vs_all, layer_idx):
        # the STACKED cache is threaded through the layer scan as carry and
        # only the current token positions are written — a single-position
        # dynamic-update-slice XLA performs in place. (The previous
        # xs->ys layout forced a full fresh cache write every decode
        # step: ~3.2 GB/step at 7b b16, ~25 ms of pure copy.)
        # ks_all/vs_all are the int8-cache scales (None for bf16 cache).
        ck_all, cv_all, ks_all, vs_all, li = kv
        quant_cache = ks_all is not None
        if quant_cache:
            kw, ks = _quant_kv(k)
            vw, vs = _quant_kv(v)
        else:
            kw, vw = k.astype(ck_all.dtype), v.astype(cv_all.dtype)
        if cache_pos.ndim == 1:
            # per-row write positions (continuous batching: every slot has
            # its own sequence length). s == 1 is the decode step; s > 1 is
            # the speculative-verify step (k draft tokens + 1 verified per
            # row, all written at row-relative offsets in one scatter).
            rows = jnp.arange(b)
            if s == 1:
                ck_all = ck_all.at[li, rows, cache_pos].set(kw[:, 0])
                cv_all = cv_all.at[li, rows, cache_pos].set(vw[:, 0])
                if quant_cache:
                    ks_all = ks_all.at[li, rows, cache_pos].set(ks[:, 0])
                    vs_all = vs_all.at[li, rows, cache_pos].set(vs[:, 0])
            else:
                r2 = rows[:, None]
                cols = cache_pos[:, None] + jnp.arange(s)[None, :]
                ck_all = ck_all.at[li, r2, cols].set(kw)
                cv_all = cv_all.at[li, r2, cols].set(vw)
                if quant_cache:
                    ks_all = ks_all.at[li, r2, cols].set(ks)
                    vs_all = vs_all.at[li, r2, cols].set(vs)
        else:
            # write current k/v into the static cache at cache_pos
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, kw[None], (li, 0, cache_pos, 0, 0))
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, vw[None], (li, 0, cache_pos, 0, 0))
            if quant_cache:
                ks_all = jax.lax.dynamic_update_slice(
                    ks_all, ks[None], (li, 0, cache_pos, 0))
                vs_all = jax.lax.dynamic_update_slice(
                    vs_all, vs[None], (li, 0, cache_pos, 0))
        ck = jax.lax.dynamic_index_in_dim(ck_all, li, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(cv_all, li, 0, keepdims=False)
        if quant_cache:
            # int8 operands convert on the MXU read; scales applied to
            # logits/probs inside dot_product_attention_quant
            k_full, v_full = ck.astype(compute), cv.astype(compute)
            k_sc = jax.lax.dynamic_index_in_dim(ks_all, li, 0,
                                                keepdims=False)
            v_sc = jax.lax.dynamic_index_in_dim(vs_all, li, 0,
                                                keepdims=False)
        else:
            k_full, v_full = ck.astype(compute), cv.astype(compute)
        new_kv = (ck_all, cv_all, ks_all, vs_all)
    else:
        k_full, v_full = k, v
        new_kv = (k, v)

    if nkv != n:
        rep = n // nkv
        k_full = jnp.repeat(k_full, rep, axis=2)
        v_full = jnp.repeat(v_full, rep, axis=2)
        if quant_cache:
            k_sc = jnp.repeat(k_sc, rep, axis=2)
            v_sc = jnp.repeat(v_sc, rep, axis=2)

    if ring_mesh is not None and kv is None:
        # sequence sharded across chips: ring attention (no padding bias —
        # long-context training packs sequences)
        from macaw_llm_tpu.parallel.ring_attention import ring_attention
        out = ring_attention(q, k_full, v_full, mesh=ring_mesh,
                             axis=ring_axis, layout=ring_layout)
    elif use_flash and kv is None:
        from macaw_llm_tpu.ops.pallas.flash_attention import flash_attention
        from macaw_llm_tpu.ops.pallas.mh_attention import (
            fits_mh_attention, mh_attention)
        if fits_mh_attention(s, k_full.shape[1], d):
            # short-seq fused kernel: whole seq resident in VMEM, 8
            # heads/grid-step — 0.97 vs einsum's 4.94 ms at the 7b
            # fused-prefill shape (see mh_attention.py header)
            out = mh_attention(q, k_full, v_full, flash_bias, causal=True)
        else:
            out = flash_attention(q, k_full, v_full, flash_bias,
                                  causal=True)
    elif quant_cache:
        from macaw_llm_tpu.ops.attention import dot_product_attention_quant
        out = dot_product_attention_quant(q, k_full, v_full, k_sc, v_sc,
                                          mask)
    else:
        out = dot_product_attention(q, k_full, v_full, mask)
    out = out.reshape(b, s, n * d)
    return qz.matmul(out, p["wo"], compute), new_kv


def _mlp(p: dict, h: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU: down(silu(gate(x)) * up(x)) (reference LlamaMLP,
    modeling.py:126-140)."""
    c = h.dtype
    if "gateup" in p:  # decode-packed layout (pack_llama_for_decode)
        gu = qz.matmul(h, p["gateup"], c)
        i = gu.shape[-1] // 2
        return qz.matmul(silu(gu[..., :i]) * gu[..., i:], p["down"], c)
    return qz.matmul(silu(qz.matmul(h, p["gate"], c))
                     * qz.matmul(h, p["up"], c), p["down"], c)


def _decoder_layer(cfg: LlamaConfig, lp: dict, h: jnp.ndarray,
                   mask, cos, sin, kv, cache_pos,
                   flash_bias=None, use_flash=False, lora_scale=1.0,
                   ring_mesh=None, ring_axis="tensor",
                   ring_layout="zigzag"):
    """Pre-norm attn + residual, pre-norm SwiGLU + residual
    (reference LlamaDecoderLayer, modeling.py:234-299)."""
    attn_out, new_kv = _attention(
        cfg, lp["attn"], rms_norm(h, lp["input_norm"], cfg.rms_norm_eps),
        mask, cos, sin, kv, cache_pos, flash_bias, use_flash,
        lp.get("lora"), lora_scale, ring_mesh, ring_axis, ring_layout)
    h = h + attn_out
    h = h + _mlp(lp["mlp"], rms_norm(h, lp["post_norm"], cfg.rms_norm_eps))
    return h, new_kv


def embed(params: dict, input_ids: jnp.ndarray,
          dtype=jnp.float32) -> jnp.ndarray:
    """Token embedding lookup ([B, S] -> [B, S, H])."""
    return params["embed_tokens"].astype(dtype)[input_ids]


def forward_hidden(params: dict, cfg: LlamaConfig,
                   inputs_embeds: jnp.ndarray,
                   attention_mask: Optional[jnp.ndarray] = None,
                   positions: Optional[jnp.ndarray] = None,
                   kv_cache: Optional[KVCache] = None,
                   remat: bool = False,
                   use_flash: bool = False,
                   lora_scale: float = 1.0,
                   shard_sequence: bool = False,
                   ring_mesh=None,
                   ring_axis: str = "tensor",
                   ring_layout: str = "zigzag") -> Tuple[jnp.ndarray,
                                                         Optional[KVCache]]:
    """Decoder stack over ``inputs_embeds`` [B, S, H].

    attention_mask: [B, S_total] {0,1} over the full kv length (prefix
    conventions handled by the caller, cf. reference modeling.py:450-452).
    positions: [B, S] int positions for RoPE; derived from the cache length
    when omitted (reference modeling.py:434-439 semantics).
    """
    b, s, _ = inputs_embeds.shape
    if kv_cache is not None:
        cache_pos = kv_cache.length
        kv_len = kv_cache.k.shape[2]
        if cache_pos.ndim == 1:
            # per-row lengths (continuous batching / speculative verify):
            # query i of row r sits at absolute position cache_pos[r] + i
            if positions is None:
                positions = cache_pos[:, None] + jnp.arange(s)[None, :]
            q_pos = cache_pos[:, None, None] + jnp.arange(s)[None, :, None]
            k_pos = jnp.arange(kv_len)[None, None, :]
            base = jnp.where(k_pos <= q_pos, 0.0,
                             jnp.finfo(jnp.float32).min)  # [B, s, kv]
            mask = base[:, None, :, :]                    # [B, 1, s, kv]
        else:
            if positions is None:
                positions = cache_pos + jnp.arange(s)[None, :]
            # causal mask against the static cache: key j valid iff
            # j <= cache_pos + i (queries at cache_pos..cache_pos+s-1)
            q_pos = cache_pos + jnp.arange(s)[:, None]
            k_pos = jnp.arange(kv_len)[None, :]
            mask = jnp.where(k_pos <= q_pos, 0.0,
                             jnp.finfo(jnp.float32).min)[None, None]
        if attention_mask is not None:
            mask = combine_masks(mask, padding_mask(attention_mask, s))
    else:
        cache_pos = jnp.zeros((), jnp.int32)
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        mask = causal_mask(s, s)
        if attention_mask is not None:
            mask = combine_masks(mask, padding_mask(attention_mask, s))

    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_base)

    flash_bias = None
    if use_flash and kv_cache is None:
        if attention_mask is not None:
            flash_bias = jnp.where(attention_mask.astype(jnp.int32) == 1,
                                   0.0, jnp.finfo(jnp.float32).min
                                   ).astype(jnp.float32)
        mask = None  # flash kernel applies causal + padding itself

    # bind static flags (bools/floats) BEFORE jax.checkpoint — remat would
    # otherwise trace them and `if use_flash` would fail on a tracer
    layer_fn = partial(_decoder_layer, cfg,
                       use_flash=use_flash and kv_cache is None,
                       lora_scale=lora_scale,
                       ring_mesh=ring_mesh if kv_cache is None else None,
                       ring_axis=ring_axis, ring_layout=ring_layout)
    if remat:
        # remat accepts False | True/"nothing" | "dots": "dots" saves
        # matmul outputs and recomputes only elementwise ops in the
        # backward pass — less recompute where HBM allows (1b profile)
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if remat == "dots"
                  else jax.checkpoint_policies.nothing_saveable)
        layer_fn = jax.checkpoint(layer_fn, policy=policy)

    def scan_body(h, xs):
        lp = xs
        h, _ = layer_fn(lp, h, mask, cos, sin, None, None, flash_bias)
        return h, None

    def scan_body_cached(carry, xs):
        h, ck_all, cv_all, ks_all, vs_all = carry
        lp, li = xs
        h, (ck_all, cv_all, ks_all, vs_all) = layer_fn(
            lp, h, mask, cos, sin, (ck_all, cv_all, ks_all, vs_all, li),
            cache_pos, None)
        return (h, ck_all, cv_all, ks_all, vs_all), None

    h = inputs_embeds
    if shard_sequence and kv_cache is None:
        # sequence/context parallelism (SURVEY §5.7): activations sharded
        # over the `tensor` mesh axis along the sequence dim between
        # layers; GSPMD inserts the gathers attention needs. A config
        # change, not new code — usable once seq length outgrows one chip.
        from jax.sharding import PartitionSpec as P
        h = jax.lax.with_sharding_constraint(
            h, P(("dcn", "data", "fsdp"), "tensor", None))
    if kv_cache is not None:
        n_layers = kv_cache.k.shape[0]
        (h, nk, nv, nks, nvs), _ = jax.lax.scan(
            scan_body_cached,
            (h, kv_cache.k, kv_cache.v, kv_cache.k_scale,
             kv_cache.v_scale),
            (params["layers"], jnp.arange(n_layers)))
        new_cache = KVCache(k=nk, v=nv, length=cache_pos + s,
                            k_scale=nks, v_scale=nvs)
    else:
        h, _ = jax.lax.scan(scan_body, h, params["layers"])
        new_cache = None

    h = rms_norm(h, params["norm"].astype(h.dtype), cfg.rms_norm_eps)
    return h, new_cache


def logits_from_hidden(params: dict, h: jnp.ndarray,
                       valid: Optional[int] = None) -> jnp.ndarray:
    """CLM head (no bias, reference modeling.py:530). fp32 logits.

    ``valid``: with a padded vocab (cfg.vocab_pad_to), the number of REAL
    vocab entries — padded columns are masked to -inf so loss, argmax and
    sampling can never select them."""
    logits = qz.matmul(h, params["lm_head"], h.dtype).astype(jnp.float32)
    return _mask_padded_vocab(logits, valid)


def _mask_padded_vocab(logits: jnp.ndarray,
                       valid: Optional[int]) -> jnp.ndarray:
    if valid is None or valid >= logits.shape[-1]:
        return logits
    cols = jnp.arange(logits.shape[-1])
    return jnp.where(cols < valid, logits, jnp.finfo(jnp.float32).min)


def valid_vocab(cfg: LlamaConfig) -> Optional[int]:
    """The ``valid`` argument for logits masking: the real vocab size when
    the storage vocab is padded, else None (no masking work)."""
    return cfg.vocab_size if cfg.padded_vocab > cfg.vocab_size else None


def forward(params: dict, cfg: LlamaConfig,
            input_ids: Optional[jnp.ndarray] = None,
            inputs_embeds: Optional[jnp.ndarray] = None,
            attention_mask: Optional[jnp.ndarray] = None,
            positions: Optional[jnp.ndarray] = None,
            kv_cache: Optional[KVCache] = None,
            remat: bool = False,
            use_flash: bool = False,
            lora_scale: float = 1.0,
            shard_sequence: bool = False,
            ring_mesh=None,
            ring_axis: str = "tensor",
            ring_layout: str = "zigzag",
            dtype=jnp.float32):
    """Full CLM forward -> (logits [B,S,V] fp32, new_kv_cache).

    Accepts token ids or embeddings, never both (reference
    modeling.py:417-425)."""
    assert (input_ids is None) != (inputs_embeds is None), \
        "pass exactly one of input_ids / inputs_embeds"
    if inputs_embeds is None:
        inputs_embeds = embed(params, input_ids, dtype)
    h, new_cache = forward_hidden(params, cfg, inputs_embeds, attention_mask,
                                  positions, kv_cache, remat, use_flash,
                                  lora_scale, shard_sequence,
                                  ring_mesh, ring_axis, ring_layout)
    return logits_from_hidden(params, h, valid_vocab(cfg)), new_cache


def clm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Shift-by-one cross-entropy ignoring IGNORE_ID (-100)
    (reference modeling.py:600-610)."""
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_ID
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None],
                               axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom


def clm_loss_chunked(params: dict, h: jnp.ndarray, labels: jnp.ndarray,
                     chunk: int = 1024,
                     targets_aligned: bool = False,
                     valid: Optional[int] = None) -> jnp.ndarray:
    """Shifted CE straight from final hidden states without ever
    materializing the [B, S, V] logits.

    The fused multimodal sequences are long (~1.5k) and the vocab is 32k:
    full fp32 logits plus their log-softmax cost ~1.5 GB at batch 4 on the
    7b profile — the difference between a LoRA train step fitting one v5e
    or not. Scanning ``chunk`` positions at a time with jax.checkpoint
    bounds peak memory at O(B * chunk * V); the backward pass recomputes
    each chunk's logits. Numerically identical to
    ``clm_loss(logits_from_hidden(params, h), labels)``.
    """
    b, s, _ = h.shape
    if targets_aligned:
        # labels are already position-aligned next-token targets (the
        # ring path pre-shifts and permutes; see clm_loss_aligned)
        targets = labels
    else:
        targets = jnp.concatenate(
            [labels[:, 1:], jnp.full((b, 1), IGNORE_ID, labels.dtype)],
            axis=1)
    pad = (-s) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)),
                          constant_values=IGNORE_ID)
    n = (s + pad) // chunk
    hs = h.reshape(b, n, chunk, h.shape[-1]).transpose(1, 0, 2, 3)
    ts = targets.reshape(b, n, chunk).transpose(1, 0, 2)
    w = params["lm_head"]

    @jax.checkpoint
    def chunk_nll(h_c, t_c):
        logits = qz.matmul(h_c, w, h_c.dtype).astype(jnp.float32)
        logits = _mask_padded_vocab(logits, valid)
        ok = t_c != IGNORE_ID
        safe = jnp.where(ok, t_c, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.where(ok, nll, 0.0).sum(), ok.sum()

    def body(carry, xs):
        nll, cnt = chunk_nll(*xs)
        return (carry[0] + nll, carry[1] + cnt), None

    (nll_sum, count), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (hs, ts))
    return nll_sum / jnp.maximum(count, 1)


def clm_loss_aligned(logits: jnp.ndarray, targets: jnp.ndarray
                     ) -> jnp.ndarray:
    """Position-aligned cross-entropy: ``targets[:, i]`` is the token the
    logits at position i must predict (IGNORE_ID elsewhere). Equivalent to
    ``clm_loss`` after the caller pre-shifts labels — required for
    sequence layouts where positions are permuted (ring attention's
    zig-zag), where a shift-by-one inside the loss would be wrong."""
    valid = targets != IGNORE_ID
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)
