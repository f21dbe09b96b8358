"""Multimodal fusion model — the TPU-native MM_LLMs.

Covers reference modeling.py:863-1093: CLIP image/video encoders, Whisper
audio encoder, LLaMA decoder, per-modality Conv1d sequence downsamplers,
linear adapters, alignment cross-attention (modality features = Q, the
LLM's full token-embedding matrix = K/V), boundary-token splicing and
mask/label extension.

Sequence layout (reference prepare_inputs_for_generation, splice order
video -> audio -> image each inserting at position 1, modeling.py:978-1034):

    [BOS][<image> im0..im4 </image>][<audio> au0..au5 </audio>]
         [<video> vi0..vi38 </video>][text ...]

attention_mask gets ``prefix_len`` ones and labels get ``prefix_len``
IGNORE_IDs prepended at the FRONT (modeling.py:1036-1044).

TPU-first design notes:
  * All three modalities are always materialized (zeros when absent) —
    exactly the reference's runtime behavior (llm_trainer.py:314-352) —
    so the fused sequence length is static and jit-friendly.
  * The splice is a single concatenate in final-layout order instead of
    the reference's three insert-at-position-1 ops (same result).
  * The align attention's K/V memory is the [V, H] embedding matrix
    broadcast per batch — one large static matmul, MXU-friendly.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from macaw_llm_tpu.config import (AUDIO_END, AUDIO_START, IGNORE_ID,
                                  IMAGE_END, IMAGE_START, ModelConfig,
                                  VIDEO_END, VIDEO_START)
from macaw_llm_tpu.models import clip, llama, whisper
from macaw_llm_tpu.ops import dense, torch_mha_apply, torch_mha_init
from macaw_llm_tpu.ops.attention import (shared_kv_project,
                                          torch_mha_apply_shared_kv,
                                          torch_mha_apply_shared_kv_flash)


class FusedBatch(NamedTuple):
    inputs_embeds: jnp.ndarray            # [B, P+S, H]
    attention_mask: Optional[jnp.ndarray]  # [B, P+S]
    labels: Optional[jnp.ndarray]          # [B, P+S]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: ModelConfig,
                param_dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, 16)
    h = cfg.llm.hidden_size
    pd = cfg.vision.projection_dim
    dm = cfg.audio.d_model
    fh = cfg.fusion.attention_heads

    def linear(k, din, dout):
        lim = 1.0 / math.sqrt(din)
        kw, kb = jax.random.split(k)
        return {"w": jax.random.uniform(kw, (din, dout), param_dtype,
                                        -lim, lim),
                "b": jax.random.uniform(kb, (dout,), param_dtype, -lim, lim)}

    def conv1d(k, ch, kernel):
        lim = 1.0 / math.sqrt(ch * kernel)
        kw, kb = jax.random.split(k)
        return {"w": jax.random.uniform(kw, (kernel, ch, ch), param_dtype,
                                        -lim, lim),
                "b": jax.random.uniform(kb, (ch,), param_dtype, -lim, lim)}

    return {
        "image_encoder": clip.init_params(keys[0], cfg.vision, param_dtype),
        "video_encoder": clip.init_params(keys[1], cfg.vision, param_dtype),
        "audio_encoder": whisper.init_params(keys[2], cfg.audio, param_dtype),
        "llm": llama.init_params(keys[3], cfg.llm, param_dtype),
        "fusion": {
            # alignment attention, heads*2 (modeling.py:888-904)
            "image_align": torch_mha_init(keys[4], h, fh * 2,
                                          param_dtype=param_dtype),
            "audio_align": torch_mha_init(keys[5], h, fh * 2,
                                          param_dtype=param_dtype),
            "video_align": torch_mha_init(keys[6], h, fh * 2,
                                          param_dtype=param_dtype),
            # video-long self-attention (modeling.py:906-910)
            "video_long_attn": torch_mha_init(keys[7], pd, fh,
                                              param_dtype=param_dtype),
            # simple temporal path (modeling.py:882-886, encode_video)
            "temporal_attn": torch_mha_init(keys[8], pd, fh,
                                            param_dtype=param_dtype),
            "temporal_pos_emb": jax.nn.initializers.normal(1.0)(
                keys[9], (cfg.fusion.n_frames, pd), param_dtype),
            # adapters to LLM hidden (modeling.py:912-917)
            "to_hidden": {
                "video": linear(keys[10], pd, h),
                "audio": linear(keys[11], dm, h),
                "image": linear(keys[12], pd, h),
            },
            # Conv1d sequence downsamplers (modeling.py:919-924)
            "conv": {
                "image": conv1d(keys[13], pd, cfg.fusion.image_conv_kernel),
                "video": conv1d(keys[14], pd, cfg.fusion.video_conv_kernel),
                "audio": conv1d(keys[15], dm, cfg.fusion.audio_conv_kernel),
            },
        },
    }


# ---------------------------------------------------------------------------
# Reference's sinusoidal PE (modeling.py:1095-1118) — note the quirk:
# div_term = exp(-log(10000)/h * (2*i)) with i stepping by 2, i.e. the
# frequency for pair i is 10000^(-2i/h), NOT the classic 10000^(-i/h).
# Replicated exactly (vectorized instead of the reference's double loop).
# ---------------------------------------------------------------------------

def sinusoidal_pe(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    i = jnp.arange(0, dim, 2, dtype=jnp.float32)[None, :]
    div_term = jnp.exp(-(math.log(10000.0) / dim) * (2.0 * i))
    angles = pos * div_term                       # [L, dim/2]
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe.astype(dtype)


# ---------------------------------------------------------------------------
# Modality encoders (reference modeling.py:1050-1093)
# ---------------------------------------------------------------------------

def encode_image(params: dict, cfg: ModelConfig,
                 images: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, H, W] -> [B, P, projection_dim] (modeling.py:1085-1093)."""
    return clip.encode_patches(params["image_encoder"], cfg.vision, images,
                               use_flash=cfg.tower_flash,
                               remat=(cfg.remat_policy if cfg.remat
                                      else False))


def encode_video_long(params: dict, cfg: ModelConfig, videos: jnp.ndarray,
                      dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """[B, F, 3, H, W] -> [B, F*P, projection_dim] (modeling.py:1070-1079):
    per-frame patch tokens, concat across frames, reference sinusoidal PE,
    one self-attention pass."""
    b, f = videos.shape[0], videos.shape[1]
    frames = videos.reshape((b * f,) + videos.shape[2:])
    feats = clip.encode_patches(params["video_encoder"], cfg.vision, frames,
                                use_flash=cfg.tower_flash,
                                remat=(cfg.remat_policy if cfg.remat
                                       else False))
    feats = feats.reshape(b, f * feats.shape[1], feats.shape[2])
    feats = feats + sinusoidal_pe(feats.shape[1], feats.shape[2],
                                  feats.dtype)[None]
    return torch_mha_apply(
        params["fusion"]["video_long_attn"], cfg.fusion.attention_heads,
        feats, feats, feats, add_zero_attn=True,
        dropout_rate=cfg.fusion.align_dropout, dropout_rng=dropout_rng,
        use_flash=cfg.tower_flash)


def encode_video_simple(params: dict, cfg: ModelConfig,
                        videos: jnp.ndarray,
                        dropout_rng: Optional[jax.Array] = None
                        ) -> jnp.ndarray:
    """Alternative pooled-frame video path (reference encode_video,
    modeling.py:1050-1068 — unused by the reference's forward but kept as a
    selectable mode): per-frame pooled CLIP feature + learned temporal
    position embedding + temporal self-attention over frames.

    Note: the reference uses CLIP's ``get_image_features`` (post-layernormed
    CLS pooled output -> visual_projection); replicated here.
    """
    b, f = videos.shape[0], videos.shape[1]
    frames = videos.reshape((b * f,) + videos.shape[2:])
    venc = params["video_encoder"]
    # pooled path: post_layernorm(CLS) @ visual_projection
    from macaw_llm_tpu.ops import layer_norm
    hidden = clip._embeddings(venc, cfg.vision, frames)
    hidden = layer_norm(hidden, venc["pre_layernorm"]["w"],
                        venc["pre_layernorm"]["b"],
                        cfg.vision.layer_norm_eps)

    def body(hh, lp):
        return clip._encoder_layer(cfg.vision, lp, hh), None

    hidden, _ = jax.lax.scan(body, hidden, venc["layers"])
    cls = layer_norm(hidden[:, 0], venc["post_layernorm"]["w"],
                     venc["post_layernorm"]["b"], cfg.vision.layer_norm_eps)
    pooled = dense(cls, venc["visual_projection"])  # [B*F, pd]
    pooled = pooled + params["fusion"]["temporal_pos_emb"].astype(
        pooled.dtype)[jnp.tile(jnp.arange(f), b)]
    feats = pooled.reshape(b, f, -1)
    return torch_mha_apply(
        params["fusion"]["temporal_attn"], cfg.fusion.attention_heads,
        feats, feats, feats, add_zero_attn=True,
        dropout_rate=cfg.fusion.align_dropout, dropout_rng=dropout_rng)


def encode_audio(params: dict, cfg: ModelConfig,
                 audios: jnp.ndarray,
                 dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """[B, 80, 3000] -> [B, 1500, d_model] (modeling.py:1081-1083).

    dropout_rng enables Whisper LayerDrop when cfg.audio.encoder_layerdrop
    > 0 (training only; reference modeling.py:766-768)."""
    return whisper.encode(params["audio_encoder"], cfg.audio, audios,
                          use_flash=cfg.tower_flash,
                          remat=(cfg.remat_policy if cfg.remat
                                 else False),
                          dropout_rng=dropout_rng)


# ---------------------------------------------------------------------------
# Fusion
# ---------------------------------------------------------------------------

def _conv_downsample(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Channel-preserving VALID Conv1d over the sequence axis
    (reference project_* modules, modeling.py:919-924). [B, L, C]->[B,L',C].
    """
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)
    return out + p["b"].astype(x.dtype)


def _align(p: dict, heads: int, feats: jnp.ndarray, memory: jnp.ndarray,
           dropout_rate: float, rng, kv_cache=None) -> jnp.ndarray:
    """Alignment cross-attention: Q = modality features, K = V = the LLM
    token-embedding matrix (modeling.py:986-1026). The memory is identical
    for every batch element, so K/V are projected once ([V, H], unbatched)
    instead of the reference's per-element projection."""
    if rng is None or dropout_rate == 0.0:
        if kv_cache is not None:
            b, sq, _ = feats.shape
            m2 = kv_cache["k"][0].shape[0]
            logits_bytes = b * heads * sq * m2 * 4
            if logits_bytes <= int(4e8):
                # inference fast path: einsum streaming the (int8) cached
                # rows straight into the dots — beats the flash kernel at
                # prefill batch sizes (measured 23.6 vs 35.9 ms for the 3
                # alignments at 7b b16, scripts/bench_align_variants.py)
                from macaw_llm_tpu.ops.attention import \
                    torch_mha_apply_shared_kv_einsum
                return torch_mha_apply_shared_kv_einsum(
                    p, heads, feats, (kv_cache["k"], kv_cache["v"]))
            # large-batch guard: fp32 logits would spike HBM; stream via
            # the online-softmax kernel instead
            kv = (_dequant_rows(kv_cache["k"], feats.dtype),
                  _dequant_rows(kv_cache["v"], feats.dtype))
            return torch_mha_apply_shared_kv_flash(p, heads, feats, memory,
                                                   add_zero_attn=True,
                                                   kv_cache=kv)
        # no cache: online-softmax flash path (never materializes the
        # [B, N, q, |V|] logits)
        return torch_mha_apply_shared_kv_flash(p, heads, feats, memory,
                                               add_zero_attn=True,
                                               kv_cache=None)
    kv = None
    if kv_cache is not None:
        kv = (_dequant_rows(kv_cache["k"], feats.dtype),
              _dequant_rows(kv_cache["v"], feats.dtype))
    return torch_mha_apply_shared_kv(
        p, heads, feats, memory, add_zero_attn=True,
        dropout_rate=dropout_rate, dropout_rng=rng, kv_cache=kv)


def precompute_align_cache(params: dict, cfg: ModelConfig,
                           quantize: bool = False) -> dict:
    """Precompute the alignment attention's batch-shared K/V projections.

    The alignment memory is the [V, H] token-embedding matrix and its K/V
    projections depend ONLY on the weights — at 7b that is 6 x
    [32009, 4096] matmuls (~6.4 TFLOP) recomputed every step for nothing.
    Inference paths compute this once per weight set and pass it to
    ``prepare_inputs(align_cache=...)``. Training with a cache freezes
    the align K/V weights (see prepare_inputs) — pass align_cache=None
    to train the full alignment attention.

    quantize: store the cached rows int8 with per-row fp32 scales (half the
    HBM of bf16 — 0.79 GB instead of 1.57 GB at 7b — at ~0.2% relative
    error on the cached rows; dequantized on use).
    """
    compute = jnp.dtype(cfg.dtype)
    memory = params["llm"]["embed_tokens"].astype(compute)
    if cfg.fusion.align_memory_rows is not None:
        memory = memory[:cfg.fusion.align_memory_rows]
    fp = params["fusion"]
    cache = {}
    for mod in ("image", "audio", "video"):
        k, v = shared_kv_project(fp[f"{mod}_align"], memory,
                                 add_zero_attn=True)
        if quantize:
            cache[mod] = {"k": _quant_rows(k), "v": _quant_rows(v)}
        else:
            cache[mod] = {"k": (k, None), "v": (v, None)}
    return cache


def _quant_rows(x: jnp.ndarray):
    """Symmetric per-row int8: [M, E] -> (int8 [M, E], fp32 scale [M, 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _dequant_rows(entry, dtype):
    q, scale = entry
    if scale is None:
        return q.astype(dtype)
    return (q.astype(jnp.float32) * scale).astype(dtype)


def pack_towers(params: dict) -> dict:
    """Inference layout for the encoder towers: pack each CLIP/Whisper
    attention layer's q/k/v projections into one [h, 3h] in-proj stream
    (see ops.attention.pack_mha — the encoder-side counterpart of
    ``pack_llama_for_decode``). Exact same math, split after the dot.
    Inference-only: training and weight import use the unpacked names."""
    from macaw_llm_tpu.ops.attention import pack_mha
    out = dict(params)
    for tower in ("image_encoder", "video_encoder", "audio_encoder"):
        t = dict(out[tower])
        layers = dict(t["layers"])
        layers["attn"] = pack_mha(layers["attn"])
        t["layers"] = layers
        out[tower] = t
    return out


def strip_align_kv(params: dict) -> dict:
    """Drop the K/V rows of the alignment in-projections (inference only,
    after ``precompute_align_cache``): the cache path reads only the Q rows,
    so the packed [3E, E] tensors can shrink to [E, E] — 402 MB of HBM back
    at 7b. The einsum (training) alignment path fails loudly on slimmed
    params, so never feed these to a dropout/grad path."""
    out = dict(params)
    fp = dict(params["fusion"])
    for mod in ("image", "audio", "video"):
        p = dict(fp[f"{mod}_align"])
        e = p["in_proj_w"].shape[1]
        p["in_proj_w"] = p["in_proj_w"][:e]
        fp[f"{mod}_align"] = p
    out["fusion"] = fp
    return out


def _boundary(llm_params: dict, token_id: int, batch: int,
              dtype) -> jnp.ndarray:
    """[B, 1, H] embedding of a boundary special token."""
    emb = llm_params["embed_tokens"][token_id].astype(dtype)
    return jnp.broadcast_to(emb[None, None, :], (batch, 1, emb.shape[0]))


def prepare_inputs(params: dict, cfg: ModelConfig, *,
                   input_ids: jnp.ndarray,
                   images: Optional[jnp.ndarray],
                   audios: Optional[jnp.ndarray],
                   videos: Optional[jnp.ndarray],
                   attention_mask: Optional[jnp.ndarray] = None,
                   labels: Optional[jnp.ndarray] = None,
                   dropout_rng: Optional[jax.Array] = None,
                   video_mode: str = "long",
                   boundary_ids: Optional[dict] = None,
                   align_cache: Optional[dict] = None) -> FusedBatch:
    """Build fused embeddings + extended mask/labels
    (reference prepare_inputs_for_generation, modeling.py:965-1048).

    boundary_ids: optional override of the special-token ids, keys
    image/audio/video -> (start_id, end_id); defaults to the 32000-32005
    vocabulary (llm_trainer.py:126-133).
    align_cache: optional precomputed alignment K/V projections from
    ``precompute_align_cache``. Valid for inference always, and for
    training ONLY when the align K/V weights and embed_tokens are frozen
    (e.g. LoRA) — the cache is a constant to autodiff.
    """
    bids = {
        "image": (IMAGE_START, IMAGE_END),
        "audio": (AUDIO_START, AUDIO_END),
        "video": (VIDEO_START, VIDEO_END),
    }
    if boundary_ids:
        bids.update(boundary_ids)

    # Device-side featurization: raw 16 kHz waveforms / uint8 HWC frames are
    # featurized on-TPU inside the jitted step — the fused-preprocessing
    # answer to the reference's per-step CPU media loop
    # (llm_trainer.py:306-381, SURVEY §1).
    if audios is not None and audios.ndim == 2:
        from macaw_llm_tpu.audio.mel import log_mel_spectrogram
        audios = log_mel_spectrogram(audios, n_mels=cfg.audio.num_mel_bins)
    if images is not None and images.ndim == 4 and images.shape[-1] == 3:
        from macaw_llm_tpu.image.preprocess import preprocess as _img_prep
        images = _img_prep(images, size=cfg.vision.image_size)
    if videos is not None and videos.ndim == 5 and videos.shape[-1] == 3:
        from macaw_llm_tpu.image.preprocess import preprocess as _img_prep
        bv, fv = videos.shape[0], videos.shape[1]
        flat = videos.reshape((bv * fv,) + videos.shape[2:])
        flat = _img_prep(flat, size=cfg.vision.image_size)
        videos = flat.reshape((bv, fv) + flat.shape[1:])
    compute = jnp.dtype(cfg.dtype)
    lp = params["llm"]
    fp = params["fusion"]
    b = input_ids.shape[0]
    heads2 = cfg.fusion.attention_heads * 2
    drop = cfg.fusion.align_dropout if dropout_rng is not None else 0.0
    rngs = (jax.random.split(dropout_rng, 5) if dropout_rng is not None
            else [None] * 5)
    # training with a cache FREEZES the align K/V projections: autodiff
    # treats the cached K/V as constants, so the in-proj K/V rows and
    # bias_k/bias_v get zero gradients and never move — which also keeps
    # the cache from going stale. Q rows / out-proj still train through
    # the query path. The Trainer documents and tests this contract
    # (test_align_cache.py::test_cache_freezes_align_kv); inference
    # always may use the cache.
    cache = align_cache
    _c = (lambda mod: cache.get(mod)) if cache is not None else (lambda mod: None)

    text_emb = lp["embed_tokens"].astype(compute)[input_ids]
    # K/V memory: the full vocab embedding matrix, shared across the batch
    # (the reference repeats it per element, modeling.py:974-975; the
    # projections are batch-invariant so we keep it unbatched)
    token_memory = lp["embed_tokens"].astype(compute)
    if cfg.fusion.align_memory_rows is not None:
        # evidence/test scale knob (config.py FusionConfig): bound the
        # [V, H] x [H, H] align projections; None = reference behavior
        token_memory = token_memory[:cfg.fusion.align_memory_rows]

    blocks = []
    prefix_len = 0

    if images is not None:
        im = encode_image(params, cfg, images.astype(compute))
        im = _conv_downsample(fp["conv"]["image"], im,
                              cfg.fusion.image_conv_stride)
        im = dense(im, fp["to_hidden"]["image"]["w"],
                   fp["to_hidden"]["image"]["b"])
        im = _align(fp["image_align"], heads2, im, token_memory, drop,
                    rngs[0], kv_cache=_c("image"))
        block = jnp.concatenate(
            [_boundary(lp, bids["image"][0], b, compute), im,
             _boundary(lp, bids["image"][1], b, compute)], axis=1)
        blocks.append(block)
        prefix_len += block.shape[1]

    if audios is not None:
        au = encode_audio(params, cfg, audios.astype(compute),
                          dropout_rng=rngs[4])
        au = _conv_downsample(fp["conv"]["audio"], au,
                              cfg.fusion.audio_conv_stride)
        au = dense(au, fp["to_hidden"]["audio"]["w"],
                   fp["to_hidden"]["audio"]["b"])
        au = _align(fp["audio_align"], heads2, au, token_memory, drop,
                    rngs[1], kv_cache=_c("audio"))
        block = jnp.concatenate(
            [_boundary(lp, bids["audio"][0], b, compute), au,
             _boundary(lp, bids["audio"][1], b, compute)], axis=1)
        blocks.append(block)
        prefix_len += block.shape[1]

    if videos is not None:
        if video_mode == "long":
            vi = encode_video_long(params, cfg, videos.astype(compute),
                                   rngs[2])
        else:
            vi = encode_video_simple(params, cfg, videos.astype(compute),
                                     rngs[2])
        vi = _conv_downsample(fp["conv"]["video"], vi,
                              cfg.fusion.video_conv_stride)
        vi = dense(vi, fp["to_hidden"]["video"]["w"],
                   fp["to_hidden"]["video"]["b"])
        vi = _align(fp["video_align"], heads2, vi, token_memory, drop,
                    rngs[3], kv_cache=_c("video"))
        block = jnp.concatenate(
            [_boundary(lp, bids["video"][0], b, compute), vi,
             _boundary(lp, bids["video"][1], b, compute)], axis=1)
        blocks.append(block)
        prefix_len += block.shape[1]

    # final layout: [BOS][image][audio][video][text] — equivalent to the
    # reference's three insert-at-position-1 splices in video/audio/image
    # code order (modeling.py:978-1034)
    fused = jnp.concatenate([text_emb[:, :1]] + blocks + [text_emb[:, 1:]],
                            axis=1)

    out_mask = None
    if attention_mask is not None:
        out_mask = jnp.concatenate(
            [jnp.ones((b, prefix_len), attention_mask.dtype),
             attention_mask], axis=1)
    out_labels = None
    if labels is not None:
        out_labels = jnp.concatenate(
            [jnp.full((b, prefix_len), IGNORE_ID, labels.dtype), labels],
            axis=1)
    return FusedBatch(fused, out_mask, out_labels)


def forward(params: dict, cfg: ModelConfig, *,
            input_ids: jnp.ndarray,
            images: Optional[jnp.ndarray],
            audios: Optional[jnp.ndarray],
            videos: Optional[jnp.ndarray],
            attention_mask: Optional[jnp.ndarray] = None,
            labels: Optional[jnp.ndarray] = None,
            dropout_rng: Optional[jax.Array] = None,
            video_mode: str = "long",
            boundary_ids: Optional[dict] = None,
            lora_scale: float = 1.0,
            ring_mesh=None,
            align_cache: Optional[dict] = None):
    """Training forward (reference MM_LLMs.forward, modeling.py:941-963):
    fuse, run the LLM over inputs_embeds, return (loss, logits)."""
    batch = prepare_inputs(params, cfg, input_ids=input_ids, images=images,
                           audios=audios, videos=videos,
                           attention_mask=attention_mask, labels=labels,
                           dropout_rng=dropout_rng, video_mode=video_mode,
                           boundary_ids=boundary_ids,
                           align_cache=align_cache)

    if ring_mesh is not None and cfg.ring_attention:
        # sequence-sharded long-context step (SURVEY §5.7). Padding bias is
        # unsupported inside the ring — long-context training packs
        # sequences, so the mask must be all ones.
        return _forward_ring(params, cfg, batch, lora_scale, ring_mesh)

    if cfg.loss_chunk > 0 and batch.labels is not None:
        # training-memory path: hidden states -> chunked CE, no [B, S, V]
        # logits tensor (returns logits=None; eval keeps the full head)
        h, _ = llama.forward_hidden(
            params["llm"], cfg.llm, batch.inputs_embeds,
            attention_mask=batch.attention_mask, remat=(cfg.remat_policy if cfg.remat else False),
            use_flash=cfg.use_flash, lora_scale=lora_scale,
            shard_sequence=cfg.shard_sequence)
        loss = llama.clm_loss_chunked(params["llm"], h, batch.labels,
                                      chunk=cfg.loss_chunk,
                                      valid=llama.valid_vocab(cfg.llm))
        return loss, None

    logits, _ = llama.forward(
        params["llm"], cfg.llm, inputs_embeds=batch.inputs_embeds,
        attention_mask=batch.attention_mask, remat=(cfg.remat_policy if cfg.remat else False),
        use_flash=cfg.use_flash, lora_scale=lora_scale,
        shard_sequence=cfg.shard_sequence,
        dtype=batch.inputs_embeds.dtype)
    loss = None
    if batch.labels is not None:
        loss = llama.clm_loss(logits, batch.labels)
    return loss, logits


def _forward_ring(params: dict, cfg: ModelConfig, batch: FusedBatch,
                  lora_scale: float, ring_mesh):
    """Ring-attention LLM step over the fused sequence.

    zig-zag layout: the fused sequence is permuted so every ring device
    owns one early and one late block (balanced causal work). RoPE
    positions carry the ORIGINAL indices and the loss uses pre-shifted,
    equally-permuted next-token targets (``clm_loss_aligned``) — a
    shift-by-one over the permuted axis would be wrong. Returned logits
    are in permuted order (loss is the training quantity; use
    ``zigzag_indices``/``inverse_permutation`` to unpermute).
    """
    from macaw_llm_tpu.parallel.ring_attention import zigzag_indices

    embeds = batch.inputs_embeds
    b, s, _ = embeds.shape
    n_dev = ring_mesh.shape[cfg.ring_axis]
    positions = None
    perm = None
    if cfg.ring_layout == "zigzag":
        perm = zigzag_indices(s, n_dev)
        embeds = embeds[:, perm]
        positions = jnp.broadcast_to(perm[None].astype(jnp.int32), (b, s))
    targets = None
    if batch.labels is not None:
        ext = batch.labels
        targets = jnp.concatenate(
            [ext[:, 1:], jnp.full((b, 1), IGNORE_ID, ext.dtype)], axis=1)
        if perm is not None:
            targets = targets[:, perm]

    if cfg.loss_chunk > 0 and targets is not None:
        # long-context memory path: chunked CE on the aligned permuted
        # targets, no [B, S, V] logits (at 8k+ context the full fp32
        # logits alone are multiple GB)
        h, _ = llama.forward_hidden(
            params["llm"], cfg.llm, embeds, positions=positions,
            remat=(cfg.remat_policy if cfg.remat else False),
            lora_scale=lora_scale, ring_mesh=ring_mesh,
            ring_axis=cfg.ring_axis, ring_layout=cfg.ring_layout)
        loss = llama.clm_loss_chunked(params["llm"], h, targets,
                                      chunk=cfg.loss_chunk,
                                      targets_aligned=True,
                                      valid=llama.valid_vocab(cfg.llm))
        return loss, None

    logits, _ = llama.forward(
        params["llm"], cfg.llm, inputs_embeds=embeds,
        positions=positions, lora_scale=lora_scale,
        remat=(cfg.remat_policy if cfg.remat else False),
        ring_mesh=ring_mesh, ring_axis=cfg.ring_axis,
        ring_layout=cfg.ring_layout, dtype=embeds.dtype)
    loss = None
    if targets is not None:
        loss = llama.clm_loss_aligned(logits, targets)
    return loss, logits
