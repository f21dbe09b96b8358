"""HuggingFace checkpoint import: torch state_dicts -> our param pytrees.

The reference loads pretrained LLaMA / CLIP / Whisper weights via HF
``from_pretrained`` (run_clm_llms.py:480-483 — note the reference actually
discards the result, quirk #2 in SURVEY §7; here loading works for real).

Accepts either a live torch ``state_dict`` (tensor values) or a dict of
numpy arrays (e.g. loaded from safetensors without torch).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from macaw_llm_tpu.config import (ClipVisionConfig, LlamaConfig,
                                  WhisperConfig)


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def import_llama(sd: Mapping[str, "object"], cfg: LlamaConfig,
                 param_dtype=jnp.float32, prefix: str = "") -> dict:
    """HF LlamaForCausalLM state_dict -> stacked-layer pytree.

    HF Linear stores weight as [out, in]; our convention is x @ W with
    W [in, out], so every projection is transposed.
    """
    g = lambda k: _np(sd[prefix + k])  # noqa: E731
    L = cfg.num_layers

    def stack(fmt: str, transpose: bool = True):
        ws = [g(fmt.format(i)) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws), param_dtype)

    params = {
        "embed_tokens": jnp.asarray(g("model.embed_tokens.weight"),
                                    param_dtype),
        "layers": {
            "attn": {
                "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
                "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
                "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
                "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            },
            "mlp": {
                "gate": stack("model.layers.{}.mlp.gate_proj.weight"),
                "up": stack("model.layers.{}.mlp.up_proj.weight"),
                "down": stack("model.layers.{}.mlp.down_proj.weight"),
            },
            "input_norm": stack("model.layers.{}.input_layernorm.weight",
                                transpose=False),
            "post_norm": stack(
                "model.layers.{}.post_attention_layernorm.weight",
                transpose=False),
        },
        "norm": jnp.asarray(g("model.norm.weight"), param_dtype),
        "lm_head": jnp.asarray(g("lm_head.weight").T, param_dtype),
    }
    return params


def resize_token_embeddings(params: dict, new_vocab: int,
                            rng=None, init_range: float = 0.02) -> dict:
    """Vocab expansion equivalent of resize_token_embeddings
    (reference run_clm_llms.py:495, 32000 -> 32007).

    New rows are initialized to the mean of existing embeddings (HF
    behavior is normal init; mean-init is the common improvement — both
    documented; mean used here for stable new special tokens).
    """
    emb = params["embed_tokens"]
    head = params["lm_head"]
    old_vocab = emb.shape[0]
    if new_vocab == old_vocab:
        return params
    assert new_vocab > old_vocab
    n_new = new_vocab - old_vocab
    emb_new = jnp.concatenate(
        [emb, jnp.broadcast_to(emb.mean(0, keepdims=True),
                               (n_new, emb.shape[1]))], axis=0)
    head_new = jnp.concatenate(
        [head, jnp.broadcast_to(head.mean(1, keepdims=True),
                                (head.shape[0], n_new))], axis=1)
    out = dict(params)
    out["embed_tokens"] = emb_new
    out["lm_head"] = head_new
    return out


def pad_vocab(params: dict, pad_to: int) -> dict:
    """Pad embed_tokens rows / lm_head cols with ZEROS up to ``pad_to``
    (cfg.vocab_pad_to — TP-shardable storage vocab). Unlike
    resize_token_embeddings, padded entries are never real tokens: ids
    stay < vocab_size and the padded logits are masked to -inf
    (llama.logits_from_hidden), so zero init is exact and the rows stay
    frozen (masked logits carry zero gradient)."""
    emb = params["embed_tokens"]
    head = params["lm_head"]
    old = emb.shape[0]
    if pad_to == old:
        return params
    assert pad_to > old, (pad_to, old)
    out = dict(params)
    out["embed_tokens"] = jnp.concatenate(
        [emb, jnp.zeros((pad_to - old, emb.shape[1]), emb.dtype)], axis=0)
    out["lm_head"] = jnp.concatenate(
        [head, jnp.zeros((head.shape[0], pad_to - head.shape[1]),
                         head.dtype)], axis=1)
    return out


def import_clip_vision(sd: Mapping[str, "object"], cfg: ClipVisionConfig,
                       param_dtype=jnp.float32) -> dict:
    """HF CLIPModel state_dict (vision tower + visual_projection) ->
    pytree for models/clip.py."""
    g = lambda k: _np(sd[k])  # noqa: E731
    L = cfg.num_layers
    vp = "vision_model."

    def stack(fmt: str, transpose: bool = True):
        ws = [g(fmt.format(i)) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws), param_dtype)

    def stack_ln(fmt_w: str, fmt_b: str):
        return {
            "w": jnp.asarray(np.stack([g(fmt_w.format(i)) for i in range(L)]),
                             param_dtype),
            "b": jnp.asarray(np.stack([g(fmt_b.format(i)) for i in range(L)]),
                             param_dtype),
        }

    lyr = vp + "encoder.layers.{}."
    params = {
        "class_embedding": jnp.asarray(
            g(vp + "embeddings.class_embedding"), param_dtype),
        # HF Conv2d weight [out, in, kh, kw] -> HWIO for lax.conv
        "patch_embedding": jnp.asarray(
            g(vp + "embeddings.patch_embedding.weight")
            .transpose(2, 3, 1, 0), param_dtype),
        "position_embedding": jnp.asarray(
            g(vp + "embeddings.position_embedding.weight"), param_dtype),
        "pre_layernorm": {
            "w": jnp.asarray(g(vp + "pre_layrnorm.weight"), param_dtype),
            "b": jnp.asarray(g(vp + "pre_layrnorm.bias"), param_dtype),
        },
        "layers": {
            "ln1": stack_ln(lyr + "layer_norm1.weight",
                            lyr + "layer_norm1.bias"),
            "ln2": stack_ln(lyr + "layer_norm2.weight",
                            lyr + "layer_norm2.bias"),
            "attn": {
                "q": {"w": stack(lyr + "self_attn.q_proj.weight"),
                      "b": stack(lyr + "self_attn.q_proj.bias", False)},
                "k": {"w": stack(lyr + "self_attn.k_proj.weight"),
                      "b": stack(lyr + "self_attn.k_proj.bias", False)},
                "v": {"w": stack(lyr + "self_attn.v_proj.weight"),
                      "b": stack(lyr + "self_attn.v_proj.bias", False)},
                "o": {"w": stack(lyr + "self_attn.out_proj.weight"),
                      "b": stack(lyr + "self_attn.out_proj.bias", False)},
            },
            "mlp": {
                "fc1": {"w": stack(lyr + "mlp.fc1.weight"),
                        "b": stack(lyr + "mlp.fc1.bias", False)},
                "fc2": {"w": stack(lyr + "mlp.fc2.weight"),
                        "b": stack(lyr + "mlp.fc2.bias", False)},
            },
        },
        "post_layernorm": {
            "w": jnp.asarray(g(vp + "post_layernorm.weight"), param_dtype),
            "b": jnp.asarray(g(vp + "post_layernorm.bias"), param_dtype),
        },
        "visual_projection": jnp.asarray(g("visual_projection.weight").T,
                                         param_dtype),
    }
    return params


def import_whisper_encoder(sd: Mapping[str, "object"], cfg: WhisperConfig,
                           param_dtype=jnp.float32,
                           prefix: str = "") -> dict:
    """HF WhisperModel state_dict (encoder half) -> pytree for
    models/whisper.py. ``prefix`` handles 'model.' nesting differences."""
    def g(k):
        for p in (prefix, "model.", ""):
            if p + k in sd:
                return _np(sd[p + k])
        raise KeyError(k)

    L = cfg.encoder_layers
    lyr = "encoder.layers.{}."

    def stack(fmt: str, transpose: bool = True):
        ws = [g(fmt.format(i)) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws), param_dtype)

    def stack_b(fmt: str):
        return jnp.asarray(np.stack([g(fmt.format(i)) for i in range(L)]),
                           param_dtype)

    # k_proj has no bias in Whisper attention
    zeros_b = jnp.zeros((L, cfg.d_model), param_dtype)
    params = {
        # HF Conv1d weight [out, in, k] -> [k, in, out] for lax.conv NWC
        "conv1": {"w": jnp.asarray(g("encoder.conv1.weight")
                                   .transpose(2, 1, 0), param_dtype),
                  "b": jnp.asarray(g("encoder.conv1.bias"), param_dtype)},
        "conv2": {"w": jnp.asarray(g("encoder.conv2.weight")
                                   .transpose(2, 1, 0), param_dtype),
                  "b": jnp.asarray(g("encoder.conv2.bias"), param_dtype)},
        "embed_positions": jnp.asarray(g("encoder.embed_positions.weight"),
                                       param_dtype),
        "layers": {
            "self_attn_ln": {
                "w": stack_b(lyr + "self_attn_layer_norm.weight"),
                "b": stack_b(lyr + "self_attn_layer_norm.bias")},
            "attn": {
                "q": {"w": stack(lyr + "self_attn.q_proj.weight"),
                      "b": stack_b(lyr + "self_attn.q_proj.bias")},
                "k": {"w": stack(lyr + "self_attn.k_proj.weight"),
                      "b": zeros_b},
                "v": {"w": stack(lyr + "self_attn.v_proj.weight"),
                      "b": stack_b(lyr + "self_attn.v_proj.bias")},
                "o": {"w": stack(lyr + "self_attn.out_proj.weight"),
                      "b": stack_b(lyr + "self_attn.out_proj.bias")},
            },
            "final_ln": {"w": stack_b(lyr + "final_layer_norm.weight"),
                         "b": stack_b(lyr + "final_layer_norm.bias")},
            "mlp": {
                "fc1": {"w": stack(lyr + "fc1.weight"),
                        "b": stack_b(lyr + "fc1.bias")},
                "fc2": {"w": stack(lyr + "fc2.weight"),
                        "b": stack_b(lyr + "fc2.bias")},
            },
        },
        "layer_norm": {"w": jnp.asarray(g("encoder.layer_norm.weight"),
                                        param_dtype),
                       "b": jnp.asarray(g("encoder.layer_norm.bias"),
                                        param_dtype)},
    }
    return params


def _torch_mha_params(sd: Mapping[str, "object"], prefix: str,
                      param_dtype=jnp.float32) -> dict:
    """torch.nn.MultiheadAttention state_dict slice -> torch_mha pytree."""
    p = {
        "in_proj_w": jnp.asarray(_np(sd[prefix + "in_proj_weight"]),
                                 param_dtype),
        "in_proj_b": jnp.asarray(_np(sd[prefix + "in_proj_bias"]),
                                 param_dtype),
        "out_proj_w": jnp.asarray(_np(sd[prefix + "out_proj.weight"]),
                                  param_dtype),
        "out_proj_b": jnp.asarray(_np(sd[prefix + "out_proj.bias"]),
                                  param_dtype),
    }
    if prefix + "bias_k" in sd:
        p["bias_k"] = jnp.asarray(_np(sd[prefix + "bias_k"])[0, 0],
                                  param_dtype)
        p["bias_v"] = jnp.asarray(_np(sd[prefix + "bias_v"])[0, 0],
                                  param_dtype)
    return p


def _linear_params(sd: Mapping[str, "object"], prefix: str,
                   param_dtype=jnp.float32) -> dict:
    return {"w": jnp.asarray(_np(sd[prefix + "weight"]).T, param_dtype),
            "b": jnp.asarray(_np(sd[prefix + "bias"]), param_dtype)}


def _conv1d_params(sd: Mapping[str, "object"], prefix: str,
                   param_dtype=jnp.float32) -> dict:
    # torch Conv1d weight [C_out, C_in, k] -> [k, C_in, C_out] (NWC/WIO)
    return {"w": jnp.asarray(_np(sd[prefix + "weight"]).transpose(2, 1, 0),
                             param_dtype),
            "b": jnp.asarray(_np(sd[prefix + "bias"]), param_dtype)}


def sub_state_dict(sd: Mapping[str, "object"], prefix: str) -> Dict[str, object]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def import_mm_llms(sd: Mapping[str, "object"], cfg,
                   param_dtype=jnp.float32) -> dict:
    """Reference MM_LLMs state_dict -> full fusion-model pytree.

    cfg: macaw_llm_tpu.config.ModelConfig. Submodule prefixes per
    reference MM_LLMs.__init__ (modeling.py:864-939).
    """
    return {
        "image_encoder": import_clip_vision(
            sub_state_dict(sd, "image_encoder."), cfg.vision, param_dtype),
        "video_encoder": import_clip_vision(
            sub_state_dict(sd, "video_encoder."), cfg.vision, param_dtype),
        "audio_encoder": import_whisper_encoder(
            sub_state_dict(sd, "audio_encoder."), cfg.audio, param_dtype),
        "llm": import_llama(sd, cfg.llm, param_dtype, prefix="llm."),
        "fusion": {
            "image_align": _torch_mha_params(sd, "image_align_attention.",
                                             param_dtype),
            "audio_align": _torch_mha_params(sd, "audio_align_attention.",
                                             param_dtype),
            "video_align": _torch_mha_params(sd, "video_align_attention.",
                                             param_dtype),
            "video_long_attn": _torch_mha_params(
                sd, "video_long_self_attention.", param_dtype),
            "temporal_attn": _torch_mha_params(sd, "temporal_self_attention.",
                                               param_dtype),
            "temporal_pos_emb": jnp.asarray(
                _np(sd["temporal_position_embeddings.weight"]), param_dtype),
            "to_hidden": {
                "video": _linear_params(sd, "transform_video_to_hidden.",
                                        param_dtype),
                "audio": _linear_params(sd, "transform_audio_to_hidden.",
                                        param_dtype),
                "image": _linear_params(sd, "transform_image_to_hidden.",
                                        param_dtype),
            },
            "conv": {
                "image": _conv1d_params(sd, "project_image.", param_dtype),
                "video": _conv1d_params(sd, "project_video.", param_dtype),
                "audio": _conv1d_params(sd, "project_audio.", param_dtype),
            },
        },
    }
