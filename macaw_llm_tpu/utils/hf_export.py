"""Export param pytrees back to HF/torch state_dict layout.

The inverse of hf_import: lets a user of the reference take a model
fine-tuned here and load it with HF ``from_pretrained`` (or the reference's
own MM_LLMs), completing the checkpoint interop story. Values are returned
as numpy arrays keyed exactly like the corresponding torch state_dicts; use
``save_torch`` to write a ``pytorch_model.bin`` when torch is available.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax

from macaw_llm_tpu.config import LlamaConfig, ModelConfig


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), np.float32)


def export_llama(params: dict, cfg: LlamaConfig,
                 prefix: str = "") -> Dict[str, np.ndarray]:
    """Stacked-layer pytree -> HF LlamaForCausalLM state_dict keys."""
    sd: Dict[str, np.ndarray] = {}
    sd[prefix + "model.embed_tokens.weight"] = _np(params["embed_tokens"])
    layers = params["layers"]
    for i in range(cfg.num_layers):
        base = f"{prefix}model.layers.{i}."
        attn, mlp = layers["attn"], layers["mlp"]
        sd[base + "self_attn.q_proj.weight"] = _np(attn["wq"][i]).T
        sd[base + "self_attn.k_proj.weight"] = _np(attn["wk"][i]).T
        sd[base + "self_attn.v_proj.weight"] = _np(attn["wv"][i]).T
        sd[base + "self_attn.o_proj.weight"] = _np(attn["wo"][i]).T
        sd[base + "mlp.gate_proj.weight"] = _np(mlp["gate"][i]).T
        sd[base + "mlp.up_proj.weight"] = _np(mlp["up"][i]).T
        sd[base + "mlp.down_proj.weight"] = _np(mlp["down"][i]).T
        sd[base + "input_layernorm.weight"] = _np(layers["input_norm"][i])
        sd[base + "post_attention_layernorm.weight"] = \
            _np(layers["post_norm"][i])
    sd[prefix + "model.norm.weight"] = _np(params["norm"])
    sd[prefix + "lm_head.weight"] = _np(params["lm_head"]).T
    return sd


def export_fusion_modules(params: dict, cfg: ModelConfig
                          ) -> Dict[str, np.ndarray]:
    """Fusion subtree -> the reference MM_LLMs module names
    (modeling.py:864-939)."""
    fp = params["fusion"]
    sd: Dict[str, np.ndarray] = {}

    def mha(name: str, p: dict):
        sd[f"{name}.in_proj_weight"] = _np(p["in_proj_w"])
        sd[f"{name}.in_proj_bias"] = _np(p["in_proj_b"])
        sd[f"{name}.out_proj.weight"] = _np(p["out_proj_w"])
        sd[f"{name}.out_proj.bias"] = _np(p["out_proj_b"])
        if "bias_k" in p:
            sd[f"{name}.bias_k"] = _np(p["bias_k"])[None, None, :]
            sd[f"{name}.bias_v"] = _np(p["bias_v"])[None, None, :]

    mha("image_align_attention", fp["image_align"])
    mha("audio_align_attention", fp["audio_align"])
    mha("video_align_attention", fp["video_align"])
    mha("video_long_self_attention", fp["video_long_attn"])
    mha("temporal_self_attention", fp["temporal_attn"])
    sd["temporal_position_embeddings.weight"] = _np(fp["temporal_pos_emb"])
    for mod in ("video", "audio", "image"):
        sd[f"transform_{mod}_to_hidden.weight"] = \
            _np(fp["to_hidden"][mod]["w"]).T
        sd[f"transform_{mod}_to_hidden.bias"] = _np(fp["to_hidden"][mod]["b"])
    for mod in ("image", "video", "audio"):
        # ours [k, C, C] -> torch [C_out, C_in, k]
        sd[f"project_{mod}.weight"] = \
            _np(fp["conv"][mod]["w"]).transpose(2, 1, 0)
        sd[f"project_{mod}.bias"] = _np(fp["conv"][mod]["b"])
    return sd


def save_torch(sd: Dict[str, np.ndarray], path: str):
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
