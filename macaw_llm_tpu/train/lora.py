"""LoRA adapters for the LLaMA decoder.

The reference scaffolds peft LoRA (r=8, alpha=16, targets q_proj/v_proj)
but ships it commented out (run_clm_llms.py:498-508). Here it works: low-
rank A/B factors on the q and v projections, stacked per layer so they ride
the same lax.scan as the base weights. B is zero-initialized (delta starts
at 0, peft semantics); effective update is (x @ A) @ B * (alpha / r).

Usage: params["llm"]["layers"]["lora"] = init_lora(...); the decoder picks
it up automatically. merge_lora() folds adapters into the base weights for
export/serving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from macaw_llm_tpu.config import LlamaConfig


def init_lora(rng: jax.Array, cfg: LlamaConfig, rank: int,
              param_dtype=jnp.float32) -> dict:
    h = cfg.hidden_size
    nkv = cfg.kv_heads * cfg.head_dim
    L = cfg.num_layers
    k1, k2 = jax.random.split(rng)
    # peft: A kaiming-uniform (~ lecun), B zeros
    init_a = jax.nn.initializers.he_uniform()

    def stacked_a(key, dout):
        keys = jax.random.split(key, L)
        return jnp.stack([init_a(k, (h, rank), param_dtype) for k in keys])

    return {
        "qa": stacked_a(k1, h),
        "qb": jnp.zeros((L, rank, h), param_dtype),
        "va": stacked_a(k2, nkv),
        "vb": jnp.zeros((L, rank, nkv), param_dtype),
    }


def lora_delta(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
               scale: float) -> jnp.ndarray:
    """(x @ A) @ B * scale without materializing the merged weight."""
    c = x.dtype
    return ((x @ a.astype(c)) @ b.astype(c)) * jnp.asarray(scale, c)


def merge_lora(llm_params: dict, rank: int, alpha: float) -> dict:
    """Fold adapters into wq/wv for export (peft merge_and_unload)."""
    if "lora" not in llm_params.get("layers", {}):
        return llm_params
    layers = dict(llm_params["layers"])
    lora = layers.pop("lora")
    scale = alpha / rank
    attn = dict(layers["attn"])
    attn["wq"] = attn["wq"] + jnp.einsum("lhr,lrk->lhk", lora["qa"],
                                         lora["qb"]) * scale
    attn["wv"] = attn["wv"] + jnp.einsum("lhr,lrk->lhk", lora["va"],
                                         lora["vb"]) * scale
    layers["attn"] = attn
    out = dict(llm_params)
    out["layers"] = layers
    return out
