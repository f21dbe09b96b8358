from macaw_llm_tpu.ops.linear import dense
from macaw_llm_tpu.ops.norms import rms_norm, layer_norm
from macaw_llm_tpu.ops.rope import rope_cos_sin, apply_rope
from macaw_llm_tpu.ops.masks import causal_mask, padding_mask, combine_masks
from macaw_llm_tpu.ops.activations import silu, gelu, quick_gelu, get_activation
from macaw_llm_tpu.ops.attention import (
    dot_product_attention,
    mha_init,
    mha_apply,
    torch_mha_init,
    torch_mha_apply,
    torch_mha_apply_shared_kv,
    torch_mha_apply_shared_kv_flash,
)

__all__ = [
    "dense",
    "rms_norm", "layer_norm",
    "rope_cos_sin", "apply_rope",
    "causal_mask", "padding_mask", "combine_masks",
    "silu", "gelu", "quick_gelu", "get_activation",
    "dot_product_attention",
    "mha_init", "mha_apply",
    "torch_mha_init", "torch_mha_apply",
    "torch_mha_apply_shared_kv", "torch_mha_apply_shared_kv_flash",
]
