"""HF export round-trip: our pytree -> torch state_dict -> HF model ->
same logits; fusion modules -> reference names -> re-import parity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from macaw_llm_tpu.config import LlamaConfig, tiny_model_config
from macaw_llm_tpu.models import fusion, llama
from macaw_llm_tpu.utils.hf_export import (export_fusion_modules,
                                           export_llama)
from macaw_llm_tpu.utils.hf_import import (_torch_mha_params, import_llama)

CFG = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4)


def test_llama_export_roundtrip_via_hf():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    sd = export_llama(params, CFG)
    hf_cfg = HFLlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers, num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_heads, attention_bias=False,
        tie_word_embeddings=False, pad_token_id=0,
        attn_implementation="eager")
    model = LlamaForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    assert not [m for m in missing if "rotary" not in m], missing
    assert not unexpected, unexpected
    model.eval()

    ids = np.random.RandomState(0).randint(3, CFG.vocab_size, (2, 7))
    ours, _ = llama.forward(params, CFG, input_ids=jnp.asarray(ids))
    with torch.no_grad():
        theirs = model(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-3,
                               atol=2e-4)


def test_llama_export_import_identity():
    params = llama.init_params(jax.random.PRNGKey(1), CFG)
    sd = export_llama(params, CFG)
    back = import_llama(sd, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_fusion_modules_export_reimport():
    cfg = tiny_model_config()
    params = fusion.init_params(jax.random.PRNGKey(2), cfg)
    sd = export_fusion_modules(params, cfg)
    assert "video_align_attention.in_proj_weight" in sd
    assert sd["project_audio.weight"].shape == (32, 32, 240)
    back = _torch_mha_params(sd, "video_align_attention.")
    np.testing.assert_allclose(
        np.asarray(back["in_proj_w"]),
        np.asarray(params["fusion"]["video_align"]["in_proj_w"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back["bias_k"]),
        np.asarray(params["fusion"]["video_align"]["bias_k"]), rtol=1e-6)
