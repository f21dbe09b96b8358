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


class TestSafetensorsIO:
    def test_roundtrip(self, tmp_path):
        from macaw_llm_tpu.utils.safetensors_io import (load_safetensors,
                                                        save_safetensors)
        rng = np.random.RandomState(0)
        tensors = {
            "a.weight": rng.randn(4, 8).astype(np.float32),
            "b.bias": rng.randn(16).astype(np.float16),
            "c.ids": np.arange(6, dtype=np.int64).reshape(2, 3),
        }
        p = str(tmp_path / "t.safetensors")
        save_safetensors(tensors, p)
        back = load_safetensors(p)
        assert set(back) == set(tensors)
        for k in tensors:
            np.testing.assert_array_equal(back[k], tensors[k])

    def test_matches_reference_library_format(self, tmp_path):
        """Files we write load with the official safetensors library and
        vice versa (incl. a bf16 tensor through torch)."""
        try:
            from safetensors.torch import load_file, save_file
        except ImportError:
            import pytest
            pytest.skip("safetensors not installed")
        from macaw_llm_tpu.utils.safetensors_io import (load_safetensors,
                                                        save_safetensors)
        rng = np.random.RandomState(1)
        ours = {"x": rng.randn(3, 5).astype(np.float32)}
        p1 = str(tmp_path / "ours.safetensors")
        save_safetensors(ours, p1)
        theirs = load_file(p1)
        np.testing.assert_allclose(theirs["x"].numpy(), ours["x"])

        p2 = str(tmp_path / "theirs.safetensors")
        save_file({"y": torch.randn(2, 2, dtype=torch.bfloat16)}, p2)
        back = load_safetensors(p2)
        assert back["y"].dtype == np.float32  # bf16 upconverted

    def test_llama_import_from_safetensors(self, tmp_path):
        """export -> safetensors file -> import_llama (numpy path, no
        torch) gives identical params."""
        from macaw_llm_tpu.utils.safetensors_io import (load_safetensors,
                                                        save_safetensors)
        params = llama.init_params(jax.random.PRNGKey(3), CFG)
        sd = export_llama(params, CFG)
        p = str(tmp_path / "model.safetensors")
        save_safetensors(sd, p)
        back = import_llama(load_safetensors(p), CFG)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)


class TestShardedCheckpoint:
    def test_sharded_index_load_matches_single_file(self, tmp_path):
        """model.safetensors.index.json handling (VERDICT r2 #5): a 7B HF
        checkpoint ships as 2+ shards; loading through the index must
        reproduce the single-file state dict exactly, and import_llama on
        it must give identical logits."""
        import json as _json

        from macaw_llm_tpu.utils.hf_export import export_llama
        from macaw_llm_tpu.utils.safetensors_io import (
            load_checkpoint_dir, save_safetensors)

        params = llama.init_params(jax.random.PRNGKey(3), CFG)
        sd = export_llama(params, CFG)
        sd = {k: np.asarray(v) for k, v in sd.items()}

        # single-file layout
        single = tmp_path / "single"
        single.mkdir()
        save_safetensors(sd, str(single / "model.safetensors"))

        # 2-shard layout + index
        sharded = tmp_path / "sharded"
        sharded.mkdir()
        names = sorted(sd)
        half = len(names) // 2
        shards = {"model-00001-of-00002.safetensors": names[:half],
                  "model-00002-of-00002.safetensors": names[half:]}
        weight_map = {}
        for fname, keys in shards.items():
            save_safetensors({k: sd[k] for k in keys},
                             str(sharded / fname))
            weight_map.update({k: fname for k in keys})
        with open(sharded / "model.safetensors.index.json", "w") as f:
            _json.dump({"metadata": {"total_size": 0},
                        "weight_map": weight_map}, f)
        # decoy file the index must NOT be confused by
        save_safetensors({"not_a_weight": np.zeros((2,), np.float32)},
                         str(sharded / "training_args.safetensors"))

        sd_single = load_checkpoint_dir(str(single))
        sd_sharded = load_checkpoint_dir(str(sharded))
        assert set(sd_sharded) >= set(sd_single)
        for k in sd_single:
            np.testing.assert_array_equal(sd_sharded[k], sd_single[k])

        p1 = import_llama(sd_single, CFG)
        p2 = import_llama(sd_sharded, CFG)
        ids = np.random.RandomState(0).randint(
            3, CFG.vocab_size - 1, (2, 9)).astype(np.int32)
        l1, _ = llama.forward(p1, CFG, input_ids=jnp.asarray(ids))
        l2, _ = llama.forward(p2, CFG, input_ids=jnp.asarray(ids))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
