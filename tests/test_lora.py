"""LoRA adapter tests: zero-delta at init, training moves only adapters,
merge_lora equivalence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macaw_llm_tpu.config import (Config, IGNORE_ID, MeshConfig, TrainConfig,
                                  tiny_model_config)
from macaw_llm_tpu.models import fusion, llama
from macaw_llm_tpu.train.lora import init_lora, merge_lora
from macaw_llm_tpu.train.state import merge_params, split_params

pytestmark = [
    pytest.mark.medium,  # multi-step LoRA/QLoRA train compiles: minutes
    pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 simulated devices"),
]

RANK, ALPHA = 4, 16.0


def _params_with_lora():
    cfg = tiny_model_config()
    params = fusion.init_params(jax.random.PRNGKey(0), cfg)
    params["llm"]["layers"]["lora"] = init_lora(
        jax.random.PRNGKey(1), cfg.llm, RANK)
    return cfg, params


class TestLoraMath:
    def test_zero_delta_at_init(self):
        """B zeros => adapted forward == base forward."""
        cfg, params = _params_with_lora()
        ids = jnp.asarray(np.random.RandomState(0).randint(
            16, 32000, (1, 8)))
        base_params = dict(params["llm"])
        base_layers = dict(base_params["layers"])
        base_layers.pop("lora")
        base_params["layers"] = base_layers
        a, _ = llama.forward(base_params, cfg.llm, input_ids=ids)
        b, _ = llama.forward(params["llm"], cfg.llm, input_ids=ids,
                             lora_scale=ALPHA / RANK)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_merge_lora_equivalence(self):
        cfg, params = _params_with_lora()
        # perturb B so the delta is nonzero
        lora = params["llm"]["layers"]["lora"]
        lora = dict(lora, qb=lora["qb"] + 0.01, vb=lora["vb"] - 0.02)
        params["llm"]["layers"]["lora"] = lora
        ids = jnp.asarray(np.random.RandomState(1).randint(
            16, 32000, (1, 8)))
        adapted, _ = llama.forward(params["llm"], cfg.llm, input_ids=ids,
                                   lora_scale=ALPHA / RANK)
        merged = merge_lora(params["llm"], RANK, ALPHA)
        assert "lora" not in merged["layers"]
        merged_out, _ = llama.forward(merged, cfg.llm, input_ids=ids)
        np.testing.assert_allclose(np.asarray(adapted),
                                   np.asarray(merged_out), rtol=1e-4,
                                   atol=1e-5)

    def test_split_merge_roundtrip(self):
        cfg, params = _params_with_lora()
        t, f = split_params(params, freeze_encoders=True, lora=True)
        assert set(t["llm"]["layers"].keys()) == {"lora"}
        assert "attn" in f["llm"]["layers"]
        back = merge_params(t, f)
        assert "lora" in back["llm"]["layers"]
        assert "attn" in back["llm"]["layers"]
        for leaf_a, leaf_b in zip(jax.tree.leaves(back),
                                  jax.tree.leaves(merge_params(
                                      *split_params(params, True, True)))):
            assert leaf_a.shape == leaf_b.shape


class TestLoraTraining:
    def test_only_adapters_and_fusion_move(self):
        from macaw_llm_tpu.parallel.mesh import create_mesh
        from macaw_llm_tpu.train.trainer import Trainer
        cfg, params = _params_with_lora()
        config = Config(model=cfg, mesh=MeshConfig(data=2, fsdp=4, tensor=1),
                        train=TrainConfig(per_device_batch_size=1,
                                          grad_accum_steps=1,
                                          lora_rank=RANK, lora_alpha=ALPHA))
        mesh = create_mesh(config.mesh)
        trainer = Trainer(config, mesh, total_steps=10)
        state = trainer.init_state(params)
        assert set(state.trainable["llm"]["layers"].keys()) == {"lora"}

        rng = np.random.RandomState(0)
        ids = rng.randint(16, 32000, (1, 8, 16))
        ids[..., 0] = 1
        labels = ids.copy()
        labels[..., :4] = IGNORE_ID
        vis = cfg.vision
        batch = {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((1, 8, 16), jnp.int32),
            "labels": jnp.asarray(labels),
            "images": jnp.zeros((1, 8, 3, vis.image_size, vis.image_size)),
            "audios": jnp.zeros((1, 8, 80, 3000)),
            "videos": jnp.zeros((1, 8, cfg.fusion.n_frames, 3,
                                 vis.image_size, vis.image_size)),
        }
        before_base = np.asarray(jax.device_get(
            state.frozen["llm"]["layers"]["attn"]["wq"]))
        before_qb = np.asarray(jax.device_get(
            state.trainable["llm"]["layers"]["lora"]["qb"]))
        # two steps: the warmup schedule gives lr(0) == 0
        state1, m = trainer.train_step(state, batch)
        state1, m = trainer.train_step(state1, batch)
        assert np.isfinite(float(m["loss"]))
        after_base = np.asarray(jax.device_get(
            state1.frozen["llm"]["layers"]["attn"]["wq"]))
        after_qb = np.asarray(jax.device_get(
            state1.trainable["llm"]["layers"]["lora"]["qb"]))
        np.testing.assert_array_equal(before_base, after_base)
        assert np.abs(after_qb - before_qb).max() > 0


class TestLoraAlignCache:
    def test_cached_align_matches_per_step_projection(self):
        """LoRA training with the precomputed align K/V cache (bf16 =
        bit-exact) computes the same loss as the per-step projection."""
        import dataclasses
        import jax
        import numpy as np
        from macaw_llm_tpu.config import (Config, MeshConfig, TrainConfig,
                                          tiny_model_config)
        from macaw_llm_tpu.models import fusion
        from macaw_llm_tpu.parallel.mesh import create_mesh
        from macaw_llm_tpu.train.trainer import Trainer
        from tests.test_train_distributed import make_batch

        def run(align_cache_mode):
            cfg = Config(model=tiny_model_config(),
                         mesh=MeshConfig(data=1, fsdp=8, tensor=1),
                         train=TrainConfig(per_device_batch_size=1,
                                           grad_accum_steps=1,
                                           lora_rank=4,
                                           align_cache=align_cache_mode))
            mesh = create_mesh(cfg.mesh)
            trainer = Trainer(cfg, mesh, total_steps=10)
            params = fusion.init_params(jax.random.PRNGKey(21), cfg.model)
            from macaw_llm_tpu.train.lora import init_lora
            params["llm"]["layers"]["lora"] = init_lora(
                jax.random.PRNGKey(22), cfg.model.llm, 4)
            state = trainer.init_state(params)
            if align_cache_mode == "off":
                assert trainer._align_cache is None
            else:
                assert trainer._align_cache is not None
            batch = make_batch(cfg, accum=1, batch=8)
            _, m = trainer.train_step(state, batch)
            return float(m["loss"])

        l_off = run("off")
        l_bf16 = run("bf16")
        l_int8 = run("int8")
        np.testing.assert_allclose(l_bf16, l_off, rtol=1e-5)
        np.testing.assert_allclose(l_int8, l_off, rtol=2e-2)


class TestQuantizedBase:
    def test_qlora_trains_and_base_stays_int8(self):
        """quantize_base=True (QLoRA; reference scaffolds load_in_8bit at
        run_clm_llms.py:489): frozen LLM matmul weights become int8
        records, training still descends, adapters stay fp32."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from macaw_llm_tpu.config import (Config, MeshConfig, TrainConfig,
                                          tiny_model_config)
        from macaw_llm_tpu.models import fusion
        from macaw_llm_tpu.parallel.mesh import create_mesh
        from macaw_llm_tpu.train.lora import init_lora
        from macaw_llm_tpu.train.trainer import Trainer
        from tests.test_train_distributed import make_batch

        cfg = Config(model=tiny_model_config(),
                     mesh=MeshConfig(data=1, fsdp=8, tensor=1),
                     train=TrainConfig(per_device_batch_size=1,
                                       grad_accum_steps=1, lora_rank=4,
                                       quantize_base=True))
        mesh = create_mesh(cfg.mesh)
        trainer = Trainer(cfg, mesh, total_steps=10)
        params = fusion.init_params(jax.random.PRNGKey(31), cfg.model)
        params["llm"]["layers"]["lora"] = init_lora(
            jax.random.PRNGKey(32), cfg.model.llm, 4)
        state = trainer.init_state(params)
        wq = state.frozen["llm"]["layers"]["attn"]["wq"]
        assert isinstance(wq, dict) and wq["q"].dtype == jnp.int8
        batch = make_batch(cfg, accum=1, batch=8)
        losses = []
        for _ in range(3):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]
