"""Distributed training tests on the simulated 8-device CPU mesh
(SURVEY §4 plan item (c)): FSDP sharding, collectives, grad accumulation,
encoder freezing, checkpoint save/resume."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macaw_llm_tpu.config import (Config, IGNORE_ID, MeshConfig, TrainConfig,
                                  tiny_model_config)
from macaw_llm_tpu.models import fusion
from macaw_llm_tpu.parallel.mesh import create_mesh
from macaw_llm_tpu.parallel.sharding import infer_shardings, spec_for
from macaw_llm_tpu.train.state import split_params
from macaw_llm_tpu.train.trainer import Trainer, make_lr_schedule

pytestmark = [
    pytest.mark.medium,  # virtual-mesh train-step compiles: minutes
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 simulated devices"),
]


def tiny_config() -> Config:
    return Config(model=tiny_model_config(),
                  mesh=MeshConfig(data=2, fsdp=4, tensor=1),
                  train=TrainConfig(per_device_batch_size=1,
                                    grad_accum_steps=2))


def make_batch(cfg, accum=2, batch=8, seq=16):
    rng = np.random.RandomState(0)
    v = cfg.model.llm.vocab_size
    ids = rng.randint(16, 32000, (accum, batch, seq))
    ids[:, :, 0] = 1
    labels = ids.copy()
    labels[:, :, :4] = IGNORE_ID
    vis = cfg.model.vision
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((accum, batch, seq), jnp.int32),
        "labels": jnp.asarray(labels),
        "images": jnp.zeros((accum, batch, 3, vis.image_size,
                             vis.image_size)),
        "audios": jnp.zeros((accum, batch, 80, 3000)),
        "videos": jnp.zeros((accum, batch, cfg.model.fusion.n_frames, 3,
                             vis.image_size, vis.image_size)),
    }


class TestShardingRules:
    def test_llama_attn_sharded_on_fsdp(self):
        cfg = tiny_config()
        mesh = create_mesh(cfg.mesh)
        # hidden 64 divisible by fsdp 4 -> spec keeps fsdp on dim 1
        spec = spec_for("llm/layers/attn/wq", (2, 64, 64), mesh)
        assert spec == jax.sharding.PartitionSpec(None, "fsdp")

    def test_indivisible_dims_fall_back(self):
        cfg = tiny_config()
        mesh = create_mesh(cfg.mesh)
        spec = spec_for("llm/embed_tokens", (32007, 64), mesh)
        # vocab 32007 on tensor(1): dropped; hidden 64 % 4 == 0 -> fsdp kept
        assert spec == jax.sharding.PartitionSpec(None, "fsdp")

    def test_norms_replicated(self):
        cfg = tiny_config()
        mesh = create_mesh(cfg.mesh)
        assert spec_for("llm/norm", (64,), mesh) == \
            jax.sharding.PartitionSpec()


class TestTrainStep:
    """train_step donates its input state (production memory behavior), so
    each stepping test builds a fresh state from the shared params."""

    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        mesh = create_mesh(cfg.mesh)
        params = fusion.init_params(jax.random.PRNGKey(0), cfg.model)
        trainer = Trainer(cfg, mesh, total_steps=100)
        return cfg, mesh, trainer, params

    @pytest.fixture()
    def state(self, setup):
        # fresh params per state: init_state's device_put may alias the
        # input buffers, and train_step donates them
        cfg, _, trainer, _ = setup
        params = fusion.init_params(jax.random.PRNGKey(0), cfg.model)
        return trainer.init_state(params)

    def test_params_actually_sharded(self, setup, state):
        cfg, mesh, trainer, _ = setup
        wq = state.trainable["llm"]["layers"]["attn"]["wq"]
        assert len(wq.sharding.device_set) == 8
        # fsdp axis of size 4 shards dim1: per-device shard is 64/4
        shard_shape = wq.sharding.shard_shape(wq.shape)
        assert shard_shape[1] == wq.shape[1] // 4

    def test_optimizer_state_sharded_like_params(self, setup, state):
        cfg, mesh, trainer, _ = setup
        mu = state.opt_state[1][0].mu["llm"]["layers"]["attn"]["wq"]
        wq = state.trainable["llm"]["layers"]["attn"]["wq"]
        assert mu.sharding.shard_shape(mu.shape) == \
            wq.sharding.shard_shape(wq.shape)

    def test_frozen_split(self, setup, state):
        cfg, mesh, trainer, _ = setup
        assert "image_encoder" in state.frozen
        assert "audio_encoder" in state.frozen
        assert "llm" in state.trainable
        assert "fusion" in state.trainable

    def test_train_step_runs_and_descends(self, setup, state):
        cfg, mesh, trainer, _ = setup
        batch = make_batch(cfg)
        state1, m1 = trainer.train_step(state, batch)
        losses = [float(m1["loss"])]
        st = state1
        for _ in range(4):
            st, m = trainer.train_step(st, make_batch(cfg))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses  # memorizes the fixed batch
        assert int(st.step) == 5

    def test_frozen_params_unchanged(self, setup, state):
        cfg, mesh, trainer, _ = setup
        batch = make_batch(cfg)
        # snapshot before the step: the input state is donated
        before = np.asarray(jax.device_get(jax.tree.leaves(state.frozen)[0]))
        state1, _ = trainer.train_step(state, batch)
        after = np.asarray(jax.device_get(jax.tree.leaves(state1.frozen)[0]))
        np.testing.assert_array_equal(before, after)

    def test_unfrozen_encoders_train_under_remat(self):
        """VERDICT r3 #7: freeze_encoders=False + remat must train the
        towers WITH gradient checkpointing on their layers (the
        reference remat-wraps Whisper/CLIP too, modeling.py:770-783)."""
        import dataclasses
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, remat=True),
            train=dataclasses.replace(cfg.train, freeze_encoders=False))
        mesh = create_mesh(cfg.mesh)
        params = fusion.init_params(jax.random.PRNGKey(7), cfg.model)
        trainer = Trainer(cfg, mesh, total_steps=100)
        state = trainer.init_state(params)
        assert state.frozen == {}  # everything trains
        before = np.asarray(jax.device_get(
            state.trainable["image_encoder"]["layers"]["mlp"]["fc1"]["w"]))
        # non-zero media so tower grads are non-trivial
        batch = make_batch(cfg)
        rng = np.random.RandomState(3)
        vis = cfg.model.vision
        batch["images"] = jnp.asarray(
            rng.randn(2, 8, 3, vis.image_size, vis.image_size), jnp.float32)
        batch["audios"] = jnp.asarray(
            rng.randn(2, 8, 80, 3000) * 0.1, jnp.float32)
        # two steps: the warmup schedule makes step 1's LR exactly 0
        state1, m = trainer.train_step(state, batch)
        state2, m = trainer.train_step(state1, batch)
        assert np.isfinite(float(m["loss"]))
        after = np.asarray(jax.device_get(
            state2.trainable["image_encoder"]["layers"]["mlp"]["fc1"]["w"]))
        assert not np.array_equal(before, after)  # grads reached the tower

    def test_grad_accum_equals_big_batch(self):
        """accum over [2, B] microbatches == one [1, 2B] batch (same data).

        Dropout must be off: the per-microbatch RNG split otherwise makes
        the two step variants legitimately differ."""
        import dataclasses
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, fusion=dataclasses.replace(
                    cfg.model.fusion, align_dropout=0.0)))
        mesh = create_mesh(cfg.mesh)
        params = fusion.init_params(jax.random.PRNGKey(1), cfg.model)
        trainer = Trainer(cfg, mesh, total_steps=100)

        batch2 = make_batch(cfg, accum=2, batch=8)
        batch1 = jax.tree.map(
            lambda x: x.reshape((1, 16) + x.shape[2:]), batch2)

        s_a = trainer.init_state(params, rng=jax.random.PRNGKey(42))
        s_b = trainer.init_state(params, rng=jax.random.PRNGKey(42))
        sa, ma = trainer.train_step(s_a, batch2)
        sb, mb = trainer.train_step(s_b, batch1)
        # fp32 reduction order differs (scan-of-means vs one mean)
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=2e-4)
        wa = np.asarray(
            jax.device_get(sa.trainable["fusion"]["to_hidden"]["image"]["w"]))
        wb = np.asarray(
            jax.device_get(sb.trainable["fusion"]["to_hidden"]["image"]["w"]))
        np.testing.assert_allclose(wa, wb, rtol=1e-4, atol=1e-7)


class TestPackFrozenTowers:
    def test_packed_towers_same_loss_and_update(self):
        """pack_frozen_towers folds each frozen tower layer's q/k/v into
        one in-proj matmul — exact math, so the first step's loss and the
        trainable update must match the unpacked run (media non-zero so
        the towers actually contribute)."""
        import dataclasses
        cfg = tiny_config()
        cfg_p = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           pack_frozen_towers=True))
        mesh = create_mesh(cfg.mesh)
        params = fusion.init_params(jax.random.PRNGKey(3), cfg.model)
        batch = make_batch(cfg, accum=2, batch=8)
        rng = np.random.RandomState(7)
        vis = cfg.model.vision
        batch["images"] = jnp.asarray(
            rng.rand(2, 8, 3, vis.image_size, vis.image_size), jnp.float32)
        batch["audios"] = jnp.asarray(rng.randn(2, 8, 80, 3000) * 0.1,
                                      jnp.float32)

        losses, weights = [], []
        for c in (cfg, cfg_p):
            tr = Trainer(c, mesh, total_steps=100)
            st = tr.init_state(params, rng=jax.random.PRNGKey(42))
            if c.train.pack_frozen_towers:
                assert "qkv" in st.frozen["image_encoder"]["layers"]["attn"]
            st, m = tr.train_step(st, batch)
            losses.append(float(m["loss"]))
            weights.append(np.asarray(jax.device_get(
                st.trainable["fusion"]["to_hidden"]["image"]["w"])))
        np.testing.assert_allclose(losses[1], losses[0], rtol=2e-5)
        np.testing.assert_allclose(weights[1], weights[0],
                                   rtol=1e-4, atol=1e-7)


class TestLRSchedule:
    def test_warmup_cosine(self):
        tcfg = TrainConfig(learning_rate=3e-5, warmup_ratio=0.03)
        sched = make_lr_schedule(tcfg, 1000)
        assert float(sched(0)) == 0.0
        assert abs(float(sched(30)) - 3e-5) / 3e-5 < 1e-6
        assert float(sched(1000)) < 1e-9


class TestCheckpoint:
    def test_save_restore_resume(self):
        from macaw_llm_tpu.train.checkpoint import CheckpointManager
        cfg = tiny_config()
        mesh = create_mesh(cfg.mesh)
        params = fusion.init_params(jax.random.PRNGKey(2), cfg.model)
        trainer = Trainer(cfg, mesh, total_steps=10)
        state = trainer.init_state(params)
        state, _ = trainer.train_step(state, make_batch(cfg))

        with tempfile.TemporaryDirectory() as d:
            mgr = CheckpointManager(d, save_steps=1)
            assert mgr.save(state, cfg, force=True)
            mgr.wait()
            assert mgr.latest_step() == 1

            restored = mgr.restore(state)
            assert int(restored.step) == 1
            a = jax.device_get(
                state.trainable["fusion"]["to_hidden"]["image"]["w"])
            b = jax.device_get(
                restored.trainable["fusion"]["to_hidden"]["image"]["w"])
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

            # resumed training continues
            state2, m = trainer.train_step(restored, make_batch(cfg))
            assert int(state2.step) == 2
            assert np.isfinite(float(m["loss"]))
            mgr.close()

    def test_async_save_overlaps_donating_step(self):
        """VERDICT r3 #5: a save must not stall training. With
        snapshot=True the next train step may DONATE the state buffers
        while the Orbax writer is still reading — the writer reads the
        snapshot copy, so the checkpoint must equal the pre-step state,
        not the post-step one."""
        from macaw_llm_tpu.train.checkpoint import CheckpointManager
        cfg = tiny_config()
        mesh = create_mesh(cfg.mesh)
        params = fusion.init_params(jax.random.PRNGKey(2), cfg.model)
        trainer = Trainer(cfg, mesh, total_steps=10)
        state = trainer.init_state(params)
        state, _ = trainer.train_step(state, make_batch(cfg))

        # capture the values the checkpoint must contain
        expect_w = np.asarray(jax.device_get(
            state.trainable["fusion"]["to_hidden"]["image"]["w"]))
        expect_frozen = np.asarray(jax.device_get(
            jax.tree.leaves(state.frozen)[0]))

        with tempfile.TemporaryDirectory() as d:
            mgr = CheckpointManager(d, save_steps=1, snapshot=True)
            assert mgr.save(state, cfg, force=True)
            # NO wait: immediately run a donating step on the saved state
            state2, m = trainer.train_step(state, make_batch(cfg))
            assert int(state2.step) == 2
            assert np.isfinite(float(m["loss"]))
            mgr.wait()

            restored = mgr.restore(state2)  # layout template only
            assert int(restored.step) == 1
            got_w = np.asarray(jax.device_get(
                restored.trainable["fusion"]["to_hidden"]["image"]["w"]))
            np.testing.assert_array_equal(got_w, expect_w)
            got_frozen = np.asarray(jax.device_get(
                jax.tree.leaves(restored.frozen)[0]))
            np.testing.assert_array_equal(got_frozen, expect_frozen)
            # the step actually changed the trainable weight, so equality
            # above proves the writer read the snapshot, not the donated
            # (now-overwritten) buffer
            post_w = np.asarray(jax.device_get(
                state2.trainable["fusion"]["to_hidden"]["image"]["w"]))
            assert not np.array_equal(post_w, expect_w)

            # second save reuses the host-cached frozen tree
            assert mgr._frozen_id is not None
            cached = mgr._frozen_host
            assert mgr.save(state2, cfg, force=True)
            assert mgr._frozen_host is cached
            mgr.wait()
            mgr.close()


class TestSequenceSharding:
    def test_shard_sequence_same_output(self):
        """Ulysses-style seq sharding over the tensor axis is numerically
        identical to the unsharded forward."""
        import dataclasses
        from macaw_llm_tpu.models import llama as L
        cfg = tiny_config()
        mesh_cfg = MeshConfig(data=1, fsdp=4, tensor=2)
        mesh = create_mesh(mesh_cfg)
        params = fusion.init_params(jax.random.PRNGKey(3), cfg.model)["llm"]
        ids = jnp.asarray(np.random.RandomState(0).randint(16, 32000,
                                                           (2, 16)))
        with mesh:
            a, _ = jax.jit(lambda p, i: L.forward(p, cfg.model.llm,
                                                  input_ids=i))(params, ids)
            emb = L.embed(params, ids)
            h, _ = jax.jit(lambda p, e: L.forward_hidden(
                p, cfg.model.llm, e, shard_sequence=True))(params, emb)
            b = L.logits_from_hidden(params, h)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5)


class TestTensorParallel:
    def test_tp_logits_match_single_device(self):
        """TP over the tensor axis is a sharding annotation, not new code —
        logits must match the unsharded forward."""
        from macaw_llm_tpu.models import llama as L
        from macaw_llm_tpu.parallel.sharding import shard_params
        cfg = tiny_config()
        full = fusion.init_params(jax.random.PRNGKey(5), cfg.model)
        params = full["llm"]
        ids = jnp.asarray(np.random.RandomState(1).randint(16, 32000,
                                                           (2, 12)))
        ref, _ = L.forward(params, cfg.model.llm, input_ids=ids)

        mesh = create_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
        # rules are keyed on full-tree paths (llm/...), so shard the whole
        # fusion tree and use its llm subtree
        sharded = shard_params(full, mesh)["llm"]
        wq = sharded["layers"]["attn"]["wq"]
        # confirm TP actually sharded the head dim
        assert wq.sharding.shard_shape(wq.shape)[2] == wq.shape[2] // 4
        got, _ = jax.jit(lambda p, i: L.forward(p, cfg.model.llm,
                                                input_ids=i))(sharded, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=1e-5)


class TestShardedGeneration:
    def test_tp_sharded_generate_matches_single_device(self):
        """Multi-chip serving: generation with TP/FSDP-sharded params must
        produce the same tokens as single-device generation."""
        from macaw_llm_tpu.generate import generate
        from macaw_llm_tpu.parallel.sharding import shard_params
        cfg = tiny_config()
        full = fusion.init_params(jax.random.PRNGKey(7), cfg.model)
        rng = np.random.RandomState(0)
        embeds = jnp.asarray(rng.randn(2, 6, cfg.model.llm.hidden_size)
                             * 0.02, jnp.float32)
        ref = generate(full["llm"], cfg.model.llm, inputs_embeds=embeds,
                       max_new_tokens=8, eos_id=2, pad_id=0)

        mesh = create_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
        sharded = shard_params(full, mesh)["llm"]
        got = generate(sharded, cfg.model.llm, inputs_embeds=embeds,
                       max_new_tokens=8, eos_id=2, pad_id=0)
        np.testing.assert_array_equal(np.asarray(ref.tokens),
                                      np.asarray(got.tokens))


class TestRingTrainer:
    def test_ring_train_step_loss_matches_plain(self):
        """cfg.model.ring_attention=True is a pure config change: the
        Trainer passes its mesh through and the zig-zag sequence-sharded
        step computes the same loss as the plain step (VERDICT r1 #3)."""
        import dataclasses
        base = Config(model=tiny_model_config(),
                      mesh=MeshConfig(data=1, fsdp=2, tensor=4),
                      train=TrainConfig(per_device_batch_size=1,
                                        grad_accum_steps=1))
        mesh = create_mesh(base.mesh)
        # fused len (prefix 20 + text) must divide 2 x ring size (8)
        batch = make_batch(base, accum=1, batch=4, seq=12)

        params = fusion.init_params(jax.random.PRNGKey(11), base.model)
        t_plain = Trainer(base, mesh, total_steps=10)
        s_plain = t_plain.init_state(params)
        _, m_plain = t_plain.train_step(s_plain, batch)

        ring_cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model,
                                            ring_attention=True,
                                            ring_axis="tensor"))
        t_ring = Trainer(ring_cfg, mesh, total_steps=10)
        s_ring = t_ring.init_state(
            fusion.init_params(jax.random.PRNGKey(11), ring_cfg.model))
        new_state, m_ring = t_ring.train_step(s_ring, batch)
        np.testing.assert_allclose(float(m_ring["loss"]),
                                   float(m_plain["loss"]),
                                   rtol=2e-3)
        assert np.isfinite(float(m_ring["grad_norm"]))


class TestEvaluate:
    def test_evaluate_returns_loss_and_accuracy(self):
        cfg = tiny_config()
        mesh = create_mesh(cfg.mesh)
        trainer = Trainer(cfg, mesh, total_steps=10)
        state = trainer.init_state(
            fusion.init_params(jax.random.PRNGKey(13), cfg.model))
        batches = [jax.tree.map(lambda x: x[0], make_batch(cfg, accum=1,
                                                           batch=8))
                   for _ in range(2)]
        m = trainer.evaluate(state, iter(batches))
        assert np.isfinite(m["eval_loss"])
        assert 0.0 <= m["eval_token_accuracy"] <= 1.0
        # untrained tiny model over a 32k vocab: near-zero accuracy
        assert m["eval_token_accuracy"] < 0.2

    def test_eval_accuracy_counts_only_valid_tokens(self):
        """Token accuracy must be token-weighted over non-ignored labels
        (reference run_clm_llms.py:515-528 preprocess_logits + accuracy)."""
        cfg = tiny_config()
        mesh = create_mesh(cfg.mesh)
        trainer = Trainer(cfg, mesh, total_steps=10)
        state = trainer.init_state(
            fusion.init_params(jax.random.PRNGKey(13), cfg.model))
        batch = jax.tree.map(lambda x: x[0], make_batch(cfg, accum=1,
                                                        batch=8))
        loss, correct, total = trainer.eval_step_fn()(state, batch)
        # labels: 16 positions, first 4 ignored; shifted targets drop one
        # more -> 12 scoreable positions per row... but the count is over
        # the extended (prefix+text) sequence, still 12 valid per row
        assert int(total) == 8 * 12
        assert 0 <= int(correct) <= int(total)

    def test_evaluate_works_with_chunked_loss_config(self):
        """loss_chunk>0 (training memory path, logits=None) must not break
        eval — the eval step forces the full-logits path (regression:
        crashed the first 1b on-chip run's --do-eval)."""
        import dataclasses
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, loss_chunk=8))
        mesh = create_mesh(cfg.mesh)
        trainer = Trainer(cfg, mesh, total_steps=10)
        state = trainer.init_state(
            fusion.init_params(jax.random.PRNGKey(13), cfg.model))
        batch = jax.tree.map(lambda x: x[0], make_batch(cfg, accum=1,
                                                        batch=8))
        m = trainer.evaluate(state, iter([batch]))
        assert np.isfinite(m["eval_loss"])
        assert 0.0 <= m["eval_token_accuracy"] <= 1.0


class TestVocabPadding:
    def test_padded_vocab_shards_lm_head_on_tensor(self):
        """cfg.llm.vocab_pad_to (VERDICT r2 #9): 32007 divides no mesh
        size, so embed/lm_head could never shard on `tensor`; padded to
        32128 they must actually shard, and logits for REAL tokens must
        equal the unpadded model's (padded columns are -inf)."""
        import dataclasses
        from macaw_llm_tpu.models import llama as L
        from macaw_llm_tpu.parallel.sharding import shard_params
        from macaw_llm_tpu.utils.hf_import import pad_vocab

        cfg = tiny_config()
        lcfg = cfg.model.llm
        assert lcfg.vocab_size == 32007
        full = fusion.init_params(jax.random.PRNGKey(5), cfg.model)
        params = full["llm"]
        ids = jnp.asarray(np.random.RandomState(2).randint(16, 32000,
                                                           (2, 12)))
        ref, _ = L.forward(params, lcfg, input_ids=ids)

        pcfg = dataclasses.replace(lcfg, vocab_pad_to=32128)
        pcfg.validate()
        padded = dict(full)
        padded["llm"] = pad_vocab(params, pcfg.padded_vocab)
        assert padded["llm"]["lm_head"].shape[-1] == 32128

        mesh = create_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
        # unpadded: the vocab dim CANNOT shard on tensor (silent fallback)
        s_ref = shard_params(full, mesh)["llm"]
        assert s_ref["lm_head"].sharding.shard_shape(
            s_ref["lm_head"].shape)[-1] == 32007
        # padded: lm_head/embed REALLY shard over the 4-way tensor axis
        s_pad = shard_params(padded, mesh)["llm"]
        assert s_pad["lm_head"].sharding.shard_shape(
            s_pad["lm_head"].shape)[-1] == 32128 // 4
        assert s_pad["embed_tokens"].sharding.shard_shape(
            s_pad["embed_tokens"].shape)[0] == 32128 // 4

        got, _ = jax.jit(lambda p, i: L.forward(p, pcfg, input_ids=i))(
            s_pad, ids)
        # real-token logits identical; padded columns masked to -inf
        np.testing.assert_allclose(np.asarray(got)[..., :32007],
                                   np.asarray(ref), rtol=2e-4, atol=1e-5)
        assert float(np.asarray(got)[..., 32007:].max()) \
            == float(np.finfo(np.float32).min)

    def test_padded_vocab_loss_and_generation_unchanged(self):
        import dataclasses
        from macaw_llm_tpu.generate import generate
        from macaw_llm_tpu.models import llama as L
        from macaw_llm_tpu.utils.hf_import import pad_vocab

        cfg = tiny_config()
        lcfg = cfg.model.llm
        params = fusion.init_params(jax.random.PRNGKey(6), cfg.model)["llm"]
        pcfg = dataclasses.replace(lcfg, vocab_pad_to=32128)
        padded = pad_vocab(params, 32128)

        rng = np.random.RandomState(3)
        ids = jnp.asarray(rng.randint(16, 32000, (2, 10)))
        labels = np.asarray(ids).copy()
        labels[:, :3] = -100
        ref_logits, _ = L.forward(params, lcfg, input_ids=ids)
        pad_logits, _ = L.forward(padded, pcfg, input_ids=ids)
        # CE over masked logits == CE over unpadded (softmax ignores -inf)
        ref_loss = L.clm_loss(ref_logits, jnp.asarray(labels))
        pad_loss = L.clm_loss(pad_logits, jnp.asarray(labels))
        np.testing.assert_allclose(float(pad_loss), float(ref_loss),
                                   rtol=1e-6)
        # chunked CE path with valid= masking
        h, _ = L.forward_hidden(params, lcfg, L.embed(params, ids))
        hp, _ = L.forward_hidden(padded, pcfg, L.embed(padded, ids))
        cl = L.clm_loss_chunked(params, h, jnp.asarray(labels), chunk=4)
        clp = L.clm_loss_chunked(padded, hp, jnp.asarray(labels), chunk=4,
                                 valid=32007)
        np.testing.assert_allclose(float(clp), float(cl), rtol=1e-6)
        # greedy generation never emits a padded id
        emb = rng.randn(2, 5, lcfg.hidden_size).astype(np.float32) * 0.02
        out = generate(padded, pcfg, inputs_embeds=jnp.asarray(emb),
                       max_new_tokens=6, eos_id=2, pad_id=0)
        toks = np.asarray(out.tokens)
        assert (toks < 32007).all(), toks
