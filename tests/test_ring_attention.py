"""Ring attention over the simulated 8-device mesh vs full attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macaw_llm_tpu.config import MeshConfig
from macaw_llm_tpu.ops import causal_mask, dot_product_attention
from macaw_llm_tpu.parallel.mesh import create_mesh
from macaw_llm_tpu.parallel.ring_attention import (inverse_permutation,
                                                   ring_attention,
                                                   zigzag_indices)

pytestmark = [
    pytest.mark.medium,  # 8-device shard_map grads: minutes
    pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 simulated devices"),
]


def make_qkv(b=1, s=256, n=2, d=64, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, s, n, d) * 0.3, jnp.float32)  # noqa: E731
    return mk(), mk(), mk()


class TestRingAttention:
    def test_matches_full_causal_attention(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
        q, k, v = make_qkv(s=256)
        ref = dot_product_attention(q, k, v, causal_mask(256, 256))
        got = ring_attention(q, k, v, mesh=mesh, axis="tensor",
                             block_q=64, block_k=64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-5)

    def test_eight_way_ring(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=1, tensor=8))
        q, k, v = make_qkv(b=2, s=128, n=1, d=32, seed=1)
        ref = dot_product_attention(q, k, v, causal_mask(128, 128))
        got = ring_attention(q, k, v, mesh=mesh, axis="tensor",
                             block_q=16, block_k=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-5)

    def test_gradients_match(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
        q, k, v = make_qkv(s=128, n=1, d=32, seed=2)

        def loss_ring(q, k, v):
            return ring_attention(q, k, v, mesh=mesh, axis="tensor",
                                  block_q=32, block_k=32).sum()

        def loss_ref(q, k, v):
            return dot_product_attention(q, k, v,
                                         causal_mask(128, 128)).sum()

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gr, gf, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-5,
                                       err_msg=f"d{name}")


class TestZigzag:
    def test_indices_roundtrip(self):
        perm = zigzag_indices(64, 4)
        inv = inverse_permutation(perm)
        np.testing.assert_array_equal(np.asarray(perm)[np.asarray(inv)],
                                      np.arange(64))
        # device i owns block i (early) and block 2n-1-i (late)
        p = np.asarray(perm).reshape(4, 16)
        np.testing.assert_array_equal(p[0][:8], np.arange(0, 8))
        np.testing.assert_array_equal(p[0][8:], np.arange(56, 64))

    def test_zigzag_matches_full_causal_attention(self):
        """Permute q/k/v by the zig-zag layout, run the balanced ring,
        unpermute — must equal full causal attention."""
        mesh = create_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
        s = 256
        q, k, v = make_qkv(s=s, seed=3)
        ref = dot_product_attention(q, k, v, causal_mask(s, s))
        perm = zigzag_indices(s, 4)
        inv = inverse_permutation(perm)
        got = ring_attention(q[:, perm], k[:, perm], v[:, perm],
                             mesh=mesh, axis="tensor", layout="zigzag",
                             block_q=16, block_k=16)
        np.testing.assert_allclose(np.asarray(got[:, inv]), np.asarray(ref),
                                   rtol=2e-3, atol=2e-5)

    def test_zigzag_gradients_match(self):
        mesh = create_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
        s = 128
        q, k, v = make_qkv(s=s, n=1, d=32, seed=4)
        perm = zigzag_indices(s, 4)

        def loss_ring(q, k, v):
            return ring_attention(q[:, perm], k[:, perm], v[:, perm],
                                  mesh=mesh, axis="tensor",
                                  layout="zigzag",
                                  block_q=16, block_k=16).sum()

        def loss_ref(q, k, v):
            return dot_product_attention(q, k, v,
                                         causal_mask(s, s)).sum()

        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gr, gf, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-5,
                                       err_msg=f"d{name}")


class TestAlignedLoss:
    def test_matches_clm_loss_on_preshifted_labels(self):
        from macaw_llm_tpu.config import IGNORE_ID
        from macaw_llm_tpu.models.llama import clm_loss, clm_loss_aligned
        rng = np.random.RandomState(5)
        logits = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
        labels = rng.randint(0, 32, (2, 16))
        labels[:, :3] = IGNORE_ID
        labels = jnp.asarray(labels)
        targets = jnp.concatenate(
            [labels[:, 1:],
             jnp.full((2, 1), IGNORE_ID, labels.dtype)], axis=1)
        np.testing.assert_allclose(
            float(clm_loss_aligned(logits, targets)),
            float(clm_loss(logits, labels)), rtol=1e-6)


class TestRingInDecoder:
    def test_decoder_forward_with_ring_matches_plain(self):
        """llama.forward_hidden with ring attention over the tensor axis
        == single-device forward (long-context training path).

        Contiguous layout takes plain-order inputs; zigzag requires the
        CALLER to permute embeddings + RoPE positions and unpermute the
        output (the fusion._forward_ring contract) — the test exercises
        both."""
        from macaw_llm_tpu.config import tiny_model_config
        from macaw_llm_tpu.models import fusion, llama
        from macaw_llm_tpu.parallel.ring_attention import (
            inverse_permutation, zigzag_indices)
        cfg = tiny_model_config()
        params = fusion.init_params(jax.random.PRNGKey(9), cfg)["llm"]
        emb = llama.embed(params,
                          jnp.asarray(np.random.RandomState(0).randint(
                              16, 32000, (2, 64))))
        ref, _ = llama.forward_hidden(params, cfg.llm, emb)
        mesh = create_mesh(MeshConfig(data=1, fsdp=2, tensor=4))

        got, _ = llama.forward_hidden(params, cfg.llm, emb,
                                      ring_mesh=mesh, ring_axis="tensor",
                                      ring_layout="contiguous")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=1e-4)

        perm = zigzag_indices(64, 4)
        pos = jnp.broadcast_to(perm[None, :], (2, 64))
        got_z, _ = llama.forward_hidden(params, cfg.llm, emb[:, perm],
                                        positions=pos,
                                        ring_mesh=mesh, ring_axis="tensor",
                                        ring_layout="zigzag")
        got_z = got_z[:, inverse_permutation(perm)]
        np.testing.assert_allclose(np.asarray(got_z), np.asarray(ref),
                                   rtol=2e-3, atol=1e-4)


@pytest.mark.slow  # 8k-seq train-step compile on 8 virtual devices: minutes
class TestLongContext:
    def test_8k_context_ring_train_step(self):
        """An 8k-token sequence-sharded train step (ring attention,
        zig-zag) runs and produces a finite loss on the 8-device mesh —
        the SURVEY 5.7 long-context path end-to-end through the Trainer."""
        import dataclasses
        from macaw_llm_tpu.config import (Config, IGNORE_ID, MeshConfig,
                                          TrainConfig, tiny_model_config)
        from macaw_llm_tpu.models import fusion
        from macaw_llm_tpu.train.trainer import Trainer

        model = dataclasses.replace(tiny_model_config(),
                                    ring_attention=True,
                                    ring_axis="tensor",
                                    loss_chunk=512)
        cfg = Config(model=model,
                     mesh=MeshConfig(data=1, fsdp=2, tensor=4),
                     train=TrainConfig(per_device_batch_size=1,
                                       grad_accum_steps=1))
        mesh = create_mesh(cfg.mesh)
        prefix = model.total_prefix_len
        seq = 8192 - prefix  # fused length 8192, divisible by 2 x ring 4
        assert (prefix + seq) % 8 == 0

        rng = np.random.RandomState(0)
        ids = rng.randint(16, 32000, (1, 1, seq)).astype(np.int32)
        ids[:, :, 0] = 1
        labels = ids.copy()
        labels[:, :, :4] = IGNORE_ID
        vis = cfg.model.vision
        batch = {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((1, 1, seq), jnp.int32),
            "labels": jnp.asarray(labels),
            "images": jnp.zeros((1, 1, 3, vis.image_size, vis.image_size)),
            "audios": jnp.zeros((1, 1, 80, 3000)),
            "videos": jnp.zeros((1, 1, cfg.model.fusion.n_frames, 3,
                                 vis.image_size, vis.image_size)),
        }
        trainer = Trainer(cfg, mesh, total_steps=10)
        state = trainer.init_state(
            fusion.init_params(jax.random.PRNGKey(42), cfg.model))
        state, m = trainer.train_step(state, batch)
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["grad_norm"]))
        assert int(state.step) == 1

    def test_ring_chunked_loss_matches_unchunked(self):
        """cfg.loss_chunk under ring attention (chunked CE on aligned
        permuted targets) computes the same loss as the full-logits ring
        path."""
        import dataclasses
        from macaw_llm_tpu.config import (Config, IGNORE_ID, MeshConfig,
                                          TrainConfig, tiny_model_config)
        from macaw_llm_tpu.models import fusion

        mesh = create_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
        base = dataclasses.replace(tiny_model_config(),
                                   ring_attention=True,
                                   ring_axis="tensor")
        prefix = base.total_prefix_len
        seq = 40 - prefix % 8  # fused len divisible by 2 x ring 4
        seq = ((prefix + 39) // 8 + 1) * 8 - prefix
        params = fusion.init_params(jax.random.PRNGKey(3), base)
        rng = np.random.RandomState(0)
        ids = rng.randint(16, 32000, (2, seq)).astype(np.int32)
        ids[:, 0] = 1
        labels = ids.copy()
        labels[:, :3] = IGNORE_ID
        vis = base.vision
        kw = dict(input_ids=jnp.asarray(ids),
                  images=jnp.zeros((2, 3, vis.image_size, vis.image_size)),
                  audios=jnp.zeros((2, 80, 3000)),
                  videos=jnp.zeros((2, base.fusion.n_frames, 3,
                                    vis.image_size, vis.image_size)),
                  attention_mask=jnp.ones((2, seq), jnp.int32),
                  labels=jnp.asarray(labels))
        with mesh:
            l_full, _ = fusion.forward(params, base, ring_mesh=mesh, **kw)
            ccfg = dataclasses.replace(base, loss_chunk=8)
            l_chunk, none_logits = fusion.forward(params, ccfg,
                                                  ring_mesh=mesh, **kw)
        assert none_logits is None
        np.testing.assert_allclose(float(l_chunk), float(l_full),
                                   rtol=1e-5)
