"""CLIP vision tower and Whisper encoder parity vs HF (tiny configs)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from macaw_llm_tpu.config import ClipVisionConfig, WhisperConfig
from macaw_llm_tpu.models import clip, whisper
from macaw_llm_tpu.utils.hf_import import (import_clip_vision,
                                           import_whisper_encoder)

VCFG = ClipVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                        num_heads=2, image_size=32, patch_size=16,
                        projection_dim=16)
ACFG = WhisperConfig(num_mel_bins=80, d_model=32, encoder_layers=2,
                     encoder_attention_heads=2, encoder_ffn_dim=64,
                     max_source_positions=1500)


class TestClipVision:
    @pytest.fixture(scope="class")
    def hf(self):
        from transformers import CLIPConfig, CLIPModel
        from transformers import CLIPTextConfig, CLIPVisionConfig as HFV
        cfg = CLIPConfig(
            text_config=CLIPTextConfig(hidden_size=32, intermediate_size=64,
                                       num_hidden_layers=2,
                                       num_attention_heads=2,
                                       projection_dim=16).to_dict(),
            vision_config=HFV(hidden_size=VCFG.hidden_size,
                              intermediate_size=VCFG.intermediate_size,
                              num_hidden_layers=VCFG.num_layers,
                              num_attention_heads=VCFG.num_heads,
                              image_size=VCFG.image_size,
                              patch_size=VCFG.patch_size,
                              projection_dim=VCFG.projection_dim).to_dict(),
            projection_dim=VCFG.projection_dim)
        torch.manual_seed(0)
        m = CLIPModel(cfg)
        m.eval()
        return m

    def test_encode_patches_parity(self, hf):
        """Reference encode_image (modeling.py:1085-1093):
        visual_projection(vision_model(x)[0])[:, 1:, :]."""
        rng = np.random.RandomState(0)
        pixels = rng.randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            hidden = hf.vision_model(torch.tensor(pixels))[0]
            expected = hf.visual_projection(hidden)[:, 1:, :].numpy()
        params = import_clip_vision(hf.state_dict(), VCFG)
        got = clip.encode_patches(params, VCFG, jnp.asarray(pixels))
        assert got.shape == (2, VCFG.num_patches, VCFG.projection_dim)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3,
                                   atol=2e-4)

    def test_random_init_shapes(self):
        import jax
        p = clip.init_params(jax.random.PRNGKey(0), VCFG)
        out = clip.encode_patches(p, VCFG, jnp.zeros((1, 3, 32, 32)))
        assert out.shape == (1, 4, 16)


class TestWhisperEncoder:
    @pytest.fixture(scope="class")
    def hf(self):
        from transformers import WhisperConfig as HFW, WhisperModel
        cfg = HFW(num_mel_bins=ACFG.num_mel_bins, d_model=ACFG.d_model,
                  encoder_layers=ACFG.encoder_layers,
                  encoder_attention_heads=ACFG.encoder_attention_heads,
                  encoder_ffn_dim=ACFG.encoder_ffn_dim,
                  decoder_layers=1, decoder_attention_heads=2,
                  decoder_ffn_dim=64,
                  max_source_positions=ACFG.max_source_positions)
        torch.manual_seed(0)
        m = WhisperModel(cfg)
        m.eval()
        return m

    def test_encode_parity(self, hf):
        """Reference encode_audio (modeling.py:1081-1083):
        audio_encoder.encoder(mel)[0] over [B, 80, 3000]."""
        rng = np.random.RandomState(0)
        mel = rng.randn(1, 80, 3000).astype(np.float32)
        with torch.no_grad():
            expected = hf.encoder(torch.tensor(mel))[0].numpy()
        params = import_whisper_encoder(hf.state_dict(), ACFG)
        got = whisper.encode(params, ACFG, jnp.asarray(mel))
        assert got.shape == (1, 1500, ACFG.d_model)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3,
                                   atol=5e-4)

    def test_random_init_shapes(self):
        import jax
        p = whisper.init_params(jax.random.PRNGKey(0), ACFG)
        out = whisper.encode(p, ACFG, jnp.zeros((1, 80, 3000)))
        assert out.shape == (1, 1500, 32)

    def test_layerdrop(self):
        """LayerDrop (reference modeling.py:766-768): at rate 1.0 every
        layer is skipped -> output equals the conv+PE+final-LN path with
        zero transformer layers; at rate 0.0 / rng None it is identity
        with the plain path. whisper-base ships rate 0.0."""
        import dataclasses

        import jax
        rng = np.random.RandomState(1)
        mel = jnp.asarray(rng.randn(2, 80, 3000).astype(np.float32))
        p = whisper.init_params(jax.random.PRNGKey(0), ACFG)
        base = whisper.encode(p, ACFG, mel)

        drop_all = dataclasses.replace(ACFG, encoder_layerdrop=1.0)
        # zero-layer reference: slice the layer stack empty
        p_empty = dict(p, layers=jax.tree.map(lambda x: x[:0], p["layers"]))
        expected = whisper.encode(p_empty, ACFG, mel)
        got = whisper.encode(p, drop_all, mel,
                             dropout_rng=jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)
        # rate 0.0 with an rng and rate>0 without an rng are both identity
        got0 = whisper.encode(p, ACFG, mel, dropout_rng=jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(got0), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)
        got_none = whisper.encode(p, drop_all, mel)
        np.testing.assert_allclose(np.asarray(got_none), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)

    def test_layerdrop_partial_grad(self):
        """rate 0.5: output differs from both all-kept and all-dropped,
        and gradients flow through the kept layers under jit."""
        import dataclasses

        import jax
        cfg = dataclasses.replace(ACFG, encoder_layerdrop=0.5,
                                  encoder_layers=4)
        p = whisper.init_params(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(np.random.RandomState(2)
                          .randn(1, 80, 3000).astype(np.float32))

        @jax.jit
        def loss(p, key):
            return jnp.sum(whisper.encode(p, cfg, mel, dropout_rng=key)
                           ** 2)

        # find a key with a mixed keep pattern
        for seed in range(20):
            keep = jax.random.bernoulli(jax.random.PRNGKey(seed), 0.5, (4,))
            if bool(keep.any()) and not bool(keep.all()):
                key = jax.random.PRNGKey(seed)
                break
        g = jax.grad(loss)(p, key)
        gl = g["layers"]["attn"]["q"]["w"]  # [L, ...]
        per_layer = np.asarray(jnp.sum(jnp.abs(gl), axis=tuple(
            range(1, gl.ndim))))
        keep_np = np.asarray(keep)
        assert (per_layer[keep_np] > 0).all()
        assert (per_layer[~keep_np] == 0).all()
