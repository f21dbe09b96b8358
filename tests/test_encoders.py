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
