"""Full-system numeric parity: our TPU-native fusion model vs the reference
MM_LLMs (tiny configs, torch CPU, eval mode).

This instantiates the actual reference model from /root/reference (read-only)
with random tiny weights, imports its state_dict into our pytree, and checks
encoder outputs, fused embeddings, logits and loss — the BASELINE.json
"≤1e-3 logit divergence" requirement at test scale.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.dont_write_bytecode = True
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from macaw_llm_tpu.config import (ClipVisionConfig, FusionConfig, IGNORE_ID,
                                  LlamaConfig, ModelConfig, WhisperConfig)
from macaw_llm_tpu.models import fusion, llama
from macaw_llm_tpu.utils.hf_import import import_mm_llms

VOCAB = 64
BIDS = {"image": (10, 11), "audio": (12, 13), "video": (14, 15)}

CFG = ModelConfig(
    llm=LlamaConfig(vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, pad_token_id=0),
    vision=ClipVisionConfig(hidden_size=32, intermediate_size=64,
                            num_layers=2, num_heads=2, image_size=32,
                            patch_size=16, projection_dim=16),
    audio=WhisperConfig(num_mel_bins=80, d_model=32, encoder_layers=2,
                        encoder_attention_heads=2, encoder_ffn_dim=64),
    fusion=FusionConfig(attention_heads=2, n_frames=6,
                        image_conv_kernel=2, image_conv_stride=1,
                        video_conv_kernel=6, video_conv_stride=4,
                        audio_conv_kernel=240, audio_conv_stride=220),
    dtype="float32",
)


@pytest.fixture(scope="module")
def ref_model():
    import modeling as ref  # /root/reference/modeling.py
    from transformers import (CLIPConfig, CLIPTextConfig,
                              CLIPVisionConfig as HFV)
    from transformers import LlamaConfig as HFLlama
    from transformers import WhisperConfig as HFWhisper

    clip_cfg = CLIPConfig(
        text_config=CLIPTextConfig(hidden_size=32, intermediate_size=64,
                                   num_hidden_layers=2, num_attention_heads=2,
                                   projection_dim=16).to_dict(),
        vision_config=HFV(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          image_size=32, patch_size=16,
                          projection_dim=16).to_dict(),
        projection_dim=16)
    whisper_cfg = HFWhisper(num_mel_bins=80, d_model=32, encoder_layers=2,
                            encoder_attention_heads=2, encoder_ffn_dim=64,
                            decoder_layers=1, decoder_attention_heads=2,
                            decoder_ffn_dim=64, max_source_positions=1500)
    llm_cfg = HFLlama(vocab_size=VOCAB, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, max_position_embeddings=2048,
                      pad_token_id=0)
    mm_cfg = ref.MM_LLMs_Config(
        n_frames=6, attention_heads=2,
        image_conv_kernel=2, image_conv_stride=1,
        video_conv_kernel=6, video_conv_stride=4,
        audio_conv_kernel=240, audio_conv_stride=220,
        clip_config=clip_cfg, whisper_config=whisper_cfg,
        llm_config=llm_cfg)
    torch.manual_seed(0)
    model = ref.MM_LLMs(mm_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    b, s = 2, 12
    ids = rng.randint(16, VOCAB, (b, s))
    ids[:, 0] = 1  # BOS
    mask = np.ones((b, s), np.int64)
    labels = ids.copy()
    labels[:, :4] = IGNORE_ID
    return {
        "input_ids": ids,
        "attention_mask": mask,
        "labels": labels,
        "images": rng.randn(b, 3, 32, 32).astype(np.float32),
        "audios": rng.randn(b, 80, 3000).astype(np.float32),
        "videos": rng.randn(b, 6, 3, 32, 32).astype(np.float32),
    }


@pytest.fixture(scope="module")
def torch_inputs(inputs):
    b = inputs["input_ids"].shape[0]
    t = {k: torch.tensor(v) for k, v in inputs.items()}
    for mod, (s, e) in BIDS.items():
        t[f"{mod}_starts"] = torch.full((b,), s, dtype=torch.long)
        t[f"{mod}_ends"] = torch.full((b,), e, dtype=torch.long)
    t["inference"] = False
    return t


@pytest.fixture(scope="module")
def params(ref_model):
    return import_mm_llms(ref_model.state_dict(), CFG)


def test_encoder_outputs_parity(ref_model, params, inputs):
    with torch.no_grad():
        exp_im = ref_model.encode_image(
            torch.tensor(inputs["images"])).numpy()
        exp_au = ref_model.encode_audio(
            torch.tensor(inputs["audios"])).numpy()
        exp_vi = ref_model.encode_video_long(
            torch.tensor(inputs["videos"])).numpy()
    got_im = fusion.encode_image(params, CFG, jnp.asarray(inputs["images"]))
    got_au = fusion.encode_audio(params, CFG, jnp.asarray(inputs["audios"]))
    got_vi = fusion.encode_video_long(params, CFG,
                                      jnp.asarray(inputs["videos"]))
    np.testing.assert_allclose(np.asarray(got_im), exp_im, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_au), exp_au, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_vi), exp_vi, rtol=1e-3,
                               atol=1e-4)


def test_fused_embeddings_parity(ref_model, params, inputs, torch_inputs):
    """prepare_inputs_for_generation parity: embeddings, mask, labels
    (reference modeling.py:965-1048)."""
    with torch.no_grad():
        exp_emb, exp_mask, exp_labels = \
            ref_model.prepare_inputs_for_generation(torch_inputs)
    got = fusion.prepare_inputs(
        params, CFG,
        input_ids=jnp.asarray(inputs["input_ids"]),
        images=jnp.asarray(inputs["images"]),
        audios=jnp.asarray(inputs["audios"]),
        videos=jnp.asarray(inputs["videos"]),
        attention_mask=jnp.asarray(inputs["attention_mask"]),
        labels=jnp.asarray(inputs["labels"]),
        boundary_ids=BIDS)
    assert got.inputs_embeds.shape == tuple(exp_emb.shape)
    np.testing.assert_allclose(np.asarray(got.inputs_embeds),
                               exp_emb.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.attention_mask),
                                  exp_mask.numpy())
    np.testing.assert_array_equal(np.asarray(got.labels),
                                  exp_labels.numpy())


def test_forward_loss_and_logits_parity(ref_model, params, inputs,
                                        torch_inputs):
    with torch.no_grad():
        out = ref_model(torch_inputs)
    loss, logits = fusion.forward(
        params, CFG,
        input_ids=jnp.asarray(inputs["input_ids"]),
        images=jnp.asarray(inputs["images"]),
        audios=jnp.asarray(inputs["audios"]),
        videos=jnp.asarray(inputs["videos"]),
        attention_mask=jnp.asarray(inputs["attention_mask"]),
        labels=jnp.asarray(inputs["labels"]),
        boundary_ids=BIDS)
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(float(loss), out.loss.item(), rtol=1e-4)


def test_text_only_absent_modalities(ref_model, params, inputs, torch_inputs):
    """Reference zero-fills absent media (llm_trainer.py:314-352); zeros in
    must give identical outputs on both sides."""
    z = dict(torch_inputs)
    z["images"] = torch.zeros_like(z["images"])
    z["audios"] = torch.zeros_like(z["audios"])
    z["videos"] = torch.zeros_like(z["videos"])
    with torch.no_grad():
        out = ref_model(z)
    loss, logits = fusion.forward(
        params, CFG,
        input_ids=jnp.asarray(inputs["input_ids"]),
        images=jnp.zeros_like(jnp.asarray(inputs["images"])),
        audios=jnp.zeros_like(jnp.asarray(inputs["audios"])),
        videos=jnp.zeros_like(jnp.asarray(inputs["videos"])),
        attention_mask=jnp.asarray(inputs["attention_mask"]),
        labels=jnp.asarray(inputs["labels"]),
        boundary_ids=BIDS)
    np.testing.assert_allclose(float(loss), out.loss.item(), rtol=1e-4)


def test_video_simple_path_parity(ref_model, params, inputs):
    """The alternative pooled-frame path (reference encode_video,
    modeling.py:1050-1068) as a selectable mode."""
    with torch.no_grad():
        expected = ref_model.encode_video(
            torch.tensor(inputs["videos"])).numpy()
    got = fusion.encode_video_simple(params, CFG,
                                     jnp.asarray(inputs["videos"]))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=1e-4)


def test_prefix_geometry():
    assert CFG.image_prefix_len == 3
    assert CFG.video_prefix_len == 5
    assert CFG.audio_prefix_len == 6
    assert CFG.total_prefix_len == 3 + 5 + 6 + 6
