"""Mid-scale numeric parity (VERDICT r2 #5): the toy-width (hidden 64)
parity tests cannot catch accumulation error that appears at real widths.
Here the BASELINE.json "<= 1e-3 logit divergence" bar is checked at
hidden 1024 / 4 layers / the real 32007 vocab for the LLaMA stack, at
real tower widths (CLIP 768, Whisper 512) for the encoders, and at
hidden 1024 over the full 32007-row memory for the alignment attention.
bf16 divergence is additionally MEASURED and bounded (recorded in
BASELINE.md) — bf16 cannot meet 1e-3; fp32 compute must.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from macaw_llm_tpu.config import (ClipVisionConfig, LlamaConfig,
                                  WhisperConfig)
from macaw_llm_tpu.models import clip, llama, whisper
from macaw_llm_tpu.ops.attention import torch_mha_apply_shared_kv
from macaw_llm_tpu.utils.hf_import import (_torch_mha_params, import_llama,
                                           import_clip_vision,
                                           import_whisper_encoder)

pytestmark = pytest.mark.slow  # real-width HF parity: minutes of CPU compiles

VOCAB = 32007
MID = LlamaConfig(vocab_size=VOCAB, hidden_size=1024,
                  intermediate_size=2816, num_layers=4, num_heads=16,
                  max_position_embeddings=2048, pad_token_id=32006)


def _rel_div(got, exp):
    """Max abs divergence relative to the reference's logit scale."""
    exp = np.asarray(exp)
    return float(np.abs(np.asarray(got) - exp).max()
                 / max(np.abs(exp).max(), 1e-9))


@pytest.fixture(scope="module")
def hf_llama():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    hf_cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=MID.hidden_size,
        intermediate_size=MID.intermediate_size,
        num_hidden_layers=MID.num_layers,
        num_attention_heads=MID.num_heads,
        num_key_value_heads=MID.num_heads,
        max_position_embeddings=MID.max_position_embeddings,
        attention_bias=False, tie_word_embeddings=False,
        pad_token_id=32006, attn_implementation="eager")
    torch.manual_seed(7)
    m = LlamaForCausalLM(hf_cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def mid_ids():
    rng = np.random.RandomState(3)
    ids = rng.randint(3, 31999, (2, 64)).astype(np.int32)
    ids[:, 0] = 1
    return ids


class TestLlamaMidScale:
    def test_fp32_logits_within_1e3(self, hf_llama, mid_ids):
        """The BASELINE bar at a width where fp32 accumulation has real
        depth: hidden 1024, 4 layers, full 32007-row lm_head."""
        with torch.no_grad():
            exp = hf_llama(torch.tensor(mid_ids.astype(np.int64))
                           ).logits.numpy()
        params = import_llama(hf_llama.state_dict(), MID)
        got, _ = llama.forward(params, MID, input_ids=jnp.asarray(mid_ids))
        div = _rel_div(got, exp)
        print(f"\nmid-scale fp32 logit divergence: {div:.2e}")
        assert div <= 1e-3, div

    def test_bf16_divergence_measured_and_bounded(self, hf_llama, mid_ids):
        """bf16 compute (the TPU production dtype) vs torch fp32: measure
        the divergence where bf16 accumulation can bite. The measured
        number is recorded in BASELINE.md; the bound here catches
        regressions (a broken kernel diverges at O(1), dtype noise at
        O(1e-2))."""
        with torch.no_grad():
            exp = hf_llama(torch.tensor(mid_ids.astype(np.int64))
                           ).logits.numpy()
        params = import_llama(hf_llama.state_dict(), MID)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        got, _ = llama.forward(params, MID, input_ids=jnp.asarray(mid_ids),
                               dtype=jnp.bfloat16)
        div = _rel_div(got, exp)
        print(f"\nmid-scale bf16 logit divergence: {div:.2e}")
        assert div <= 3e-2, div
        # bf16 noise must not flip the argmax ordering wholesale
        agree = (np.asarray(got).argmax(-1)
                 == exp.argmax(-1)).mean()
        assert agree >= 0.9, agree


class TestTowersRealWidth:
    def test_clip_real_width_fp32(self):
        """CLIP tower at its REAL width (hidden 768, ViT-B/16 geometry;
        2 layers for runtime) vs HF."""
        from transformers import CLIPVisionConfig as HFV
        from transformers import CLIPVisionModel
        cfg = ClipVisionConfig(hidden_size=768, intermediate_size=3072,
                               num_layers=2, num_heads=12, image_size=224,
                               patch_size=16, projection_dim=512)
        torch.manual_seed(1)
        hf = CLIPVisionModel(HFV(hidden_size=768, intermediate_size=3072,
                                 num_hidden_layers=2, num_attention_heads=12,
                                 image_size=224, patch_size=16,
                                 projection_dim=512,
                                 attn_implementation="eager"))
        hf.eval()
        sd = {f"vision_model.{k}": v
              for k, v in hf.vision_model.state_dict().items()}
        # the visual projection is part of CLIPModel, not CLIPVisionModel
        torch.manual_seed(2)
        proj = torch.nn.Linear(768, 512, bias=False)
        sd["visual_projection.weight"] = proj.weight.detach()
        params = import_clip_vision(sd, cfg)
        x = np.random.RandomState(5).randn(2, 3, 224, 224).astype(
            np.float32)
        with torch.no_grad():
            hidden = hf(torch.tensor(x)).last_hidden_state
            exp = (hidden @ proj.weight.T)[:, 1:, :].numpy()
        got = clip.encode_patches(params, cfg, jnp.asarray(x))
        div = _rel_div(got, exp)
        print(f"\nclip real-width fp32 divergence: {div:.2e}")
        assert div <= 1e-3, div

    def test_whisper_real_width_fp32(self):
        """Whisper encoder at its real width (d_model 512, whisper-base
        geometry; 2 layers for runtime) vs HF."""
        from transformers import WhisperConfig as HFW
        from transformers import WhisperModel
        cfg = WhisperConfig(num_mel_bins=80, d_model=512,
                            encoder_layers=2, encoder_attention_heads=8,
                            encoder_ffn_dim=2048)
        torch.manual_seed(4)
        hf = WhisperModel(HFW(num_mel_bins=80, d_model=512,
                              encoder_layers=2, encoder_attention_heads=8,
                              encoder_ffn_dim=2048, decoder_layers=1,
                              decoder_attention_heads=8,
                              decoder_ffn_dim=512,
                              max_source_positions=1500,
                              attn_implementation="eager"))
        hf.eval()
        sd = {f"encoder.{k}": v for k, v in hf.encoder.state_dict().items()}
        params = import_whisper_encoder(sd, cfg)
        mel = (np.random.RandomState(6).randn(2, 80, 3000) * 0.5).astype(
            np.float32)
        with torch.no_grad():
            exp = hf.encoder(torch.tensor(mel)).last_hidden_state.numpy()
        got = whisper.encode(params, cfg, jnp.asarray(mel))
        div = _rel_div(got, exp)
        print(f"\nwhisper real-width fp32 divergence: {div:.2e}")
        assert div <= 1e-3, div


class TestAlignmentMidScale:
    def test_align_attention_full_vocab_memory_fp32(self):
        """The alignment attention over the FULL 32007-row vocab memory at
        hidden 1024 (the reference's hot fusion op, modeling.py:986-1026)
        vs torch.nn.MultiheadAttention."""
        e, heads = 1024, 16
        torch.manual_seed(9)
        mha = torch.nn.MultiheadAttention(e, heads, dropout=0.0,
                                          add_bias_kv=True,
                                          add_zero_attn=True,
                                          batch_first=True)
        mha.eval()
        params = _torch_mha_params(mha.state_dict(), prefix="")
        rng = np.random.RandomState(8)
        q = (rng.randn(2, 13, e) * 0.1).astype(np.float32)
        mem = (rng.randn(VOCAB, e) * 0.02).astype(np.float32)
        with torch.no_grad():
            exp, _ = mha(torch.tensor(q),
                         torch.tensor(mem)[None].expand(2, -1, -1),
                         torch.tensor(mem)[None].expand(2, -1, -1))
        got = torch_mha_apply_shared_kv(params, heads, jnp.asarray(q),
                                        jnp.asarray(mem),
                                        add_zero_attn=True)
        div = _rel_div(got, exp.numpy())
        print(f"\nalign mid-scale fp32 divergence: {div:.2e}")
        assert div <= 1e-3, div
