"""Int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macaw_llm_tpu.config import LlamaConfig
from macaw_llm_tpu.models import llama
from macaw_llm_tpu.utils.quantize import (dequantize, quantize_llama,
                                          quantize_tensor)

CFG = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4)


def test_roundtrip_error_small():
    w = jnp.asarray(np.random.RandomState(0).randn(64, 128) * 0.05,
                    jnp.float32)
    q, s = quantize_tensor(w)
    back = dequantize(q, s, jnp.float32)
    rel = float(jnp.abs(back - w).max() / jnp.abs(w).max())
    assert q.dtype == jnp.int8
    assert rel < 0.01


@pytest.mark.medium  # quantized forward + decode compiles
def test_quantized_forward_close_and_cache_decode():
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    ids = jnp.asarray(np.random.RandomState(1).randint(5, 128, (2, 9)))
    ref, _ = llama.forward(params, CFG, input_ids=ids)
    qparams = quantize_llama(params)
    assert qparams["layers"]["attn"]["wq"]["q"].dtype == jnp.int8
    got, _ = llama.forward(qparams, CFG, input_ids=ids)
    # logits within int8 tolerance; argmax mostly preserved
    agree = float((ref.argmax(-1) == got.argmax(-1)).mean())
    assert agree > 0.9, agree
    # KV-cache decode works with quantized weights
    cache = llama.KVCache.create(CFG, 2, 16, jnp.float32)
    lg, cache = llama.forward(qparams, CFG, input_ids=ids[:, :5],
                              kv_cache=cache)
    assert lg.shape == (2, 5, 128)
    assert int(cache.length) == 5


@pytest.mark.medium  # two decode-path compiles
def test_packed_decode_layout_matches_unpacked():
    """pack_llama_for_decode (qkv / gateup fused streams) is exact: same
    logits and same generated tokens, bf16 and int8."""
    import jax
    import jax.numpy as jnp
    from macaw_llm_tpu.config import tiny_model_config
    from macaw_llm_tpu.generate import generate
    from macaw_llm_tpu.models import fusion, llama
    from macaw_llm_tpu.utils.quantize import (pack_llama_for_decode,
                                              quantize_llama)
    cfg = tiny_model_config()
    params = fusion.init_params(jax.random.PRNGKey(17), cfg)["llm"]
    ids = jnp.asarray(np.random.RandomState(0).randint(16, 32000, (2, 12)))

    ref, _ = llama.forward(params, cfg.llm, input_ids=ids)
    packed = pack_llama_for_decode(params)
    got, _ = llama.forward(packed, cfg.llm, input_ids=ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    qparams = quantize_llama(params)
    qref, _ = llama.forward(qparams, cfg.llm, input_ids=ids)
    qpacked = pack_llama_for_decode(qparams)
    qgot, _ = llama.forward(qpacked, cfg.llm, input_ids=ids)
    np.testing.assert_allclose(np.asarray(qgot), np.asarray(qref),
                               rtol=2e-5, atol=2e-6)

    # generation (KV-cache decode loop) token parity
    emb = llama.embed(params, ids)
    a = generate(qparams, cfg.llm, inputs_embeds=emb, max_new_tokens=8,
                 eos_id=-1, pad_id=0)
    b = generate(qpacked, cfg.llm, inputs_embeds=emb, max_new_tokens=8,
                 eos_id=-1, pad_id=0)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_w8a8_matmul_bounded_error():
    """W8A8 (int8 activations x int8 weights on the MXU) matches the fp32
    dot within per-token-rounding tolerance, and the factorized rescale
    (per-token x per-channel) is the exact commutation it claims."""
    from macaw_llm_tpu.utils import quantize as qz
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(512, 64), jnp.float32)
    w = jnp.asarray(rng.randn(64, 96) * 0.05, jnp.float32)
    q, s = quantize_tensor(w)
    qz.set_activation_quant(True)
    try:
        got = qz.matmul(x, {"q": q, "s": s}, jnp.float32)
    finally:
        qz.set_activation_quant(False)
    ref = x @ w
    # int8 rounding of BOTH operands: relative error ~ 1/127 per operand
    err = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    assert err < 0.05, err
    cos = float(jnp.sum(got * ref)
                / (jnp.linalg.norm(got) * jnp.linalg.norm(ref)))
    assert cos > 0.999, cos


@pytest.mark.medium  # full-model prefill compile
def test_w8a8_prefill_forward_argmax_agrees():
    """End-to-end LLaMA prefill under activation quant: greedy tokens of
    the W8A8 forward agree with bf16-dequant int8 forward on >90% of
    positions (the serving-accuracy bar used for weight-only int8 above).
    Rows below _ACT_QUANT_MIN_ROWS (decode matvecs) must NOT take the
    int8-dot path — asserted via the decode step staying exact vs
    weight-only."""
    from macaw_llm_tpu.utils import quantize as qz
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    ids = jnp.asarray(np.random.RandomState(1).randint(5, 128, (8, 40)))
    qparams = quantize_llama(params)
    ref, _ = llama.forward(qparams, CFG, input_ids=ids)
    qz.set_activation_quant(True)
    try:
        got, _ = llama.forward(qparams, CFG, input_ids=ids)
        # decode-shaped call: rows = 8 < min-rows threshold -> weight-only
        cache = llama.KVCache.create(CFG, 8, 16, jnp.float32)
        lg_a, _ = llama.forward(qparams, CFG, input_ids=ids[:, :1],
                                kv_cache=cache)
    finally:
        qz.set_activation_quant(False)
    agree = float((ref.argmax(-1) == got.argmax(-1)).mean())
    assert agree > 0.9, agree
    cache = llama.KVCache.create(CFG, 8, 16, jnp.float32)
    lg_b, _ = llama.forward(qparams, CFG, input_ids=ids[:, :1],
                            kv_cache=cache)
    np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))


@pytest.mark.medium  # full-model prefill compile
def test_w8a8_towers_cosine_parity():
    """quantize_towers + activation quant: CLIP/Whisper encoder outputs
    stay cosine > 0.995 vs the bf16/fp32 tower (serving-accuracy bar for
    the W8A8 prefill path; BENCH.md W8A8 rows)."""
    from macaw_llm_tpu.config import ClipVisionConfig, WhisperConfig
    from macaw_llm_tpu.models import clip, whisper
    from macaw_llm_tpu.ops.attention import pack_mha
    from macaw_llm_tpu.utils import quantize as qz

    rng = np.random.RandomState(0)
    vis = ClipVisionConfig(hidden_size=64, intermediate_size=128,
                           num_layers=2, num_heads=4, image_size=32,
                           patch_size=16, projection_dim=48)
    cp = clip.init_params(jax.random.PRNGKey(0), vis)
    cp["layers"]["attn"] = pack_mha(cp["layers"]["attn"])
    px = jnp.asarray(rng.randn(300, 3, 32, 32), jnp.float32)
    ref = clip.encode_patches(cp, vis, px)
    qp = qz.quantize_towers({"image_encoder": cp})["image_encoder"]
    assert qp["layers"]["attn"]["qkv"]["w"]["q"].dtype == jnp.int8
    qz.set_activation_quant(True)
    try:
        got = clip.encode_patches(qp, vis, px)
    finally:
        qz.set_activation_quant(False)
    cos = float(jnp.sum(ref * got)
                / (jnp.linalg.norm(ref) * jnp.linalg.norm(got)))
    assert cos > 0.995, cos

    aud = WhisperConfig(d_model=64, encoder_layers=2,
                        encoder_attention_heads=4, encoder_ffn_dim=128,
                        max_source_positions=64, num_mel_bins=16)
    wp = whisper.init_params(jax.random.PRNGKey(1), aud)
    wp["layers"]["attn"] = pack_mha(wp["layers"]["attn"])
    mel = jnp.asarray(rng.randn(8, 16, 128) * 0.3, jnp.float32)
    refw = whisper.encode(wp, aud, mel)
    qw = qz.quantize_towers({"audio_encoder": wp})["audio_encoder"]
    qz.set_activation_quant(True)
    try:
        gotw = whisper.encode(qw, aud, mel)
    finally:
        qz.set_activation_quant(False)
    cosw = float(jnp.sum(refw * gotw)
                 / (jnp.linalg.norm(refw) * jnp.linalg.norm(gotw)))
    assert cosw > 0.995, cosw
