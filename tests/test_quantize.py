"""Int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

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
