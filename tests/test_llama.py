"""LLaMA decoder parity vs HF LlamaForCausalLM (tiny config, torch CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from macaw_llm_tpu.config import IGNORE_ID, LlamaConfig
from macaw_llm_tpu.models import llama
from macaw_llm_tpu.utils.hf_import import import_llama, resize_token_embeddings

CFG = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=172,
                  num_layers=3, num_heads=4, max_position_embeddings=256)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    hf_cfg = HFLlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps, rope_theta=CFG.rope_base,
        attention_bias=False, tie_word_embeddings=False,
        pad_token_id=0, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def params(hf_model):
    return import_llama(hf_model.state_dict(), CFG)


def test_logits_parity(hf_model, params):
    rng = np.random.RandomState(0)
    ids = rng.randint(0, CFG.vocab_size, (2, 10))
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids)).logits.numpy()
    got, _ = llama.forward(params, CFG, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3,
                               atol=2e-4)


def test_logits_parity_with_padding_mask(hf_model, params):
    rng = np.random.RandomState(1)
    ids = rng.randint(0, CFG.vocab_size, (2, 8))
    mask = np.ones((2, 8), np.int64)
    mask[0, :3] = 0  # left-padding
    # HF derives positions from cumsum of the mask
    # (reference modeling.py:630-636); replicate for the masked row.
    pos = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids),
                            attention_mask=torch.tensor(mask)).logits.numpy()
    got, _ = llama.forward(params, CFG, input_ids=jnp.asarray(ids),
                           attention_mask=jnp.asarray(mask),
                           positions=jnp.asarray(pos))
    # compare only non-pad positions
    np.testing.assert_allclose(np.asarray(got)[0, 3:], expected[0, 3:],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got)[1], expected[1], rtol=2e-3,
                               atol=2e-4)


def test_inputs_embeds_entry_point(hf_model, params):
    """The multimodal path feeds embeddings directly
    (reference modeling.py:417-425)."""
    rng = np.random.RandomState(2)
    embeds = rng.randn(1, 6, CFG.hidden_size).astype(np.float32) * 0.02
    with torch.no_grad():
        expected = hf_model(
            inputs_embeds=torch.tensor(embeds)).logits.numpy()
    got, _ = llama.forward(params, CFG, inputs_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3,
                               atol=2e-4)


def test_clm_loss_matches_hf(hf_model, params):
    rng = np.random.RandomState(3)
    ids = rng.randint(0, CFG.vocab_size, (2, 12))
    labels = ids.copy()
    labels[:, :5] = IGNORE_ID  # prompt-prefix masking
    with torch.no_grad():
        expected = hf_model(torch.tensor(ids),
                            labels=torch.tensor(labels)).loss.item()
    logits, _ = llama.forward(params, CFG, input_ids=jnp.asarray(ids))
    got = llama.clm_loss(logits, jnp.asarray(labels))
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_kv_cache_decode_matches_full_forward(params):
    """Incremental decode with the static KV cache must reproduce the
    full-sequence forward (replaces reference's dynamic torch.cat cache,
    modeling.py:186-189)."""
    rng = np.random.RandomState(4)
    ids = rng.randint(0, CFG.vocab_size, (2, 9))
    full_logits, _ = llama.forward(params, CFG, input_ids=jnp.asarray(ids))

    cache = llama.KVCache.create(CFG, batch=2, max_len=16, dtype=jnp.float32)
    # prefill on first 5 tokens
    logits, cache = llama.forward(params, CFG,
                                  input_ids=jnp.asarray(ids[:, :5]),
                                  kv_cache=cache)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full_logits[:, :5]), rtol=2e-3,
                               atol=2e-4)
    # decode one token at a time
    for t in range(5, 9):
        logits, cache = llama.forward(params, CFG,
                                      input_ids=jnp.asarray(ids[:, t:t + 1]),
                                      kv_cache=cache)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full_logits[:, t]), rtol=2e-3,
                                   atol=2e-4)
    assert int(cache.length) == 9


def test_remat_same_output(params):
    ids = jnp.asarray(np.random.RandomState(5).randint(0, 128, (1, 7)))
    a, _ = llama.forward(params, CFG, input_ids=ids, remat=False)
    b, _ = llama.forward(params, CFG, input_ids=ids, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_resize_token_embeddings(params):
    new = resize_token_embeddings(params, CFG.vocab_size + 7)
    assert new["embed_tokens"].shape == (CFG.vocab_size + 7, CFG.hidden_size)
    assert new["lm_head"].shape == (CFG.hidden_size, CFG.vocab_size + 7)
    np.testing.assert_allclose(
        np.asarray(new["embed_tokens"][-1]),
        np.asarray(params["embed_tokens"].mean(0)), rtol=1e-5)


def test_gqa_config_runs():
    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=4, num_kv_heads=2)
    p = llama.init_params(jax.random.PRNGKey(0), cfg)
    assert p["layers"]["attn"]["wk"].shape == (2, 32, 16)
    logits, _ = llama.forward(p, cfg,
                              input_ids=jnp.zeros((1, 4), jnp.int32))
    assert logits.shape == (1, 4, 64)


def test_per_row_cache_decode(params):
    """Vector cache lengths (continuous batching): two rows at different
    sequence offsets decode the same logits as the aligned scalar path."""
    rng = np.random.RandomState(8)
    ids_a = rng.randint(0, CFG.vocab_size, (1, 7))
    ids_b = rng.randint(0, CFG.vocab_size, (1, 4))

    # per-row references: full forward on each prompt
    ref_a, _ = llama.forward(params, CFG, input_ids=jnp.asarray(ids_a))
    ref_b, _ = llama.forward(params, CFG, input_ids=jnp.asarray(ids_b))

    # build a 2-slot cache: prefill each row separately then merge
    max_len = 16
    merged = llama.KVCache.create(CFG, 2, max_len, jnp.float32)
    for row, ids in ((0, ids_a), (1, ids_b)):
        c1 = llama.KVCache.create(CFG, 1, max_len, jnp.float32)
        _, c1 = llama.forward(params, CFG,
                              input_ids=jnp.asarray(ids[:, :-1]),
                              kv_cache=c1)
        merged = llama.KVCache(
            k=merged.k.at[:, row].set(c1.k[:, 0]),
            v=merged.v.at[:, row].set(c1.v[:, 0]),
            length=merged.length)
    lengths = jnp.asarray([ids_a.shape[1] - 1, ids_b.shape[1] - 1],
                          jnp.int32)
    cache = llama.KVCache(k=merged.k, v=merged.v, length=lengths)

    # one decode step with the last token of each prompt
    toks = jnp.asarray([[ids_a[0, -1]], [ids_b[0, -1]]])
    logits, cache2 = llama.forward(params, CFG, input_ids=toks,
                                   kv_cache=cache)
    np.testing.assert_allclose(np.asarray(logits[0, 0]),
                               np.asarray(ref_a[0, -1]), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits[1, 0]),
                               np.asarray(ref_b[0, -1]), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(cache2.length),
                                  np.asarray(lengths) + 1)


class TestChunkedLoss:
    def test_matches_full_logits_loss(self):
        """clm_loss_chunked(h) == clm_loss(logits_from_hidden(h)) and the
        h-gradients agree — the memory path must be a pure refactor."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from macaw_llm_tpu.config import IGNORE_ID, tiny_model_config
        from macaw_llm_tpu.models import fusion, llama
        cfg = tiny_model_config()
        params = fusion.init_params(jax.random.PRNGKey(3), cfg)["llm"]
        rng = np.random.RandomState(0)
        b, s = 2, 37  # deliberately not a chunk multiple
        h = jnp.asarray(rng.randn(b, s, cfg.llm.hidden_size) * 0.5,
                        jnp.float32)
        labels = rng.randint(0, cfg.llm.vocab_size, (b, s))
        labels[:, :5] = IGNORE_ID
        labels = jnp.asarray(labels)

        def full(h):
            return llama.clm_loss(llama.logits_from_hidden(params, h),
                                  labels)

        def chunked(h):
            return llama.clm_loss_chunked(params, h, labels, chunk=16)

        np.testing.assert_allclose(float(chunked(h)), float(full(h)),
                                   rtol=1e-6)
        gc = jax.grad(chunked)(h)
        gf = jax.grad(full)(h)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gf),
                                   rtol=1e-5, atol=1e-7)

    def test_fusion_loss_chunk_config(self):
        """cfg.loss_chunk routes fusion.forward through the chunked path
        with the same loss (logits become None)."""
        import dataclasses
        import jax
        import jax.numpy as jnp
        import numpy as np
        from macaw_llm_tpu.config import IGNORE_ID, tiny_model_config
        from macaw_llm_tpu.models import fusion
        cfg = tiny_model_config()
        params = fusion.init_params(jax.random.PRNGKey(4), cfg)
        rng = np.random.RandomState(1)
        ids = rng.randint(16, 32000, (2, 12)).astype(np.int32)
        ids[:, 0] = 1
        labels = ids.copy()
        labels[:, :3] = IGNORE_ID
        kw = dict(input_ids=jnp.asarray(ids),
                  images=jnp.zeros((2, 3, cfg.vision.image_size,
                                    cfg.vision.image_size)),
                  audios=jnp.zeros((2, 80, 3000)),
                  videos=jnp.zeros((2, cfg.fusion.n_frames, 3,
                                    cfg.vision.image_size,
                                    cfg.vision.image_size)),
                  attention_mask=jnp.ones((2, 12), jnp.int32),
                  labels=jnp.asarray(labels))
        l_full, logits = fusion.forward(params, cfg, **kw)
        ccfg = dataclasses.replace(cfg, loss_chunk=8)
        l_chunk, none_logits = fusion.forward(params, ccfg, **kw)
        assert none_logits is None
        assert logits is not None
        np.testing.assert_allclose(float(l_chunk), float(l_full),
                                   rtol=1e-6)
