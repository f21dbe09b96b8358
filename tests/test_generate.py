"""Greedy generation parity vs HF generate (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from macaw_llm_tpu.config import LlamaConfig
from macaw_llm_tpu.generate import generate, generate_from_ids
from macaw_llm_tpu.models import llama
from macaw_llm_tpu.utils.hf_import import import_llama

CFG = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4, max_position_embeddings=256,
                  eos_token_id=2, pad_token_id=0)


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
        attention_bias=False, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=2, bos_token_id=1,
        attn_implementation="eager")
    torch.manual_seed(0)
    m = LlamaForCausalLM(hf_cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(hf_model):
    return import_llama(hf_model.state_dict(), CFG)


def test_greedy_matches_hf_from_embeds(hf_model, params):
    """Reference decode: generate(inputs_embeds=..., max_new_tokens=...,
    eos=2, pad=...) (modeling.py:959)."""
    rng = np.random.RandomState(0)
    embeds = (rng.randn(2, 7, CFG.hidden_size) * 0.02).astype(np.float32)
    with torch.no_grad():
        expected = hf_model.generate(
            inputs_embeds=torch.tensor(embeds), max_new_tokens=12,
            do_sample=False, eos_token_id=2, pad_token_id=0).numpy()
    got = generate(params, CFG, inputs_embeds=jnp.asarray(embeds),
                   max_new_tokens=12, eos_id=2, pad_id=0)
    # HF returns only generated ids when fed inputs_embeds
    exp = expected[:, :12]
    np.testing.assert_array_equal(np.asarray(got.tokens)[:, :exp.shape[1]],
                                  exp)


def test_greedy_matches_hf_from_ids(hf_model, params):
    rng = np.random.RandomState(1)
    ids = rng.randint(3, CFG.vocab_size, (2, 6))
    with torch.no_grad():
        expected = hf_model.generate(
            input_ids=torch.tensor(ids), max_new_tokens=10,
            do_sample=False, eos_token_id=2, pad_token_id=0).numpy()
    got = generate_from_ids(params, CFG, input_ids=jnp.asarray(ids),
                            max_new_tokens=10, eos_id=2, pad_id=0)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  expected[:, 6:])


def test_greedy_with_left_padding(hf_model, params):
    """Padded batch decode with positions from mask cumsum
    (reference modeling.py:630-636)."""
    rng = np.random.RandomState(2)
    ids = rng.randint(3, CFG.vocab_size, (2, 6))
    ids[0, :2] = 0
    mask = np.ones((2, 6), np.int64)
    mask[0, :2] = 0
    with torch.no_grad():
        expected = hf_model.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask), max_new_tokens=8,
            do_sample=False, eos_token_id=2, pad_token_id=0).numpy()
    got = generate_from_ids(params, CFG, input_ids=jnp.asarray(ids),
                            attention_mask=jnp.asarray(mask),
                            max_new_tokens=8, eos_id=2, pad_id=0)
    np.testing.assert_array_equal(np.asarray(got.tokens), expected[:, 6:])


def test_eos_early_stop(params):
    """Rows that hit EOS emit PAD afterwards and the loop exits early."""
    rng = np.random.RandomState(7)
    embeds = jnp.asarray(rng.randn(1, 3, CFG.hidden_size) * 0.02,
                         jnp.float32)
    # find whatever greedy emits first, then declare it the EOS token
    probe = generate(params, CFG, inputs_embeds=embeds, max_new_tokens=4,
                     eos_id=-1, pad_id=0)
    first = int(np.asarray(probe.tokens)[0, 0])
    got = generate(params, CFG, inputs_embeds=embeds, max_new_tokens=16,
                   eos_id=first, pad_id=0)
    toks = np.asarray(got.tokens)
    assert toks[0, 0] == first
    assert (toks[0, 1:] == 0).all()
    assert int(got.num_steps) == 1


def test_sampling_runs_and_respects_vocab(params):
    got = generate(params, CFG,
                   inputs_embeds=jnp.zeros((2, 3, CFG.hidden_size)),
                   max_new_tokens=8, temperature=0.8, top_k=10,
                   eos_id=2, pad_id=0, rng=jax.random.PRNGKey(0))
    toks = np.asarray(got.tokens)
    assert ((toks >= 0) & (toks < CFG.vocab_size)).all()


def test_beam_search_matches_hf(hf_model, params):
    from macaw_llm_tpu.generate import beam_search
    rng = np.random.RandomState(3)
    embeds = (rng.randn(2, 5, CFG.hidden_size) * 0.02).astype(np.float32)
    with torch.no_grad():
        expected = hf_model.generate(
            inputs_embeds=torch.tensor(embeds), max_new_tokens=10,
            num_beams=3, do_sample=False, eos_token_id=2,
            pad_token_id=0, early_stopping=True,
            length_penalty=1.0).numpy()
    got = beam_search(params, CFG, inputs_embeds=jnp.asarray(embeds),
                      num_beams=3, max_new_tokens=10, eos_id=2, pad_id=0)
    np.testing.assert_array_equal(
        np.asarray(got.tokens)[:, :expected.shape[1]], expected[:, :10])


def test_beam_one_equals_greedy(params):
    from macaw_llm_tpu.generate import beam_search
    rng = np.random.RandomState(4)
    embeds = jnp.asarray(rng.randn(2, 4, CFG.hidden_size) * 0.02,
                         jnp.float32)
    g = generate(params, CFG, inputs_embeds=embeds, max_new_tokens=8,
                 eos_id=2, pad_id=0)
    bm = beam_search(params, CFG, inputs_embeds=embeds, num_beams=1,
                     max_new_tokens=8, eos_id=2, pad_id=0)
    np.testing.assert_array_equal(np.asarray(g.tokens),
                                  np.asarray(bm.tokens))


def test_right_padded_prompt_matches_unpadded(params):
    """Right-padded prompts must generate the same tokens as the unpadded
    prompt (the first token samples at the last VALID position — HF and
    the reference sample at the pad slot; deliberate fix)."""
    rng = np.random.RandomState(9)
    ids = rng.randint(3, CFG.vocab_size, (1, 5))
    ref = generate_from_ids(params, CFG, input_ids=jnp.asarray(ids),
                            max_new_tokens=6, eos_id=2, pad_id=0)
    padded = np.concatenate([ids, np.zeros((1, 3), ids.dtype)], axis=1)
    mask = np.array([[1] * 5 + [0] * 3])
    got = generate_from_ids(params, CFG, input_ids=jnp.asarray(padded),
                            attention_mask=jnp.asarray(mask),
                            max_new_tokens=6, eos_id=2, pad_id=0)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))


class TestPerRequestSemantics:
    """Per-row temperature and token budgets in one batched decode."""

    def test_per_row_budgets_pad_and_early_exit(self, params):
        rng = np.random.RandomState(1)
        embeds = jnp.asarray(
            (rng.randn(3, 5, CFG.hidden_size) * 0.02).astype(np.float32))
        out = generate(params, CFG, inputs_embeds=embeds,
                       max_new_tokens=16, eos_id=-1, pad_id=-7,
                       budgets=jnp.asarray([2, 5, 1], np.int32))
        toks = np.asarray(out.tokens)
        assert (toks[0, 2:] == -7).all() and (toks[0, :2] != -7).all()
        assert (toks[1, 5:] == -7).all() and (toks[1, :5] != -7).all()
        assert (toks[2, 1:] == -7).all()
        # loop exits at the longest requested budget, not max_new_tokens
        assert int(out.num_steps) == 5

    def test_greedy_row_unaffected_by_sampling_row(self, params):
        """A temperature=0 row batched with a hot sampling row must decode
        exactly as if it were alone (ADVICE serve.py:170)."""
        rng = np.random.RandomState(2)
        e = (rng.randn(2, 6, CFG.hidden_size) * 0.02).astype(np.float32)
        solo = generate(params, CFG,
                        inputs_embeds=jnp.asarray(e[:1]),
                        max_new_tokens=10, eos_id=2, pad_id=0)
        mixed = generate(params, CFG, inputs_embeds=jnp.asarray(e),
                         max_new_tokens=10, eos_id=2, pad_id=0,
                         temperature=jnp.asarray([0.0, 1.5], np.float32),
                         rng=jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(mixed.tokens)[0],
                                      np.asarray(solo.tokens)[0])

    def test_sampling_rows_vary_with_seed(self, params):
        rng = np.random.RandomState(3)
        e = jnp.asarray(
            (rng.randn(1, 6, CFG.hidden_size) * 0.02).astype(np.float32))
        outs = [np.asarray(generate(
            params, CFG, inputs_embeds=e, max_new_tokens=12, eos_id=-1,
            pad_id=0, temperature=jnp.asarray([2.0], np.float32),
            rng=jax.random.PRNGKey(s)).tokens) for s in range(4)]
        assert any(not np.array_equal(outs[0], o) for o in outs[1:])


class TestInt8KVCache:
    """Quantized KV cache (llama.KVCache dtype=int8): half the decode
    attention HBM read; logits must stay close to the bf16-cache path."""

    def test_prefill_and_decode_logits_close(self, params):
        rng = np.random.RandomState(1)
        ids = rng.randint(3, 120, (2, 9)).astype(np.int32)
        cache = llama.KVCache.create(CFG, 2, 12, "int8")
        assert cache.k.dtype == jnp.int8 and cache.k_scale is not None
        lq, cache = llama.forward(params, CFG, input_ids=jnp.asarray(ids),
                                  kv_cache=cache)
        lref, _ = llama.forward(params, CFG, input_ids=jnp.asarray(ids))
        scale = np.abs(np.asarray(lref)).max()
        assert np.abs(np.asarray(lq) - np.asarray(lref)).max() \
            <= 0.03 * scale
        # one decode step against the quantized cache
        tok = rng.randint(3, 120, (2, 1)).astype(np.int32)
        ld, cache = llama.forward(params, CFG, input_ids=jnp.asarray(tok),
                                  kv_cache=cache)
        full = np.concatenate([ids, tok], axis=1)
        lfull, _ = llama.forward(params, CFG, input_ids=jnp.asarray(full))
        assert int(cache.length) == 10
        diff = np.abs(np.asarray(ld[:, 0]) - np.asarray(lfull[:, -1]))
        assert diff.max() <= 0.03 * scale

    def test_generate_with_int8_cache_matches_bf16(self, params):
        """Greedy tokens through the int8 cache must match the exact-cache
        path on a well-separated model (tiny random logits are nearly
        uniform, so compare token-by-token with a tolerance on count)."""
        rng = np.random.RandomState(2)
        embeds = (rng.randn(2, 7, CFG.hidden_size) * 0.02).astype(
            np.float32)
        ref = generate(params, CFG, inputs_embeds=jnp.asarray(embeds),
                       max_new_tokens=12, eos_id=2, pad_id=0)
        got = generate(params, CFG, inputs_embeds=jnp.asarray(embeds),
                       max_new_tokens=12, eos_id=2, pad_id=0,
                       cache_dtype="int8")
        r = np.asarray(ref.tokens)
        g = np.asarray(got.tokens)
        assert g.shape == r.shape
        # quantization noise may flip a near-tie; the vast majority of
        # greedy tokens must agree
        agree = (g == r).mean()
        assert agree >= 0.75, (agree, r, g)
