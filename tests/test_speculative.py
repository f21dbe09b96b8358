"""Speculative decoding: output must be IDENTICAL to plain greedy
``generate`` for ANY draft quality (rejected drafts fall back to the
verified token), and the oracle proposer must compress rounds by ~k+1.

Tiny config on CPU; covers the per-row vector-cache verify path
(s = draft_len + 1 writes at per-row offsets) added in llama.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macaw_llm_tpu.config import tiny_model_config
from macaw_llm_tpu.generate import (_ngram_propose, generate,
                                    generate_speculative)
from macaw_llm_tpu.models import llama

PAD = 32006


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config().llm
    params = llama.init_params(jax.random.PRNGKey(0), cfg,
                               param_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    b, s = 3, 24
    ids = rng.randint(16, cfg.vocab_size - 16, (b, s)).astype(np.int32)
    ids[:, 0] = 1
    # right-pad row 1 (exercises masked prefill + per-row last-valid)
    mask = np.ones((b, s), np.int32)
    mask[1, -5:] = 0
    ids[1, -5:] = PAD
    embeds = llama.embed(params, jnp.asarray(ids))
    return cfg, params, jnp.asarray(ids), jnp.asarray(mask), embeds


def _greedy(cfg, params, embeds, mask, n):
    return generate(params, cfg, inputs_embeds=embeds,
                    attention_mask=mask, max_new_tokens=n, eos_id=-1)


def test_ngram_proposer_finds_repeat():
    hist = jnp.asarray([[5, 6, 7, 8, 9, 5, 6, PAD, PAD, PAD]],
                       jnp.int32)
    # suffix [5, 6] at positions 5-6 recurs at 0-1 -> propose 7, 8, 9
    out = _ngram_propose(hist, jnp.asarray([7]), draft_len=3, ngram=2,
                         pad_id=PAD)
    np.testing.assert_array_equal(np.asarray(out), [[7, 8, 9]])


def test_ngram_proposer_no_match_is_pad():
    hist = jnp.asarray([[3, 4, 5, 6, PAD, PAD]], jnp.int32)
    out = _ngram_propose(hist, jnp.asarray([4]), draft_len=2, ngram=2,
                         pad_id=PAD)
    np.testing.assert_array_equal(np.asarray(out), [[PAD, PAD]])


def test_speculative_matches_greedy_ngram(setup):
    cfg, params, ids, mask, embeds = setup
    n = 16
    ref = _greedy(cfg, params, embeds, mask, n)
    out = generate_speculative(params, cfg, inputs_embeds=embeds,
                               prompt_ids=ids, attention_mask=mask,
                               max_new_tokens=n, eos_id=-1,
                               draft_len=4, ngram=2)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))
    assert int(out.num_steps) <= n


def test_oracle_proposer_compresses_rounds(setup):
    cfg, params, ids, mask, embeds = setup
    n = 16
    ref = _greedy(cfg, params, embeds, mask, n)
    out = generate_speculative(params, cfg, inputs_embeds=embeds,
                               prompt_ids=ids, attention_mask=mask,
                               max_new_tokens=n, eos_id=-1,
                               draft_len=3, proposer="oracle",
                               oracle_tokens=ref.tokens)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))
    # acceptance == 1.0: every round emits draft_len + 1 tokens
    assert int(out.num_steps) == -(-n // 4)


def test_speculative_int8_cache_matches(setup):
    cfg, params, ids, mask, embeds = setup
    n = 12
    ref = generate_speculative(params, cfg, inputs_embeds=embeds,
                               prompt_ids=ids, attention_mask=mask,
                               max_new_tokens=n, eos_id=-1, draft_len=4)
    out = generate_speculative(params, cfg, inputs_embeds=embeds,
                               prompt_ids=ids, attention_mask=mask,
                               max_new_tokens=n, eos_id=-1, draft_len=4,
                               cache_dtype="int8")
    # int8 cache perturbs logits ~0.2%; greedy tokens may legitimately
    # flip on near-ties with random weights — require >= 80% agreement
    agree = (np.asarray(ref.tokens) == np.asarray(out.tokens)).mean()
    assert agree >= 0.8, agree


def test_speculative_eos_stops_row(setup):
    """Force EOS as the most likely token after a few steps by biasing
    lm_head toward one id; every row must emit PAD after its EOS."""
    cfg, params, ids, mask, embeds = setup
    n = 12
    eos = 7
    ref = _greedy(cfg, params, embeds, mask, n)._replace()
    out = generate_speculative(params, cfg, inputs_embeds=embeds,
                               prompt_ids=ids, attention_mask=mask,
                               max_new_tokens=n, eos_id=eos,
                               draft_len=4)
    toks = np.asarray(out.tokens)
    gref = np.asarray(generate(params, cfg, inputs_embeds=embeds,
                               attention_mask=mask, max_new_tokens=n,
                               eos_id=eos).tokens)
    np.testing.assert_array_equal(toks, gref)
    for row in toks:
        hits = np.where(row == eos)[0]
        if hits.size:
            assert (row[hits[0] + 1:] == PAD).all()
