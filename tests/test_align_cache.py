"""Alignment K/V cache + tower flash attention parity.

The cache precomputes the weight-only K/V projections of the alignment
attention (reference modeling.py:974-1026 projects the repeated vocab
memory every forward); ``prepare_inputs(align_cache=...)`` must reproduce
the uncached output exactly (bf16 cache) / closely (int8 cache).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macaw_llm_tpu.config import tiny_model_config
from macaw_llm_tpu.models import fusion
from macaw_llm_tpu.ops.attention import (mha_apply, mha_init,
                                         shared_kv_project,
                                         torch_mha_apply, torch_mha_init)

pytestmark = pytest.mark.medium  # full fusion-forward parity compiles: minutes


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config()
    params = fusion.init_params(jax.random.PRNGKey(0), cfg)
    b, s = 2, 16
    rng = np.random.RandomState(0)
    ids = rng.randint(16, 32000, (b, s)).astype(np.int32)
    ids[:, 0] = 1
    vis = cfg.vision
    batch = dict(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((b, s), jnp.int32),
        images=jnp.asarray(rng.randn(b, 3, vis.image_size, vis.image_size),
                           jnp.float32),
        audios=jnp.asarray(rng.randn(b, 80, 3000), jnp.float32),
        videos=jnp.asarray(
            rng.randn(b, cfg.fusion.n_frames, 3, vis.image_size,
                      vis.image_size), jnp.float32),
    )
    return cfg, params, batch


def _prep(cfg, params, batch, cache):
    return fusion.prepare_inputs(
        params, cfg, input_ids=batch["input_ids"], images=batch["images"],
        audios=batch["audios"], videos=batch["videos"],
        attention_mask=batch["attention_mask"], align_cache=cache)


def test_bf16_cache_matches_uncached(setup):
    cfg, params, batch = setup
    ref = _prep(cfg, params, batch, None)
    cache = fusion.precompute_align_cache(params, cfg)
    got = _prep(cfg, params, batch, cache)
    np.testing.assert_allclose(np.asarray(got.inputs_embeds),
                               np.asarray(ref.inputs_embeds),
                               rtol=1e-5, atol=1e-5)


def test_int8_cache_close_to_uncached(setup):
    cfg, params, batch = setup
    ref = _prep(cfg, params, batch, None)
    cache = fusion.precompute_align_cache(params, cfg, quantize=True)
    got = _prep(cfg, params, batch, cache)
    r = np.asarray(ref.inputs_embeds)
    g = np.asarray(got.inputs_embeds)
    # int8 per-row quantization of the K/V rows perturbs the alignment
    # output slightly; prefix rows must stay within ~1% of the fp32 scale
    scale = np.abs(r).max()
    assert np.abs(g - r).max() <= 0.02 * scale
    # text rows (straight embedding lookups) are untouched by the cache
    prefix = cfg.total_prefix_len
    np.testing.assert_array_equal(g[:, prefix + 1:], r[:, prefix + 1:])


def test_strip_align_kv_slims_and_cache_path_still_works(setup):
    cfg, params, batch = setup
    cache = fusion.precompute_align_cache(params, cfg)
    ref = _prep(cfg, params, batch, cache)
    slim = fusion.strip_align_kv(params)
    e = cfg.llm.hidden_size
    for mod in ("image", "audio", "video"):
        assert slim["fusion"][f"{mod}_align"]["in_proj_w"].shape == (e, e)
        # original tree untouched
        assert params["fusion"][f"{mod}_align"]["in_proj_w"].shape == \
            (3 * e, e)
    got = _prep(cfg, slim, batch, cache)
    np.testing.assert_allclose(np.asarray(got.inputs_embeds),
                               np.asarray(ref.inputs_embeds),
                               rtol=1e-6, atol=1e-6)


def test_bf16_cache_forward_identical_under_dropout(setup):
    """The bf16 cache is bit-exact in the FORWARD pass even on the
    training (dropout) path — the cached rows equal the recomputed
    projections exactly. (Gradient semantics differ: see
    test_cache_freezes_align_kv.)"""
    cfg, params, batch = setup
    cfg = dataclasses.replace(
        cfg, fusion=dataclasses.replace(cfg.fusion, align_dropout=0.1))
    rng = jax.random.PRNGKey(7)
    ref = fusion.prepare_inputs(
        params, cfg, input_ids=batch["input_ids"], images=batch["images"],
        audios=batch["audios"], videos=batch["videos"],
        attention_mask=batch["attention_mask"], dropout_rng=rng)
    cache = fusion.precompute_align_cache(params, cfg)
    got = fusion.prepare_inputs(
        params, cfg, input_ids=batch["input_ids"], images=batch["images"],
        audios=batch["audios"], videos=batch["videos"],
        attention_mask=batch["attention_mask"], dropout_rng=rng,
        align_cache=cache)
    np.testing.assert_array_equal(np.asarray(got.inputs_embeds),
                                  np.asarray(ref.inputs_embeds))


def test_cache_freezes_align_kv(setup):
    """Contract (ADVICE r2, high): training WITH an align cache freezes
    the align in-proj K/V rows + bias_k/bias_v — their gradients are
    exactly zero (so the precomputed cache can never go stale) — while
    the Q rows and out-proj still receive gradients through the query
    path. Training WITHOUT a cache gradients the K/V rows too (the
    reference's behavior)."""
    cfg, params, batch = setup
    cfg = dataclasses.replace(
        cfg, fusion=dataclasses.replace(cfg.fusion, align_dropout=0.1))
    rng = jax.random.PRNGKey(9)
    cache = fusion.precompute_align_cache(params, cfg)
    e = cfg.llm.hidden_size

    def loss(fusion_params, align_cache):
        p = dict(params)
        p["fusion"] = fusion_params
        out = fusion.prepare_inputs(
            p, cfg, input_ids=batch["input_ids"], images=batch["images"],
            audios=batch["audios"], videos=batch["videos"],
            attention_mask=batch["attention_mask"], dropout_rng=rng,
            align_cache=align_cache)
        return jnp.sum(out.inputs_embeds.astype(jnp.float32) ** 2)

    g_cached = jax.grad(loss)(params["fusion"], cache)
    g_free = jax.grad(loss)(params["fusion"], None)
    for mod in ("image_align", "audio_align", "video_align"):
        gc, gf = g_cached[mod], g_free[mod]
        # cached: K/V rows + bias_k/v frozen (zero grads) ...
        np.testing.assert_array_equal(np.asarray(gc["in_proj_w"][e:]), 0.0)
        np.testing.assert_array_equal(np.asarray(gc["in_proj_b"][e:]), 0.0)
        np.testing.assert_array_equal(np.asarray(gc["bias_k"]), 0.0)
        np.testing.assert_array_equal(np.asarray(gc["bias_v"]), 0.0)
        # ... while Q rows and out-proj still train
        assert np.abs(np.asarray(gc["in_proj_w"][:e])).max() > 0
        assert np.abs(np.asarray(gc["out_proj_w"])).max() > 0
        # uncached: gradients reach the K/V rows (full alignment training)
        assert np.abs(np.asarray(gf["in_proj_w"][e:])).max() > 0
        assert np.abs(np.asarray(gf["bias_k"])).max() > 0


def test_pack_towers_parity(setup):
    """Packed tower qkv (one [h, 3h] in-proj per layer) is the same math
    as the separate q/k/v projections — outputs must match exactly
    (matmul columns are independent)."""
    cfg, params, batch = setup
    ref = _prep(cfg, params, batch, None)
    packed = fusion.pack_towers(params)
    for tower in ("image_encoder", "video_encoder", "audio_encoder"):
        attn = packed[tower]["layers"]["attn"]
        assert "qkv" in attn and "q" not in attn
        # original tree untouched
        assert "q" in params[tower]["layers"]["attn"]
    got = _prep(cfg, packed, batch, None)
    np.testing.assert_allclose(np.asarray(got.inputs_embeds),
                               np.asarray(ref.inputs_embeds),
                               rtol=1e-6, atol=1e-6)


def test_shared_kv_project_matches_inline():
    p = torch_mha_init(jax.random.PRNGKey(1), 32, 4)
    mem = jax.random.normal(jax.random.PRNGKey(2), (64, 32))
    k, v = shared_kv_project(p, mem, add_zero_attn=True)
    e = 32
    w, b = p["in_proj_w"], p["in_proj_b"]
    k_ref = jnp.concatenate([mem @ w[e:2 * e].T + b[e:2 * e],
                             p["bias_k"][None], jnp.zeros((1, e))], axis=0)
    v_ref = jnp.concatenate([mem @ w[2 * e:].T + b[2 * e:],
                             p["bias_v"][None], jnp.zeros((1, e))], axis=0)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-6)


class TestTowerFlash:
    """use_flash routing in the tower attention ops (interpret mode on
    CPU) must match the einsum path, including non-128 head dims."""

    def test_mha_apply_flash_parity(self):
        p = mha_init(jax.random.PRNGKey(3), 48, 4)  # d=12, needs lane pad
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 37, 48))
        ref = mha_apply(p, 4, x)
        got = mha_apply(p, 4, x, use_flash=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_torch_mha_apply_flash_parity(self):
        p = torch_mha_init(jax.random.PRNGKey(5), 48, 4)
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 29, 48))
        ref = torch_mha_apply(p, 4, x, x, x)
        got = torch_mha_apply(p, 4, x, x, x, use_flash=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_flash_ignored_under_dropout(self):
        p = torch_mha_init(jax.random.PRNGKey(5), 48, 4)
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 9, 48))
        rng = jax.random.PRNGKey(8)
        ref = torch_mha_apply(p, 4, x, x, x, dropout_rate=0.25,
                              dropout_rng=rng)
        got = torch_mha_apply(p, 4, x, x, x, dropout_rate=0.25,
                              dropout_rng=rng, use_flash=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
