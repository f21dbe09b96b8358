"""Unit tests for core ops, golden-checked against torch (CPU) where the
reference semantics come from torch modules (SURVEY §4 test plan item (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from macaw_llm_tpu.ops import (
    apply_rope, causal_mask, combine_masks, dot_product_attention,
    layer_norm, padding_mask, quick_gelu, rms_norm, rope_cos_sin,
    torch_mha_apply, torch_mha_init,
)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


class TestRMSNorm:
    def test_matches_reference_formula(self):
        # reference LlamaRMSNorm (modeling.py:302-319)
        x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
        w = np.random.RandomState(1).randn(16).astype(np.float32)
        tx = torch.tensor(x)
        var = tx.pow(2).mean(-1, keepdim=True)
        expected = torch.tensor(w) * (tx * torch.rsqrt(var + 1e-6))
        got = rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6)
        np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_stays_bf16(self):
        x = jnp.ones((2, 4, 8), jnp.bfloat16)
        w = jnp.ones((8,), jnp.float32)
        assert rms_norm(x, w).dtype == jnp.bfloat16


class TestLayerNorm:
    def test_matches_torch(self):
        x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
        ln = torch.nn.LayerNorm(16)
        with torch.no_grad():
            ln.weight.copy_(torch.randn(16))
            ln.bias.copy_(torch.randn(16))
        expected = ln(torch.tensor(x)).detach().numpy()
        got = layer_norm(jnp.asarray(x), t2j(ln.weight), t2j(ln.bias), ln.eps)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5,
                                   atol=1e-5)


class TestRoPE:
    def test_rotation_preserves_norm(self):
        q = jnp.asarray(np.random.RandomState(0).randn(1, 7, 2, 8),
                        jnp.float32)
        cos, sin = rope_cos_sin(jnp.arange(7), 8)
        q2, _ = apply_rope(q, q, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(q), axis=-1),
            np.linalg.norm(np.asarray(q2), axis=-1), rtol=1e-5)

    def test_matches_reference_rotate_half(self):
        # reference apply_rotary_pos_emb (modeling.py:76-91)
        rng = np.random.RandomState(0)
        d = 8
        q = rng.randn(1, 5, 1, d).astype(np.float32)
        pos = np.arange(5)
        inv_freq = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
        freqs = np.einsum("i,j->ij", pos, inv_freq)
        emb = np.concatenate([freqs, freqs], axis=-1)
        tcos, tsin = np.cos(emb), np.sin(emb)

        def rotate_half(x):
            x1, x2 = x[..., :d // 2], x[..., d // 2:]
            return np.concatenate([-x2, x1], axis=-1)

        expected = q * tcos[None, :, None, :] + \
            rotate_half(q) * tsin[None, :, None, :]
        cos, sin = rope_cos_sin(jnp.arange(5), d)
        got, _ = apply_rope(jnp.asarray(q), jnp.asarray(q), cos, sin)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5,
                                   atol=1e-6)

    def test_position_offset_for_kv_cache(self):
        # decode step at position p must match full-sequence row p
        q = jnp.asarray(np.random.RandomState(0).randn(1, 9, 2, 8),
                        jnp.float32)
        cos, sin = rope_cos_sin(jnp.arange(9), 8)
        full, _ = apply_rope(q, q, cos, sin)
        cos1, sin1 = rope_cos_sin(jnp.asarray([5]), 8)
        one, _ = apply_rope(q[:, 5:6], q[:, 5:6], cos1, sin1)
        np.testing.assert_allclose(np.asarray(full[:, 5:6]), np.asarray(one),
                                   rtol=1e-5, atol=1e-6)


class TestMasks:
    def test_causal(self):
        m = np.asarray(causal_mask(4, 4))[0, 0]
        assert (m[0, 1:] < -1e30).all()
        assert (np.triu(np.ones((4, 4)), 1) == (m < -1e30)).all()

    def test_causal_with_past(self):
        # q_len 2, kv_len 6 => queries are positions 4,5
        m = np.asarray(causal_mask(2, 6))[0, 0]
        assert (m[0, :5] == 0).all() and m[0, 5] < -1e30
        assert (m[1, :6] == 0).all()

    def test_padding(self):
        am = jnp.asarray([[1, 1, 0]])
        m = np.asarray(padding_mask(am, 2))
        assert m.shape == (1, 1, 2, 3)
        assert (m[0, 0, :, :2] == 0).all() and (m[0, 0, :, 2] < -1e30).all()

    def test_combine_clamps(self):
        c = causal_mask(3, 3)
        p = padding_mask(jnp.asarray([[1, 0, 0]]), 3)
        out = np.asarray(combine_masks(c, p))
        assert np.isfinite(out).all()


class TestQuickGELU:
    def test_matches_torch_sigmoid_form(self):
        x = torch.randn(64)
        expected = (x * torch.sigmoid(1.702 * x)).numpy()
        np.testing.assert_allclose(
            np.asarray(quick_gelu(t2j(x))), expected, rtol=1e-5, atol=1e-6)


class TestDotProductAttention:
    def test_matches_torch_sdpa(self):
        rng = np.random.RandomState(0)
        q = rng.randn(2, 5, 2, 8).astype(np.float32)
        k = rng.randn(2, 7, 2, 8).astype(np.float32)
        v = rng.randn(2, 7, 2, 8).astype(np.float32)
        tq = torch.tensor(q).permute(0, 2, 1, 3)
        tk = torch.tensor(k).permute(0, 2, 1, 3)
        tv = torch.tensor(v).permute(0, 2, 1, 3)
        expected = torch.nn.functional.scaled_dot_product_attention(
            tq, tk, tv).permute(0, 2, 1, 3).numpy()
        got = dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4,
                                   atol=1e-5)

    def test_causal_masking(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(1, 4, 1, 8), jnp.float32)
        k = jnp.asarray(rng.randn(1, 4, 1, 8), jnp.float32)
        v = jnp.asarray(rng.randn(1, 4, 1, 8), jnp.float32)
        out = dot_product_attention(q, k, v, causal_mask(4, 4))
        # row 0 attends only to kv 0 => equals v[0]
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                                   np.asarray(v[0, 0, 0]), rtol=1e-5)


class TestTorchMHAParity:
    """The alignment attention (reference modeling.py:879-910) is
    torch.nn.MultiheadAttention(add_bias_kv=True, add_zero_attn=True)."""

    @pytest.mark.parametrize("heads,add_bias_kv", [(4, True), (2, False)])
    def test_cross_attention_parity(self, heads, add_bias_kv):
        e, sq, sk, b = 16, 3, 11, 2
        torch.manual_seed(0)
        mha = torch.nn.MultiheadAttention(
            e, heads, dropout=0.0, add_bias_kv=add_bias_kv,
            add_zero_attn=True, batch_first=True)
        mha.eval()
        rng = np.random.RandomState(1)
        q = rng.randn(b, sq, e).astype(np.float32)
        k = rng.randn(b, sk, e).astype(np.float32)
        v = k.copy()
        with torch.no_grad():
            expected, _ = mha(torch.tensor(q), torch.tensor(k),
                              torch.tensor(v))
        params = {
            "in_proj_w": t2j(mha.in_proj_weight),
            "in_proj_b": t2j(mha.in_proj_bias),
            "out_proj_w": t2j(mha.out_proj.weight),
            "out_proj_b": t2j(mha.out_proj.bias),
        }
        if add_bias_kv:
            params["bias_k"] = t2j(mha.bias_k)[0, 0]
            params["bias_v"] = t2j(mha.bias_v)[0, 0]
        got = torch_mha_apply(params, heads, jnp.asarray(q), jnp.asarray(k),
                              jnp.asarray(v), add_zero_attn=True)
        np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_init_shapes(self):
        p = torch_mha_init(jax.random.PRNGKey(0), 16, 4)
        assert p["in_proj_w"].shape == (48, 16)
        assert p["bias_k"].shape == (16,)


class TestDropoutAttentionChunked:
    """Streaming attention-prob dropout (training path of the fusion
    attentions): must equal the materializing implementation."""

    def _ref_with_masks(self, qh, kh, vh, scale, rate, rng, chunk):
        """Materializing reference applying the SAME per-chunk masks."""
        import jax
        shared = kh.ndim == 3
        sk = kh.shape[0] if shared else kh.shape[1]
        eq = "bqnd,knd->bnqk" if shared else "bqnd,bknd->bnqk"
        logits = jnp.einsum(eq, qh, kh,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        keeps = []
        for c in range(sk // chunk):
            shape = probs.shape[:-1] + (chunk,)
            keeps.append(jax.random.bernoulli(
                jax.random.fold_in(rng, c), 1.0 - rate, shape))
        keep = jnp.concatenate(keeps, axis=-1)
        probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
        eq2 = "bnqk,knd->bqnd" if shared else "bnqk,bknd->bqnd"
        return jnp.einsum(eq2, probs, vh)

    def test_zero_rate_matches_plain_attention(self):
        from macaw_llm_tpu.ops.attention import (dot_product_attention,
                                                 dropout_attention_chunked)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 7, 2, 16) * 0.5, jnp.float32)
        k = jnp.asarray(rng.randn(2, 300, 2, 16) * 0.5, jnp.float32)
        v = jnp.asarray(rng.randn(2, 300, 2, 16) * 0.5, jnp.float32)
        ref = dot_product_attention(q, k, v, scale=0.25)
        got = dropout_attention_chunked(q, k, v, scale=0.25, rate=0.0,
                                        rng=jax.random.PRNGKey(0),
                                        chunk=128)  # 300 pads to 384
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_matches_materializing_dropout_batched(self):
        from macaw_llm_tpu.ops.attention import dropout_attention_chunked
        rng = np.random.RandomState(1)
        key = jax.random.PRNGKey(7)
        q = jnp.asarray(rng.randn(2, 5, 2, 16) * 0.5, jnp.float32)
        k = jnp.asarray(rng.randn(2, 256, 2, 16) * 0.5, jnp.float32)
        v = jnp.asarray(rng.randn(2, 256, 2, 16) * 0.5, jnp.float32)
        ref = self._ref_with_masks(q, k, v, 0.25, 0.1, key, 128)
        got = dropout_attention_chunked(q, k, v, scale=0.25, rate=0.1,
                                        rng=key, chunk=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_matches_materializing_dropout_shared_kv_and_grads(self):
        from macaw_llm_tpu.ops.attention import dropout_attention_chunked
        rng = np.random.RandomState(2)
        key = jax.random.PRNGKey(9)
        q = jnp.asarray(rng.randn(2, 4, 2, 16) * 0.5, jnp.float32)
        k = jnp.asarray(rng.randn(384, 2, 16) * 0.5, jnp.float32)
        v = jnp.asarray(rng.randn(384, 2, 16) * 0.5, jnp.float32)

        def f_chunk(q, k, v):
            return dropout_attention_chunked(
                q, k, v, scale=0.25, rate=0.1, rng=key, chunk=128).sum()

        def f_ref(q, k, v):
            return self._ref_with_masks(q, k, v, 0.25, 0.1, key, 128).sum()

        np.testing.assert_allclose(float(f_chunk(q, k, v)),
                                   float(f_ref(q, k, v)), rtol=1e-4)
        gc = jax.grad(f_chunk, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gc, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5,
                                       err_msg=f"d{name}")

    @pytest.mark.medium  # 4000-sample Monte-Carlo expectation: minutes
    def test_mha_dropout_expectation(self):
        """torch_mha_apply's dropout path (now chunked) keeps the
        no-dropout output in expectation."""
        from macaw_llm_tpu.ops.attention import (torch_mha_apply,
                                                 torch_mha_init)
        params = torch_mha_init(jax.random.PRNGKey(0), 32, 2)
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 20, 32) * 0.5, jnp.float32)
        base = torch_mha_apply(params, 2, x, x, x)
        outs = [torch_mha_apply(params, 2, x, x, x, dropout_rate=0.1,
                                dropout_rng=jax.random.PRNGKey(i))
                for i in range(30)]
        mean = jnp.stack(outs).mean(0)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(base),
                                   rtol=0.2, atol=0.05)
