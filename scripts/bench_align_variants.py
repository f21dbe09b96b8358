"""Alignment-attention variants on the real chip (7b, b16).

The 3 alignment attentions over the 32010-row vocab memory cost ~28 ms
standalone, vs ~8 ms of roofline (compute + K/V reads). Suspect: Pallas
grid-step overhead — 3 calls x 16 heads x 32 K-blocks = 1536 sequential
block invocations. Sweeps block_k and tests an einsum-over-int8 variant
for the tiny-query modalities.

Usage: python scripts/bench_align_variants.py
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from macaw_llm_tpu.config import macaw_7b
from macaw_llm_tpu.models import fusion
from macaw_llm_tpu.ops import torch_mha_init
from macaw_llm_tpu.ops.pallas.flash_attention import flash_attention


def _readback(out):
    return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def timeit(name, fn, steps=8):
    fn()
    _readback(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn()
    _readback(out)
    dt = (time.perf_counter() - t0) / steps * 1000
    print(f"{name:56s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()

    import dataclasses
    cfg = dataclasses.replace(macaw_7b(), dtype="bfloat16")
    b = args.batch
    e = cfg.llm.hidden_size
    heads = cfg.fusion.attention_heads * 2       # 16
    d = e // heads                               # 256

    def _init(key):
        ks = jax.random.split(key, 5)
        prm = {"fusion": {}, "llm": {"embed_tokens": jax.random.normal(
            ks[0], (cfg.llm.padded_vocab, e), jnp.bfloat16) * 0.02}}
        for i, mod in enumerate(("image", "audio", "video")):
            prm["fusion"][f"{mod}_align"] = torch_mha_init(
                jax.random.fold_in(ks[1], i), e, heads,
                param_dtype=jnp.bfloat16)
        cache = fusion.precompute_align_cache(prm, cfg, quantize=True)
        return prm, cache

    params, cache = jax.jit(_init)(jax.random.PRNGKey(0))
    jax.block_until_ready((params, cache))

    rng = np.random.RandomState(0)
    feats = {
        "image": jnp.asarray(rng.randn(b, 5, e), jnp.bfloat16),
        "audio": jnp.asarray(rng.randn(b, 6, e), jnp.bfloat16),
        "video": jnp.asarray(rng.randn(b, 39, e), jnp.bfloat16),
    }

    # per-modality flash (current path)
    for mod in ("image", "audio", "video"):
        fn = jax.jit(lambda p, c, f, m=mod: fusion._align(
            p["fusion"][f"{m}_align"], heads, f,
            p["llm"]["embed_tokens"].astype(jnp.bfloat16), 0.0, None,
            kv_cache=c[m]))
        timeit(f"align[{mod}] flash bk=1024 (current)",
               lambda: fn(params, cache, feats[mod]))

    # block_k sweep on the raw folded shape (video, the big one)
    m2 = cfg.llm.padded_vocab + 2
    kq = jnp.asarray(rng.randint(-127, 127, (m2, e)), jnp.int8)
    ks_ = jnp.asarray(np.abs(rng.randn(m2, 1)).astype(np.float32))

    def raw_flash(f, kq, ks_, bk):
        k = (kq.astype(jnp.float32) * ks_).astype(jnp.bfloat16)
        q = f.reshape(b, -1, heads, d).transpose(2, 0, 1, 3).reshape(
            heads, -1, 1, d)
        kh = k.reshape(m2, heads, d).transpose(1, 0, 2)[:, :, None, :]
        out = flash_attention(q, kh, kh, None, causal=False,
                              scale=d ** -0.5, block_q=512, block_k=bk)
        return out

    for bk in (1024, 2048):
        fn = jax.jit(lambda f, kq, ks_, bk=bk: raw_flash(f, kq, ks_, bk))
        timeit(f"align[video] raw flash bk={bk}",
               lambda: fn(feats["video"], kq, ks_))

    # einsum over int8 K/V with after-dot scales (tiny-q modalities):
    # logits [B, N, Sq, M2] fp32
    def einsum_int8(f, kq, ks_):
        q = f.reshape(b, -1, heads, d)
        k8 = kq.reshape(m2, heads, d)
        logits = jnp.einsum("bqnd,knd->bnqk", q, k8.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        logits = logits * (d ** -0.5) * ks_[:, 0][None, None, None, :]
        probs = jax.nn.softmax(logits, axis=-1)
        probs = (probs * ks_[:, 0][None, None, None, :])
        out = jnp.einsum("bnqk,knd->bqnd", probs.astype(jnp.bfloat16),
                         k8.astype(jnp.bfloat16))
        return out

    fn8 = jax.jit(einsum_int8)
    for mod in ("image", "audio", "video"):
        timeit(f"align[{mod}] einsum int8-stream",
               lambda m=mod: fn8(feats[m], kq, ks_))


if __name__ == "__main__":
    main()
