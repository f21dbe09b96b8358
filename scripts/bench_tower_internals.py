"""Internal breakdown of tower costs + flash block-size sweep (7b, b16).

Separates conv frontends from transformer layers, and sweeps flash block
sizes for the Whisper (1500-token) and alignment (32k-key) attentions —
the Pallas grid runs blocks sequentially on the one v5e tensorcore, so
a (128 heads x 3 x 2) grid is 768 kernel-step overheads per call.

Usage: python scripts/bench_tower_internals.py
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
from macaw_llm_tpu.models import clip, whisper
from macaw_llm_tpu.ops import gelu, layer_norm
from macaw_llm_tpu.ops.attention import flash_sdpa, pack_mha


def _readback(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


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
    vis, aud = cfg.vision, cfg.audio

    def _init(key):
        ks = jax.random.split(key, 3)
        wp = whisper.init_params(ks[0], aud, jnp.bfloat16)
        cp = clip.init_params(ks[1], vis, jnp.bfloat16)
        wp["layers"]["attn"] = pack_mha(wp["layers"]["attn"])
        cp["layers"]["attn"] = pack_mha(cp["layers"]["attn"])
        return wp, cp

    wparams, cparams = jax.jit(_init)(jax.random.PRNGKey(0))
    jax.block_until_ready((wparams, cparams))

    rng = np.random.RandomState(0)
    mels = jnp.asarray(rng.randn(b, aud.num_mel_bins, 3000), jnp.bfloat16)
    vid = jnp.asarray(rng.randn(b * 6, 3, vis.image_size, vis.image_size),
                      jnp.bfloat16)

    # ---- whisper internals ----
    @jax.jit
    def w_conv(wp, mel):
        x = jnp.transpose(mel, (0, 2, 1))
        x = gelu(whisper._conv1d(wp["conv1"], x, 1))
        x = gelu(whisper._conv1d(wp["conv2"], x, 2))
        return x

    timeit("whisper conv frontend", lambda: w_conv(wparams, mels))
    post = jax.jit(w_conv)(wparams, mels)
    post = jax.block_until_ready(post)

    def w_layers(uf):
        @jax.jit
        def f(wp, x):
            def body(h, lp):
                return whisper._encoder_layer(aud, lp, h, use_flash=uf), None
            h, _ = jax.lax.scan(body, x, wp["layers"])
            return h
        return f

    wl_flash = w_layers(True)
    wl_ein = w_layers(False)
    timeit("whisper 6 layers [flash 512/1024]",
           lambda: wl_flash(wparams, post))
    timeit("whisper 6 layers [einsum]", lambda: wl_ein(wparams, post))

    # flash block sweep on the raw whisper attention shape
    q = jnp.asarray(rng.randn(b, 1500, 8, 64), jnp.bfloat16)
    for bq, bk in ((512, 1024), (512, 512), (1024, 512), (1536, 512),
                   (768, 768), (1536, 1536)):
        fn = jax.jit(lambda q, bq=bq, bk=bk: flash_sdpa(
            q, q, q, block_q=bq, block_k=bk))
        timeit(f"whisper-shape flash attn bq={bq} bk={bk}",
               lambda: fn(q))

    # ---- clip internals ----
    @jax.jit
    def c_embed(cp, x):
        h = clip._embeddings(cp, vis, x)
        return layer_norm(h, cp["pre_layernorm"]["w"],
                          cp["pre_layernorm"]["b"], vis.layer_norm_eps)

    timeit("clip patch conv + embed (96 frames)",
           lambda: c_embed(cparams, vid))
    ch = jax.block_until_ready(jax.jit(c_embed)(cparams, vid))

    def c_layers(uf):
        @jax.jit
        def f(cp, x):
            def body(h, lp):
                return clip._encoder_layer(vis, lp, h, use_flash=uf), None
            h, _ = jax.lax.scan(body, x, cp["layers"])
            return h
        return f

    timeit("clip 12 layers (96 fr) [flash]",
           lambda: c_layers(True)(cparams, ch))
    timeit("clip 12 layers (96 fr) [einsum]",
           lambda: c_layers(False)(cparams, ch))

    # einsum attention with frame-flattened projections
    @jax.jit
    def c_layers_flat(cp, x):
        bf, s, e = x.shape

        def body(h, lp):
            ln1 = layer_norm(h, lp["ln1"]["w"], lp["ln1"]["b"],
                             vis.layer_norm_eps)
            y = ln1.reshape(bf * s, e) @ lp["attn"]["qkv"]["w"].astype(
                h.dtype)
            y = (y + lp["attn"]["qkv"]["b"].astype(h.dtype)).reshape(
                bf, s, 3 * e)
            nh = vis.num_heads
            qq = y[..., :e].reshape(bf, s, nh, e // nh)
            kk = y[..., e:2 * e].reshape(bf, s, nh, e // nh)
            vv = y[..., 2 * e:].reshape(bf, s, nh, e // nh)
            from macaw_llm_tpu.ops.attention import dot_product_attention
            o = dot_product_attention(qq, kk, vv).reshape(bf * s, e)
            o = (o @ lp["attn"]["o"]["w"].astype(h.dtype)
                 + lp["attn"]["o"]["b"].astype(h.dtype)).reshape(bf, s, e)
            h = h + o
            ln2 = layer_norm(h, lp["ln2"]["w"], lp["ln2"]["b"],
                             vis.layer_norm_eps)
            m = ln2.reshape(bf * s, e) @ lp["mlp"]["fc1"]["w"].astype(
                h.dtype) + lp["mlp"]["fc1"]["b"].astype(h.dtype)
            m = gelu(m * 1.0) if False else jax.nn.sigmoid(1.702 * m) * m
            m = m @ lp["mlp"]["fc2"]["w"].astype(h.dtype) \
                + lp["mlp"]["fc2"]["b"].astype(h.dtype)
            return h + m.reshape(bf, s, e), None

        h, _ = jax.lax.scan(body, x, cp["layers"])
        return h

    timeit("clip 12 layers (96 fr) [einsum, flat proj]",
           lambda: c_layers_flat(cparams, ch))


if __name__ == "__main__":
    main()
