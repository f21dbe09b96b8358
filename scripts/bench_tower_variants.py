"""A/B tower attention variants on the real chip (7b profile, batch 16).

The prefill breakdown (bench_prefill_breakdown.py) shows the towers at
13-23% MFU with tower_flash=True. The flash kernel pads head_dim 64->128
(half the MXU contraction wasted) and pads short sequences up to
block_q — einsum may win at tower shapes exactly as it did for the LLM
at fused_len 312. Measures each variant standalone.

Usage: python scripts/bench_tower_variants.py [--batch 16]
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
from macaw_llm_tpu.models import clip, fusion, whisper


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
    print(f"{name:52s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=8)
    args = p.parse_args()

    import dataclasses
    cfg = dataclasses.replace(macaw_7b(), dtype="bfloat16")
    b = args.batch
    vis = cfg.vision

    # towers + align modules only — the 13.5 GB LLM isn't needed and the
    # two align caches (0.79 + 1.57 GB) wouldn't fit beside it
    from macaw_llm_tpu.ops import torch_mha_init
    from macaw_llm_tpu.ops.attention import pack_mha, shared_kv_project

    h = cfg.llm.hidden_size

    def _init(key):
        ks = jax.random.split(key, 6)
        prm = {
            "image_encoder": clip.init_params(ks[0], cfg.vision,
                                              jnp.bfloat16),
            "video_encoder": clip.init_params(ks[1], cfg.vision,
                                              jnp.bfloat16),
            "audio_encoder": whisper.init_params(ks[2], cfg.audio,
                                                 jnp.bfloat16),
            "fusion": {},
            "llm": {"embed_tokens": jax.random.normal(
                ks[3], (cfg.llm.padded_vocab, h), jnp.bfloat16) * 0.02},
        }
        for i, mod in enumerate(("image", "audio", "video")):
            prm["fusion"][f"{mod}_align"] = torch_mha_init(
                jax.random.fold_in(ks[4], i), h,
                cfg.fusion.attention_heads * 2, param_dtype=jnp.bfloat16)
        cache_i8 = fusion.precompute_align_cache(prm, cfg, quantize=True)
        cache_bf = fusion.precompute_align_cache(prm, cfg, quantize=False)
        for tower in ("image_encoder", "video_encoder", "audio_encoder"):
            prm[tower]["layers"]["attn"] = pack_mha(
                prm[tower]["layers"]["attn"])
        return prm, cache_i8, cache_bf

    params, cache_i8, cache_bf = jax.jit(_init)(jax.random.PRNGKey(0))
    jax.block_until_ready((params, cache_i8, cache_bf))

    rng = np.random.RandomState(0)
    vid_flat = jnp.asarray(
        rng.randn(b * cfg.fusion.n_frames, 3, vis.image_size,
                  vis.image_size), jnp.bfloat16)
    img = jnp.asarray(rng.randn(b, 3, vis.image_size, vis.image_size),
                      jnp.bfloat16)
    mels = jnp.asarray(rng.randn(b, cfg.audio.num_mel_bins, 3000),
                       jnp.bfloat16)
    steps = args.steps

    for use_flash in (True, False):
        tag = "flash" if use_flash else "einsum"

        @jax.jit
        def cv(params, x, uf=use_flash):
            return clip.encode_patches(params["video_encoder"], cfg.vision,
                                       x, use_flash=uf)

        timeit(f"CLIP video 96 frames [{tag}]", lambda: cv(params, vid_flat),
               steps)

        @jax.jit
        def ci(params, x, uf=use_flash):
            return clip.encode_patches(params["image_encoder"], cfg.vision,
                                       x, use_flash=uf)

        timeit(f"CLIP image 16 frames [{tag}]", lambda: ci(params, img),
               steps)

        @jax.jit
        def wh(params, x, uf=use_flash):
            return whisper.encode(params["audio_encoder"], cfg.audio, x,
                                  use_flash=uf)

        timeit(f"Whisper 16 mels [{tag}]", lambda: wh(params, mels), steps)

    # --- align attention variants ---
    h2 = cfg.fusion.attention_heads * 2
    feats = {
        "image": jnp.asarray(rng.randn(b, 5, cfg.llm.hidden_size),
                             jnp.bfloat16),
        "audio": jnp.asarray(rng.randn(b, 6, cfg.llm.hidden_size),
                             jnp.bfloat16),
        "video": jnp.asarray(rng.randn(b, 39, cfg.llm.hidden_size),
                             jnp.bfloat16),
    }

    def align_all(params, cache, fi, fa, fv):
        fp = params["fusion"]
        mem = params["llm"]["embed_tokens"].astype(jnp.bfloat16)
        outs = []
        for mod, f in (("image", fi), ("audio", fa), ("video", fv)):
            outs.append(fusion._align(fp[f"{mod}_align"], h2, f, mem, 0.0,
                                      None, kv_cache=cache[mod]))
        return tuple(outs)

    al_i8 = jax.jit(lambda p, c, fi, fa, fv: align_all(p, c, fi, fa, fv))
    timeit("align x3 [flash, int8 cache dequant]",
           lambda: al_i8(params, cache_i8, feats["image"], feats["audio"],
                         feats["video"]), steps)
    timeit("align x3 [flash, bf16 cache]",
           lambda: al_i8(params, cache_bf, feats["image"], feats["audio"],
                         feats["video"]), steps)


if __name__ == "__main__":
    main()
