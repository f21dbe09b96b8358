"""Per-component timing of the 7b fused-prefill step on the real chip.

Decomposes bench.py --mode prefill (519 ms at b16) into its parts so the
optimization target is measured, not guessed. Chained-dispatch timing
(N dispatches, one readback) like bench.py.

Usage: python scripts/bench_prefill_breakdown.py [--batch 16] [--steps 8]
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
from macaw_llm_tpu.models import clip, fusion, llama, whisper


def _readback(out):
    """Force a host readback to close a dispatch chain (the relay's
    block_until_ready returns early)."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, steps):
    fn()            # compile fn
    _readback(fn())  # compile the readback program + drain the queue
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn()
    _readback(out)
    dt = (time.perf_counter() - t0) / steps * 1000
    print(f"{name:42s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8", "w8a8"])
    args = p.parse_args()
    if args.quantize == "w8a8":
        # decompose the bench.py default step: int8 weights + per-token
        # int8 activations on the LLM's multi-row matmuls
        from macaw_llm_tpu.utils.quantize import set_activation_quant
        set_activation_quant(True)

    import dataclasses
    cfg = dataclasses.replace(macaw_7b(), dtype="bfloat16")
    b, s = args.batch, 256

    def _init(key):
        prm = fusion.init_params(key, cfg, param_dtype=jnp.bfloat16)
        cache = fusion.precompute_align_cache(prm, cfg, quantize=True)
        if args.quantize in ("int8", "w8a8"):
            from macaw_llm_tpu.utils.quantize import quantize_llama
            prm["llm"] = quantize_llama(prm["llm"])
        prm = fusion.pack_towers(prm)
        return prm, cache

    params, align_cache = jax.jit(_init)(jax.random.PRNGKey(0))
    jax.block_until_ready((params, align_cache))
    params = fusion.strip_align_kv(params)
    jax.block_until_ready(params)

    rng = np.random.RandomState(0)
    ids = rng.randint(16, 32000, (b, s)).astype(np.int32)
    ids[:, 0] = 1
    vis = cfg.vision
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "images": jnp.asarray(
            rng.randint(0, 255, (b, vis.image_size, vis.image_size, 3)),
            jnp.uint8),
        "audios": jnp.asarray(rng.randn(b, 480000) * 0.1, jnp.float32),
        "videos": jnp.asarray(
            rng.randint(0, 255, (b, cfg.fusion.n_frames, vis.image_size,
                                 vis.image_size, 3)), jnp.uint8),
    }
    steps = args.steps

    # --- full step (reference number) ---
    @jax.jit
    def full(params, batch, align_cache):
        fused = fusion.prepare_inputs(
            params, cfg, input_ids=batch["input_ids"],
            images=batch["images"], audios=batch["audios"],
            videos=batch["videos"], attention_mask=batch["attention_mask"],
            align_cache=align_cache)
        h, _ = llama.forward_hidden(params["llm"], cfg.llm,
                                    fused.inputs_embeds,
                                    fused.attention_mask, use_flash=False)
        return llama.logits_from_hidden(params["llm"], h[:, -1:])[:, 0]

    t_full = timeit("FULL prefill step", lambda: full(params, batch,
                                                      align_cache), steps)

    # --- fusion only ---
    @jax.jit
    def fuse_only(params, batch, align_cache):
        return fusion.prepare_inputs(
            params, cfg, input_ids=batch["input_ids"],
            images=batch["images"], audios=batch["audios"],
            videos=batch["videos"], attention_mask=batch["attention_mask"],
            align_cache=align_cache).inputs_embeds

    t_fuse = timeit("fusion (towers+align+splice)",
                    lambda: fuse_only(params, batch, align_cache), steps)

    fused = jax.jit(fuse_only)(params, batch, align_cache)
    fused = jax.block_until_ready(fused)
    mask = batch["attention_mask"]
    fmask = jnp.ones((b, fused.shape[1]), jnp.int32)

    # --- LLM only on pre-fused embeds ---
    @jax.jit
    def llm_only(params, fused, fmask):
        h, _ = llama.forward_hidden(params["llm"], cfg.llm, fused, fmask,
                                    use_flash=False)
        return llama.logits_from_hidden(params["llm"], h[:, -1:])[:, 0]

    t_llm = timeit("LLM prefill (einsum attn)",
                   lambda: llm_only(params, fused, fmask), steps)

    # --- towers individually (on preprocessed inputs) ---
    from macaw_llm_tpu.audio.mel import log_mel_spectrogram
    from macaw_llm_tpu.image.preprocess import preprocess as img_prep

    @jax.jit
    def mel_only(audios):
        return log_mel_spectrogram(audios, n_mels=cfg.audio.num_mel_bins)

    t_mel = timeit("log-mel (b waveforms)",
                   lambda: mel_only(batch["audios"]), steps)

    @jax.jit
    def prep_only(images, videos):
        im = img_prep(images, size=vis.image_size)
        bv, fv = videos.shape[0], videos.shape[1]
        flat = videos.reshape((bv * fv,) + videos.shape[2:])
        return im, img_prep(flat, size=vis.image_size)

    t_prep = timeit("image preprocess (7b frames)",
                    lambda: prep_only(batch["images"], batch["videos"]),
                    steps)

    im_p, vid_flat = jax.jit(prep_only)(batch["images"], batch["videos"])
    im_p = jax.block_until_ready(im_p)
    mels = jax.block_until_ready(jax.jit(mel_only)(batch["audios"]))

    @jax.jit
    def clip_image(params, x):
        return clip.encode_patches(params["image_encoder"], cfg.vision, x,
                                   use_flash=cfg.tower_flash)

    t_ci = timeit("CLIP image encode (b frames)",
                  lambda: clip_image(params, im_p), steps)

    @jax.jit
    def clip_video(params, x):
        return clip.encode_patches(params["video_encoder"], cfg.vision, x,
                                   use_flash=cfg.tower_flash)

    t_cv = timeit("CLIP video encode (6b frames)",
                  lambda: clip_video(params, vid_flat), steps)

    @jax.jit
    def whisper_only(params, x):
        return whisper.encode(params["audio_encoder"], cfg.audio, x,
                              use_flash=cfg.tower_flash)

    t_wh = timeit("Whisper encode (b mels)",
                  lambda: whisper_only(params, mels), steps)

    # --- align attention from cached K/V ---
    feats_im = jnp.zeros((b, 5, cfg.llm.hidden_size), jnp.bfloat16)
    feats_au = jnp.zeros((b, 6, cfg.llm.hidden_size), jnp.bfloat16)
    feats_vi = jnp.zeros((b, 39, cfg.llm.hidden_size), jnp.bfloat16)

    @jax.jit
    def align_only(params, align_cache, fi, fa, fv):
        fp = params["fusion"]
        mem = params["llm"]["embed_tokens"].astype(jnp.bfloat16)
        h2 = cfg.fusion.attention_heads * 2
        a = fusion._align(fp["image_align"], h2, fi, mem, 0.0, None,
                          kv_cache=align_cache["image"])
        c = fusion._align(fp["audio_align"], h2, fa, mem, 0.0, None,
                          kv_cache=align_cache["audio"])
        d = fusion._align(fp["video_align"], h2, fv, mem, 0.0, None,
                          kv_cache=align_cache["video"])
        return a, c, d

    t_al = timeit("align attention x3 (cached K/V)",
                  lambda: align_only(params, align_cache, feats_im,
                                     feats_au, feats_vi), steps)

    print("-" * 54)
    parts = t_mel + t_prep + t_ci + t_cv + t_wh + t_al
    print(f"{'sum(fusion parts)':42s} {parts:8.1f} ms")
    print(f"{'fusion measured':42s} {t_fuse:8.1f} ms")
    print(f"{'LLM + fusion':42s} {t_llm + t_fuse:8.1f} ms")
    print(f"{'full step':42s} {t_full:8.1f} ms")
    print(f"{'unaccounted (full - llm - fusion)':42s} "
          f"{t_full - t_llm - t_fuse:8.1f} ms")


if __name__ == "__main__":
    main()
