"""Minimal production-style serving layer: batched multimodal generation
over HTTP.

The reference has no serving path (its inference script is an offline eval
loop, run_clm_llms_inference.py). This server turns the fused
prefill+decode into a request/response service:

  * ContinuousEngine (default): slot-based continuous batching —
    admission prefill on its own thread, per-slot budgets/temperatures,
    token streaming
  * InferenceEngine (--static): request queue + background batcher —
    requests are grouped up to ``max_batch`` or ``batch_timeout_ms``,
    padded to a shared bucketed prompt length (no per-request
    recompiles), run as ONE fused prefill + decode with per-row
    temperature and token budgets, and fanned back out
  * media: base64 WAV audio, base64 JPEG image, or absent (zeros — the
    reference's absent-modality semantics)
  * stdlib-only HTTP (POST /generate, GET /healthz); JSON in/out

Programmatic use (no HTTP) goes through ``Engine.generate_sync``.
"""

from __future__ import annotations

import base64
import io
import json
import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from macaw_llm_tpu.config import Config, EOS_ID, PAD_ID
from macaw_llm_tpu.data.templates import format_prompt
from macaw_llm_tpu.generate import generate
from macaw_llm_tpu.models import fusion

logger = logging.getLogger("macaw.serve")

PROMPT_BUCKETS = (32, 64, 128, 256)


def _init_align_cache(params: dict, mcfg, mode: str):
    """Engine-side alignment K/V cache setup (see
    ``fusion.precompute_align_cache``): serving never trains, so the
    weight-only projections are computed once at startup and the dead K/V
    in-projection rows are dropped. mode: "bf16" (exact), "int8" (half the
    HBM, ~0.2% row error), or "off"."""
    if mode == "off":
        return fusion.pack_towers(params), None
    cache = jax.jit(lambda p: fusion.precompute_align_cache(
        p, mcfg, quantize=mode == "int8"))(params)
    jax.block_until_ready(cache)
    return fusion.pack_towers(fusion.strip_align_kv(params)), cache


@dataclass
class Request:
    prompt: str
    image: Optional[np.ndarray] = None      # uint8 [H, W, 3]
    audio: Optional[np.ndarray] = None      # fp32 [480000]
    video: Optional[np.ndarray] = None      # uint8 [F, H, W, 3]
    max_new_tokens: int = 128
    temperature: float = 0.0
    stream_cb: Optional[object] = None      # callable(token_id) per token
    _done: threading.Event = field(default_factory=threading.Event)
    _result: Optional[dict] = None


class InferenceEngine:
    """Owns the model params and the batching loop."""

    supports_streaming = False  # one jitted generate() call per batch —
                                # no per-token callback; use ContinuousEngine

    def __init__(self, params: dict, cfg: Config, tokenizer,
                 max_batch: int = 8, batch_timeout_ms: float = 20.0,
                 max_new_tokens: int = 128, align_cache: str = "bf16",
                 kv_cache_dtype: Optional[str] = None):
        self.params, self.align_cache = _init_align_cache(
            params, cfg.model, align_cache)
        self.kv_cache_dtype = kv_cache_dtype
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_batch = max_batch
        self.batch_timeout = batch_timeout_ms / 1000.0
        self.max_new_tokens = max_new_tokens
        self.queue: "queue.Queue[Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self.stats = {"requests": 0, "batches": 0, "tokens": 0}

    # -------------------- lifecycle --------------------

    def start(self):
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=30)

    # -------------------- public API --------------------

    def generate_sync(self, req: Request, timeout: float = 300.0) -> dict:
        self.queue.put(req)
        if not req._done.wait(timeout):
            raise TimeoutError("generation timed out")
        return req._result

    # -------------------- batching loop --------------------

    def _collect(self) -> List[Request]:
        try:
            first = self.queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.batch_timeout
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                self._run_batch(batch)
            except Exception as e:  # noqa: BLE001 — fail the requests, not the server
                logger.exception("batch failed")
                for r in batch:
                    r._result = {"error": str(e)}
                    r._done.set()

    def _bucket(self, n: int) -> int:
        for b in PROMPT_BUCKETS:
            if n <= b:
                return b
        return PROMPT_BUCKETS[-1]

    def _run_batch(self, batch: List[Request]):
        t0 = time.perf_counter()
        mcfg = self.cfg.model
        vis = mcfg.vision
        # pad the request list to the max batch size so the compiled
        # graph is reused (requests beyond len(batch) are dummies)
        n_real = len(batch)
        b = self.max_batch

        token_lists = []
        for r in batch:
            t = self.tokenizer.encode(format_prompt(r.prompt))
            if t and t[-1] == EOS_ID:
                t = t[:-1]
            token_lists.append(t)
        seq = self._bucket(max(len(t) for t in token_lists))
        ids = np.full((b, seq), PAD_ID, np.int32)
        mask = np.zeros((b, seq), np.int32)
        for i, t in enumerate(token_lists):
            t = t[:seq]
            ids[i, :len(t)] = t
            mask[i, :len(t)] = 1

        images = np.zeros((b, vis.image_size, vis.image_size, 3), np.uint8)
        audios = np.zeros((b, mcfg.audio.n_audio_samples), np.float32)
        videos = np.zeros((b, mcfg.fusion.n_frames, vis.image_size,
                           vis.image_size, 3), np.uint8)
        for i, r in enumerate(batch):
            if r.image is not None:
                images[i] = r.image
            if r.audio is not None:
                audios[i] = r.audio
            if r.video is not None:
                videos[i] = r.video

        fused = self._fuse(jnp.asarray(ids), jnp.asarray(images),
                           jnp.asarray(audios), jnp.asarray(videos),
                           jnp.asarray(mask))
        # per-request semantics: each row keeps its own temperature
        # (greedy rows stay greedy when batched with sampling rows) and
        # its own token budget (dummy pad rows get budget 1 so they never
        # hold the batch open).
        temps = np.zeros((b,), np.float32)
        budgets = np.ones((b,), np.int32)
        for i, r in enumerate(batch):
            temps[i] = r.temperature
            budgets[i] = max(1, min(r.max_new_tokens, self.max_new_tokens))
        any_sampling = bool((temps > 0).any())
        out = generate(self.params["llm"], mcfg.llm,
                       inputs_embeds=fused.inputs_embeds,
                       attention_mask=fused.attention_mask,
                       max_new_tokens=self.max_new_tokens,
                       eos_id=EOS_ID, pad_id=PAD_ID,
                       temperature=jnp.asarray(temps),
                       budgets=jnp.asarray(budgets),
                       cache_dtype=self.kv_cache_dtype,
                       rng=jax.random.PRNGKey(int(time.time() * 1e3) % 2**31)
                       if any_sampling else None)
        toks = np.asarray(out.tokens)
        dt = time.perf_counter() - t0

        for i, r in enumerate(batch):
            gen = toks[i][: r.max_new_tokens]
            gen = gen[gen != PAD_ID]
            text = (self.tokenizer.decode(gen.tolist(),
                                          skip_special_tokens=True)
                    if hasattr(self.tokenizer, "decode") else gen.tolist())
            r._result = {
                "text": text,
                "tokens": int(gen.shape[0]),
                "batch_size": n_real,
                "latency_ms": round(dt * 1000, 1),
            }
            r._done.set()
        self.stats["requests"] += n_real
        self.stats["batches"] += 1
        self.stats["tokens"] += int((toks != PAD_ID).sum())

    def _fuse(self, ids, images, audios, videos, mask):
        # jit cache keyed by shapes — bucketed prompts keep this bounded
        if not hasattr(self, "_fuse_fn"):
            cfg = self.cfg.model

            @jax.jit
            def fn(params, ids, images, audios, videos, mask, cache):
                return fusion.prepare_inputs(
                    params, cfg, input_ids=ids, images=images,
                    audios=audios, videos=videos, attention_mask=mask,
                    align_cache=cache)

            self._fuse_fn = fn
        return self._fuse_fn(self.params, ids, images, audios, videos,
                             mask, self.align_cache)


# ---------------------------------------------------------------------------
# HTTP front
# ---------------------------------------------------------------------------

def _decode_one_image(raw: bytes, size: int) -> np.ndarray:
    from macaw_llm_tpu.data import native
    image = native.decode_jpeg_crop(raw, size) if native.available() \
        else None
    if image is None:
        from PIL import Image
        with Image.open(io.BytesIO(raw)) as im:
            im = im.convert("RGB").resize((size, size))
            image = np.asarray(im, np.uint8)
    return image


def _decode_media(payload: dict, cfg: Config):
    """base64 fields -> arrays (image: JPEG/PNG; audio: WAV; video: a list
    of JPEG/PNG frames — the reference's eval path consumes all three
    modalities, llm_trainer.py:425-453)."""
    image = audio = video = None
    size = cfg.model.vision.image_size
    if payload.get("image_b64"):
        image = _decode_one_image(base64.b64decode(payload["image_b64"]),
                                  size)
    if payload.get("audio_b64"):
        import tempfile
        from macaw_llm_tpu.data.loader import load_wav
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(base64.b64decode(payload["audio_b64"]))
            f.flush()
            audio = load_wav(f.name)
    if payload.get("video_b64"):
        # list of base64 frames; resampled to n_frames with the last
        # frame pinned (the reference's 6-of-120 subsampling semantics,
        # llm_trainer.py:172-181, generalized to any frame count)
        from macaw_llm_tpu.image.preprocess import sample_frame_indices
        frames = [_decode_one_image(base64.b64decode(f), size)
                  for f in payload["video_b64"]]
        if not frames:
            raise ValueError("video_b64 must be a non-empty list of "
                             "base64-encoded frames")
        n = cfg.model.fusion.n_frames
        if len(frames) < n:
            frames = frames + [frames[-1]] * (n - len(frames))
        idx = sample_frame_indices(len(frames), n)
        video = np.stack([frames[i] for i in idx])
    return image, audio, video


def make_handler(engine: InferenceEngine, cfg: Config):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.debug(fmt, *args)

        def _send(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", **engine.stats})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                image, audio, video = _decode_media(payload, cfg)
                req = Request(
                    prompt=payload["prompt"],
                    image=image, audio=audio, video=video,
                    max_new_tokens=int(payload.get("max_new_tokens", 128)),
                    temperature=float(payload.get("temperature", 0.0)))
                if payload.get("stream"):
                    if not getattr(engine, "supports_streaming", False):
                        self._send(400, {
                            "error": "streaming requires the continuous "
                                     "engine (run serve without --static)"})
                        return
                    self._stream(req)
                    return
                result = engine.generate_sync(req)
                self._send(200 if "error" not in result else 500, result)
            except Exception as e:  # noqa: BLE001
                self._send(400, {"error": str(e)})

        def _stream(self, req: Request):
            """Chunked transfer: one JSON line per generated token, then a
            final line with the full result."""
            self.send_response(200)
            self.send_header("Content-Type", "application/jsonl")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            lock = threading.Lock()

            def write_chunk(obj):
                data = (json.dumps(obj) + "\n").encode()
                with lock:
                    self.wfile.write(f"{len(data):x}\r\n".encode())
                    self.wfile.write(data + b"\r\n")
                    self.wfile.flush()

            def on_tok(tok_id: int):
                piece = (engine.tokenizer.decode(
                    [tok_id], skip_special_tokens=True)
                    if hasattr(engine.tokenizer, "decode") else str(tok_id))
                write_chunk({"token": tok_id, "text": piece})

            req.stream_cb = on_tok
            result = engine.generate_sync(req)
            write_chunk({"done": True, **result})
            with lock:
                self.wfile.write(b"0\r\n\r\n")
                self.wfile.flush()

    return Handler


def serve(params: dict, cfg: Config, tokenizer, *, host: str = "0.0.0.0",
          port: int = 8000, max_batch: int = 8,
          batch_timeout_ms: float = 20.0,
          max_new_tokens: int = 128,
          continuous: bool = True,
          align_cache: str = "bf16",
          kv_cache_dtype: Optional[str] = None) -> ThreadingHTTPServer:
    if continuous:
        engine = ContinuousEngine(params, cfg, tokenizer, slots=max_batch,
                                  max_new_tokens=max_new_tokens,
                                  align_cache=align_cache,
                                  kv_cache_dtype=kv_cache_dtype)
    else:
        engine = InferenceEngine(params, cfg, tokenizer,
                                 max_batch=max_batch,
                                 batch_timeout_ms=batch_timeout_ms,
                                 max_new_tokens=max_new_tokens,
                                 align_cache=align_cache,
                                 kv_cache_dtype=kv_cache_dtype)
    engine.start()
    server = ThreadingHTTPServer((host, port), make_handler(engine, cfg))
    server.engine = engine
    logger.info("serving on %s:%d (max_batch=%d)", host, port, max_batch)
    return server


def main(argv=None):
    import argparse
    from macaw_llm_tpu.run_inference import restore_params
    from macaw_llm_tpu.train.checkpoint import load_config
    from macaw_llm_tpu.utils.logging import setup_logging

    setup_logging()
    p = argparse.ArgumentParser(description="Macaw-TPU serving")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--batch-timeout-ms", type=float, default=20.0)
    p.add_argument("--max-new-tokens", type=int, default=128)
    eng_group = p.add_mutually_exclusive_group()
    eng_group.add_argument("--static", action="store_true",
                           help="static request batcher (higher batch "
                                "throughput, no streaming) instead of the "
                                "default continuous batching engine")
    eng_group.add_argument("--continuous", action="store_true",
                           help="(default) slot-based continuous batching")
    p.add_argument("--kv-cache-dtype", default=None,
                   choices=[None, "int8"],
                   help="int8-quantized KV cache: half the decode "
                        "attention HBM read (continuous engine)")
    p.add_argument("--align-cache", default="int8",
                   choices=["int8", "bf16", "off"],
                   help="precomputed alignment K/V projections (int8 "
                        "halves the cache HBM; off recomputes per prefill)")
    p.add_argument("--quantize", default=None, choices=[None, "int8"],
                   help="int8 weight-only LLM (the single-chip 7b "
                        "serving configuration)")
    p.add_argument("--no-pack", action="store_true",
                   help="keep the unpacked wq/wk/wv layout (packed qkv/"
                        "gateup streams decode ~1.6x faster on v5e)")
    args = p.parse_args(argv)

    cfg = load_config(args.checkpoint) or Config()
    params = restore_params(args.checkpoint, cfg)
    from macaw_llm_tpu.utils.quantize import (pack_llama_for_decode,
                                              quantize_llama)
    if args.quantize == "int8":
        params["llm"] = quantize_llama(params["llm"], donate=True)
    if not args.no_pack:
        params["llm"] = pack_llama_for_decode(params["llm"])
    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    server = serve(params, cfg, tokenizer, host=args.host, port=args.port,
                   max_batch=args.max_batch,
                   batch_timeout_ms=args.batch_timeout_ms,
                   max_new_tokens=args.max_new_tokens,
                   continuous=not args.static,
                   align_cache=args.align_cache,
                   kv_cache_dtype=args.kv_cache_dtype)
    server.serve_forever()


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Continuous batching
# ---------------------------------------------------------------------------

class ContinuousEngine:
    """Slot-based continuous batching: requests are admitted into free KV-
    cache slots as they arrive (single-request fused prefill scattered into
    the slot), while ONE decode step per iteration advances every active
    slot — new arrivals never wait for the current batch to finish, unlike
    the static batcher above. Per-slot cache positions use the decoder's
    vector cache lengths.

    Real continuous-batching properties:
      * prefill runs on a dedicated admission thread, so the decode loop
        never stalls while a new request's (multi-hundred-ms) fused
        prefill computes — the decode thread only performs the cheap
        cache scatter when a prefilled request lands in a free slot
      * token readback is pipelined: decode step N+1 is dispatched before
        step N's tokens are copied host-side, overlapping the device→host
        transfer with compute (a finished slot may burn one extra masked
        step — bounded waste, never wrong output)
      * per-slot temperature: greedy and sampling requests share the
        batch without contaminating each other
    """

    supports_streaming = True

    def __init__(self, params: dict, cfg: Config, tokenizer, *,
                 slots: int = 8, prompt_bucket: int = 256,
                 max_new_tokens: int = 128, align_cache: str = "bf16",
                 kv_cache_dtype: Optional[str] = None):
        self.params, self.align_cache = _init_align_cache(
            params, cfg.model, align_cache)
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.slots = slots
        # prompt_bucket is the MAXIMUM prompt length (default 256 — the
        # reference's text budget, preprocess_data_supervised.py:101);
        # each request prefills at the smallest bucket that fits it, so
        # short prompts never pay the long-prompt prefill.
        self.prompt_bucket = prompt_bucket
        self.buckets = tuple(b for b in PROMPT_BUCKETS
                             if b < prompt_bucket) + (prompt_bucket,)
        self.max_new = max_new_tokens
        mcfg = cfg.model
        self.total_len = prompt_bucket + cfg.model.total_prefix_len \
            + max_new_tokens
        self.kv_cache_dtype = kv_cache_dtype

        from macaw_llm_tpu.models import llama as L
        self._L = L
        cache = L.KVCache.create(
            mcfg.llm, slots, self.total_len,
            jnp.dtype(mcfg.dtype) if kv_cache_dtype is None
            else kv_cache_dtype)
        # device cache buffers as ONE donated dict: step/admit alias them
        # in place instead of materializing a fresh multi-GB cache copy
        # every decode step (≈2.6 GB/step at 7b slots=8 before donation)
        self.cache = {"k": cache.k, "v": cache.v}
        if cache.k_scale is not None:
            self.cache["ks"] = cache.k_scale
            self.cache["vs"] = cache.v_scale
        self.lengths = jnp.zeros((slots,), jnp.int32)
        self.toks = jnp.zeros((slots,), jnp.int32)

        # host-side slot state
        self._reqs: List[Optional[Request]] = [None] * slots
        self._generated: List[List[int]] = [[] for _ in range(slots)]
        self._budget = np.zeros(slots, np.int64)
        self._temps = np.zeros(slots, np.float32)
        # device-resident copies of the per-slot control vectors; re-upload
        # only when admission/finish changes them (not every decode step —
        # each h2d is a relay dispatch)
        self._active_dev = None
        self._temps_dev = None
        self._ctl_dirty = True
        self._slot_gen = [0] * slots    # guards pipelined readback after
                                        # a slot is recycled
        self.queue: "queue.Queue[Request]" = queue.Queue()
        self._admit_q: "queue.Queue[tuple]" = queue.Queue(maxsize=slots)
        self._stop = threading.Event()
        self._key = jax.random.PRNGKey(int(time.time() * 1e3) % 2**31)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._prefill_thread = threading.Thread(target=self._prefill_loop,
                                                daemon=True)
        self.stats = {"requests": 0, "steps": 0, "admitted": 0}

        self._prefill_fn = None
        self._step_fn = None

    # -------------------- lifecycle / API --------------------

    def start(self):
        self._build_fns()
        self._prefill_thread.start()
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._prefill_thread.join(timeout=60)
        self._thread.join(timeout=60)

    def generate_sync(self, req: Request, timeout: float = 600.0) -> dict:
        self.queue.put(req)
        if not req._done.wait(timeout):
            raise TimeoutError("generation timed out")
        return req._result

    # -------------------- jitted pieces --------------------

    def _build_fns(self):
        from functools import partial

        mcfg = self.cfg.model
        L = self._L
        cdtype = (jnp.dtype(mcfg.dtype) if self.kv_cache_dtype is None
                  else self.kv_cache_dtype)

        def _prefill_body(params, fused, temp, rng):
            cache = L.KVCache.create(mcfg.llm, 1, self.total_len, cdtype)
            full_mask = jnp.concatenate(
                [fused.attention_mask.astype(jnp.int32),
                 jnp.ones((1, self.total_len
                           - fused.attention_mask.shape[1]), jnp.int32)],
                axis=1)
            pos = jnp.maximum(jnp.cumsum(
                fused.attention_mask.astype(jnp.int32), axis=1) - 1, 0)
            # hidden states only; project the one sampled position (the
            # [1, S, 32k] fp32 prefill logits never exist)
            h, cache = L.forward_hidden(
                params["llm"], mcfg.llm, fused.inputs_embeds,
                attention_mask=full_mask, positions=pos, kv_cache=cache)
            last = jnp.max(fused.attention_mask.astype(jnp.int32)
                           * jnp.arange(fused.attention_mask.shape[1]
                                        )[None, :], axis=1)
            h_last = jnp.take_along_axis(h, last[:, None, None], axis=1)
            first_logits = L.logits_from_hidden(
                params["llm"], h_last, L.valid_vocab(mcfg.llm))[:, 0]
            greedy = jnp.argmax(first_logits, -1)
            scaled = first_logits.astype(jnp.float32) \
                / jnp.maximum(temp, 1e-6)
            sampled = jax.random.categorical(rng, scaled, axis=-1)
            first_tok = jnp.where(temp > 0, sampled, greedy)
            new = {k: v[:, 0] for k, v in zip(
                ("k", "v", "ks", "vs"),
                (cache.k, cache.v, cache.k_scale, cache.v_scale))
                if v is not None}
            return new, first_tok[0].astype(jnp.int32), last[0] + 1

        @jax.jit
        def prefill(params, ids, images, audios, videos, mask, temp, rng,
                    cache):
            fused = fusion.prepare_inputs(
                params, mcfg, input_ids=ids, images=images, audios=audios,
                videos=videos, attention_mask=mask, align_cache=cache)
            return _prefill_body(params, fused, temp, rng)

        vis = mcfg.vision

        @jax.jit
        def zero_prefix(params, cache):
            # the [image][audio][video] prefix for ABSENT media is a
            # constant: the reference trains/infers text-only examples
            # with all-zero media tensors (llm_trainer.py loader zeros),
            # so the tower+alignment output for zeros never changes.
            # Encode it once; prefill_text splices the cached block.
            fused = fusion.prepare_inputs(
                params, mcfg,
                input_ids=jnp.full((1, 1), 1, jnp.int32),  # [BOS] only
                images=jnp.zeros((1, vis.image_size, vis.image_size, 3),
                                 jnp.uint8),
                audios=jnp.zeros((1, mcfg.audio.n_audio_samples),
                                 jnp.float32),
                videos=jnp.zeros((1, mcfg.fusion.n_frames, vis.image_size,
                                  vis.image_size, 3), jnp.uint8),
                align_cache=cache)
            return fused.inputs_embeds[:, 1:]   # drop BOS: [1, P, H]

        @jax.jit
        def prefill_text(params, ids, mask, temp, rng, prefix):
            # text-only request: splice the cached zero-media prefix
            # instead of re-running CLIP x2 + Whisper + alignment on
            # zeros. Token-exact vs the full path (same embeddings), and
            # it matters: admission prefills and decode steps share the
            # one chip — at slots=16/new=128 zero-media tower encodes
            # were a large slice of the engine's chip time.
            compute = jnp.dtype(mcfg.dtype)
            text_emb = params["llm"]["embed_tokens"].astype(compute)[ids]
            emb = jnp.concatenate(
                [text_emb[:, :1], prefix.astype(compute), text_emb[:, 1:]],
                axis=1)
            full_mask = jnp.concatenate(
                [jnp.ones((1, prefix.shape[1]), mask.dtype), mask], axis=1)
            fused = fusion.FusedBatch(emb, full_mask, None)
            return _prefill_body(params, fused, temp, rng)

        @partial(jax.jit, donate_argnums=(0,))
        def admit(cache, lengths, toks, slot, new, new_len, new_tok):
            # single-slot dynamic-update-slice into the donated cache —
            # an in-place write, not a whole-cache copy
            out = dict(cache)
            for key, nv in new.items():
                idx = (0, slot) + (0,) * (cache[key].ndim - 2)
                out[key] = jax.lax.dynamic_update_slice(
                    cache[key], nv[:, None], idx)
            lengths = jax.lax.dynamic_update_slice(
                lengths, new_len[None], (slot,))
            toks = jax.lax.dynamic_update_slice(
                toks, new_tok[None], (slot,))
            return out, lengths, toks

        @partial(jax.jit, donate_argnums=(1,))
        def step(params, cache, lengths, toks, active, temps,
                 key, step_idx):
            kv = L.KVCache(k=cache["k"], v=cache["v"], length=lengths,
                           k_scale=cache.get("ks"),
                           v_scale=cache.get("vs"))
            logits, kv = L.forward(
                params["llm"], mcfg.llm, input_ids=toks[:, None],
                kv_cache=kv, dtype=jnp.dtype(mcfg.dtype))
            greedy = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            rng = jax.random.fold_in(key, step_idx)
            scaled = logits[:, 0].astype(jnp.float32) \
                / jnp.maximum(temps, 1e-6)[:, None]
            sampled = jax.random.categorical(rng, scaled,
                                             axis=-1).astype(jnp.int32)
            nxt = jnp.where(temps > 0, sampled, greedy)
            new_lengths = jnp.where(active, kv.length, lengths)
            new_toks = jnp.where(active, nxt, toks)
            out = {k: v for k, v in zip(
                ("k", "v", "ks", "vs"),
                (kv.k, kv.v, kv.k_scale, kv.v_scale)) if v is not None}
            return out, new_lengths, new_toks

        self._prefill_fn, self._prefill_text_fn = prefill, prefill_text
        self._zero_prefix_fn = zero_prefix
        self._zero_prefix = None   # computed lazily, once, on admission
        self._admit_fn, self._step_fn = admit, step

    # -------------------- admission (own thread) --------------------

    def _prefill_loop(self):
        """Runs fused prefills off the decode thread; hands completed
        (req, cache-slice, first-token, length) tuples to the decode loop
        through a bounded queue."""
        counter = 0
        while not self._stop.is_set():
            try:
                req = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                counter += 1
                item = self._run_prefill(req, counter)
                while not self._stop.is_set():
                    try:
                        self._admit_q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
            except Exception as e:  # noqa: BLE001 — fail the request only
                logger.exception("prefill failed")
                req._result = {"error": str(e)}
                req._done.set()

    def _run_prefill(self, req: Request, counter: int):
        mcfg = self.cfg.model
        vis = mcfg.vision
        t = self.tokenizer.encode(format_prompt(req.prompt))
        if t and t[-1] == EOS_ID:
            t = t[:-1]
        t = t[:self.prompt_bucket]
        # smallest bucket that fits — one compiled prefill per bucket
        # (bounded by len(self.buckets)); a reference-length 256-token
        # prompt rides the 256 bucket un-truncated
        bucket = next(b for b in self.buckets if len(t) <= b)
        ids = np.full((1, bucket), PAD_ID, np.int32)
        mask = np.zeros((1, bucket), np.int32)
        ids[0, :len(t)] = t
        mask[0, :len(t)] = 1
        if req.image is None and req.audio is None and req.video is None:
            # text-only: splice the (constant) zero-media prefix; no
            # tower/alignment compute per request
            if self._zero_prefix is None:
                self._zero_prefix = self._zero_prefix_fn(self.params,
                                                         self.align_cache)
            new, tok, length = self._prefill_text_fn(
                self.params, jnp.asarray(ids), jnp.asarray(mask),
                jnp.float32(req.temperature),
                jax.random.fold_in(self._key, counter), self._zero_prefix)
        else:
            image = req.image if req.image is not None else np.zeros(
                (vis.image_size, vis.image_size, 3), np.uint8)
            audio = req.audio if req.audio is not None else np.zeros(
                (mcfg.audio.n_audio_samples,), np.float32)
            video = req.video if req.video is not None else np.zeros(
                (mcfg.fusion.n_frames, vis.image_size, vis.image_size, 3),
                np.uint8)
            new, tok, length = self._prefill_fn(
                self.params, jnp.asarray(ids), jnp.asarray(image[None]),
                jnp.asarray(audio[None]), jnp.asarray(video[None]),
                jnp.asarray(mask), jnp.float32(req.temperature),
                jax.random.fold_in(self._key, counter), self.align_cache)
        # host-sync on the admission thread, NOT the decode loop
        return (req, new, int(tok), length)

    # -------------------- decode loop --------------------

    def _place(self, slot: int, item) -> None:
        """Scatter a prefilled request into a free slot (cheap — the
        expensive prefill already ran on the admission thread)."""
        req, new, tok, length = item
        self.cache, self.lengths, self.toks = \
            self._admit_fn(self.cache, self.lengths, self.toks,
                           jnp.int32(slot), new, length, jnp.int32(tok))
        self._reqs[slot] = req
        self._ctl_dirty = True
        self._generated[slot] = [tok]
        self._budget[slot] = min(req.max_new_tokens, self.max_new) - 1
        self._temps[slot] = req.temperature
        self._slot_gen[slot] += 1
        self.stats["admitted"] += 1
        if req.stream_cb is not None and tok != EOS_ID:
            req.stream_cb(tok)
        if tok == EOS_ID or self._budget[slot] <= 0:
            self._finish(slot)

    def _finish(self, slot: int):
        req = self._reqs[slot]
        gen = [t for t in self._generated[slot] if t != PAD_ID]
        if gen and gen[-1] == EOS_ID:
            gen = gen[:-1]
        text = (self.tokenizer.decode(gen, skip_special_tokens=True)
                if hasattr(self.tokenizer, "decode") else gen)
        req._result = {"text": text, "tokens": len(gen)}
        req._done.set()
        self._reqs[slot] = None
        self._ctl_dirty = True
        self._generated[slot] = []
        self.stats["requests"] += 1

    def _process_readback(self, pending) -> None:
        """Copy a decode step's tokens host-side and run finish/stream
        bookkeeping. ``pending`` carries per-slot generation counters so a
        slot recycled since dispatch is skipped."""
        toks_dev, items = pending
        toks = np.asarray(toks_dev)
        for slot, gen_id in items:
            if self._slot_gen[slot] != gen_id or self._reqs[slot] is None:
                continue
            tok = int(toks[slot])
            self._generated[slot].append(tok)
            self._budget[slot] -= 1
            req = self._reqs[slot]
            if req.stream_cb is not None and tok != EOS_ID:
                req.stream_cb(tok)
            if tok == EOS_ID or self._budget[slot] <= 0:
                self._finish(slot)

    def _loop(self):
        # Decode/readback pipeline, depth 2: dispatch step N, then process
        # step N-2's tokens. Each step's d2h copy is started (async)
        # right after its dispatch, so by the time step N-2 is PROCESSED
        # a full iteration of compute has passed and np.asarray is a
        # local-buffer hit instead of a blocking round trip. At depth 1
        # the readback serialized behind the in-flight step's compute +
        # the relay RTT (~29 ms vs ~20 ms of step compute): measured 564
        # engine vs 787 generate tok/s at 7b int8 slots=16. Cost of the
        # depth: EOS/budget are observed up to 2 steps late — a finished
        # slot decodes <= 2 zombie tokens whose pending entries are
        # dropped by the slot-generation check in _process_readback, and
        # whose cache writes land beyond the slot's final length (masked
        # out of every later attention window, overwritten on reuse).
        from collections import deque
        pending = deque()  # (device tokens, [(slot, slot_gen)])
        while not self._stop.is_set():
            placed = False
            for slot in range(self.slots):
                if self._reqs[slot] is None:
                    try:
                        item = self._admit_q.get_nowait()
                    except queue.Empty:
                        break
                    self._place(slot, item)
                    placed = True
            active_slots = [i for i, r in enumerate(self._reqs)
                            if r is not None]
            if not active_slots:
                if pending:
                    self._process_readback(pending.popleft())
                elif not placed:
                    time.sleep(0.002)
                continue
            if self._ctl_dirty or self._active_dev is None:
                active = np.zeros((self.slots,), bool)
                active[active_slots] = True
                self._active_dev = jnp.asarray(active)
                self._temps_dev = jnp.asarray(self._temps)
                self._ctl_dirty = False
            self.cache, self.lengths, self.toks = \
                self._step_fn(self.params, self.cache,
                              self.lengths, self.toks, self._active_dev,
                              self._temps_dev, self._key,
                              jnp.int32(self.stats["steps"] % 2**31))
            self.stats["steps"] += 1
            try:
                self.toks.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass  # backend without async d2h: asarray blocks as before
            pending.append((self.toks,
                            [(s, self._slot_gen[s]) for s in active_slots]))
            while len(pending) > 2:
                self._process_readback(pending.popleft())
        while pending:
            self._process_readback(pending.popleft())
