"""Training entry point — the TPU-native run_clm_llms.py.

Mirrors the reference CLI surface (run_clm_llms.py:401-588): config from a
JSON file or flags, dataset cache in, encoder freezing, epoch loop with
grad accumulation, periodic checkpoints, final save — plus the things the
reference stubbed or broke: real weight loading, real resume, a working
freeze flag (SURVEY §7 quirks #1-#3).

Usage:
    python -m macaw_llm_tpu.run_train --config cfg.json \
        --cache data/train.npz --names data/all_visual_names.json \
        --tokenizer trained_models/llama_tokenizer --output-dir out/
    python -m macaw_llm_tpu.run_train --synthetic --tiny   # smoke test
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import signal
import time

import jax
import numpy as np

from macaw_llm_tpu.config import Config, IGNORE_ID, tiny_model_config
from macaw_llm_tpu.data.datasets import TokenizedDataset
from macaw_llm_tpu.data.loader import (BatchLoader, MediaSource,
                                        device_prefetch)
from macaw_llm_tpu.models import fusion
from macaw_llm_tpu.parallel.mesh import create_mesh, multihost_initialize
from macaw_llm_tpu.train.checkpoint import CheckpointManager
from macaw_llm_tpu.train.trainer import Trainer
from macaw_llm_tpu.utils.logging import MetricsLogger, setup_logging

logger = logging.getLogger("macaw.train")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Macaw-TPU training")
    p.add_argument("--config", type=str, default=None,
                   help="JSON Config file (macaw_llm_tpu.config.Config)")
    p.add_argument("--cache", type=str, default=None,
                   help="tokenized dataset cache (.npz)")
    p.add_argument("--stream", type=str, nargs="+", default=None,
                   help="streaming mode (reference DataTrainingArguments."
                        "streaming): JSONL instruction shards tokenized "
                        "on the fly — no prebuilt cache, dataset may "
                        "exceed host RAM. Requires --steps and "
                        "--tokenizer; rows carry prompt/output (or Alpaca "
                        "instruction/input/output) plus optional "
                        "image/audio/video name-table keys")
    p.add_argument("--shuffle-buffer", type=int, default=1024,
                   help="streaming shuffle buffer size (rows)")
    p.add_argument("--names", type=str, default=None,
                   help="media name table JSON ({'list': [...]})")
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--output-dir", type=str, default="checkpoints")
    p.add_argument("--llama-weights", type=str, default=None,
                   help="HF LLaMA checkpoint dir (torch)")
    p.add_argument("--clip-weights", type=str, default=None)
    p.add_argument("--whisper-weights", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None,
                   help="hard step cap (overrides epochs for smoke runs)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on random synthetic data (smoke test)")
    p.add_argument("--tiny", action="store_true",
                   help="use the tiny test model config")
    p.add_argument("--profile", default=None, choices=["1b", "7b"],
                   help="use a named model profile (reference-parity 7b "
                        "or the 1b stand-in) instead of --config")
    p.add_argument("--batch-size", type=int, default=None,
                   help="override cfg.train.per_device_batch_size")
    p.add_argument("--no-media", action="store_true",
                   help="text-only batches (no image/audio/video columns)")
    p.add_argument("--lora-rank", type=int, default=None,
                   help="enable LoRA fine-tuning at this rank")
    p.add_argument("--eval-cache", type=str, default=None,
                   help="tokenized eval-split cache (.npz); with "
                        "--synthetic a held-out synthetic split is used")
    p.add_argument("--do-eval", action="store_true",
                   help="run a final eval pass (loss + token accuracy) "
                        "after training; periodic eval follows "
                        "cfg.train.eval_steps")
    p.add_argument("--eval-steps", type=int, default=None,
                   help="override cfg.train.eval_steps")
    return p.parse_args(argv)


def _load_state_dict(ckpt_dir: str) -> dict:
    """HF checkpoint dir -> flat state dict: sharded-index-aware
    safetensors (torch-free numpy reader) with a pytorch_model.bin
    fallback. See utils.safetensors_io.load_checkpoint_dir."""
    from macaw_llm_tpu.utils.safetensors_io import load_checkpoint_dir
    return load_checkpoint_dir(ckpt_dir)


def load_pretrained(cfg: Config, args) -> dict:
    """Compose the fusion model, loading pretrained towers when given
    (the working version of run_clm_llms.py:478-483)."""
    rng = jax.random.PRNGKey(cfg.train.seed)
    params = fusion.init_params(rng, cfg.model)
    if args.llama_weights:
        from macaw_llm_tpu.utils.hf_import import (import_llama, pad_vocab,
                                                   resize_token_embeddings)
        llm = import_llama(_load_state_dict(args.llama_weights),
                           cfg.model.llm)
        llm = resize_token_embeddings(llm, cfg.model.llm.vocab_size)
        if cfg.model.llm.padded_vocab > cfg.model.llm.vocab_size:
            llm = pad_vocab(llm, cfg.model.llm.padded_vocab)
        params["llm"] = llm
    if args.clip_weights:
        from macaw_llm_tpu.utils.hf_import import import_clip_vision
        sd = _load_state_dict(args.clip_weights)
        params["image_encoder"] = import_clip_vision(sd, cfg.model.vision)
        params["video_encoder"] = import_clip_vision(sd, cfg.model.vision)
    if args.whisper_weights:
        from macaw_llm_tpu.utils.hf_import import import_whisper_encoder
        params["audio_encoder"] = import_whisper_encoder(
            _load_state_dict(args.whisper_weights), cfg.model.audio)
    return params


def synthetic_dataset(cfg: Config, n: int = 64,
                      seed: int = 0) -> TokenizedDataset:
    rng = np.random.RandomState(seed)
    L = cfg.data.max_text_len
    ids = rng.randint(16, min(cfg.model.llm.vocab_size, 32000), (n, L))
    ids[:, 0] = 1
    labels = ids.copy()
    labels[:, :8] = IGNORE_ID
    return TokenizedDataset(
        input_ids=ids.astype(np.int32),
        attention_mask=np.ones((n, L), np.int32),
        labels=labels.astype(np.int32),
        images=np.full((n,), -1, np.int32),
        audios=np.full((n,), -1, np.int32),
        videos=np.full((n,), -1, np.int32),
    )


def main(argv=None):
    args = parse_args(argv)
    setup_logging()
    multihost_initialize()

    if args.config:
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    else:
        cfg = Config()
    import dataclasses
    if args.tiny:
        cfg = dataclasses.replace(cfg, model=tiny_model_config())
    if args.profile:
        from macaw_llm_tpu.config import macaw_1b, macaw_7b
        prof = {"1b": macaw_1b, "7b": macaw_7b}[args.profile]()
        prof = dataclasses.replace(prof, dtype="bfloat16", remat=True,
                                   loss_chunk=256)
        cfg = dataclasses.replace(cfg, model=prof)
    if args.batch_size is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, per_device_batch_size=args.batch_size))
    if args.lora_rank is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           lora_rank=args.lora_rank))
    if args.eval_steps is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           eval_steps=args.eval_steps))
    cfg.model.validate()

    mesh = create_mesh(cfg.mesh)
    n_devices = len(jax.devices())
    logger.info("mesh: %s over %d devices", dict(mesh.shape), n_devices)

    # ---- data ----
    global_batch = (cfg.train.per_device_batch_size * n_devices
                    * cfg.train.grad_accum_steps)
    epochs = args.epochs or cfg.train.num_epochs
    names, name_table = [], {}
    if args.names:
        with open(args.names) as f:
            table = json.load(f)
        names = table["list"]
        name_table = table.get("dict") or {n: i for i, n
                                           in enumerate(names)}
    if args.stream:
        # streaming mode (reference DataTrainingArguments.streaming,
        # run_clm_llms.py:268-273): JSONL shards -> on-the-fly tokenize,
        # bounded shuffle, no cache pass; the stream has no length, so
        # --steps bounds the run
        if not args.steps:
            raise SystemExit("--stream requires --steps (a stream has "
                             "no epoch length)")
        if not args.tokenizer:
            raise SystemExit("--stream requires --tokenizer (rows are "
                             "tokenized on the fly)")
        from transformers import AutoTokenizer

        from macaw_llm_tpu.data.loader import StreamingBatchLoader
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
        media = (None if args.no_media else
                 MediaSource(names, cfg.data,
                             image_size=cfg.model.vision.image_size,
                             n_frames=cfg.model.fusion.n_frames))
        steps_per_epoch = max(1, -(-args.steps // max(epochs, 1)))
        loader = StreamingBatchLoader(
            args.stream, tokenizer, media=media, name_table=name_table,
            global_batch=global_batch, accum=cfg.train.grad_accum_steps,
            max_text_len=cfg.data.max_text_len,
            shuffle_buffer=args.shuffle_buffer, seed=cfg.train.seed,
            steps_per_epoch=steps_per_epoch,
            process_index=jax.process_index(),
            process_count=jax.process_count())
    else:
        if args.synthetic or not args.cache:
            ds = synthetic_dataset(cfg)
            media = None if args.no_media else _zero_media(cfg)
            tokenizer = None
        else:
            ds = TokenizedDataset.load(args.cache)
            media = MediaSource(names, cfg.data,
                                image_size=cfg.model.vision.image_size,
                                n_frames=cfg.model.fusion.n_frames)
        loader = BatchLoader(ds, media, global_batch=global_batch,
                             accum=cfg.train.grad_accum_steps,
                             seed=cfg.train.seed,
                             process_index=jax.process_index(),
                             process_count=jax.process_count())
    total_steps = max(1, loader.steps_per_epoch * epochs)
    if args.steps:
        total_steps = min(total_steps, args.steps)

    # ---- eval split (reference defines token accuracy but never runs it,
    # run_clm_llms.py:515-528 / --evaluation_strategy "no"; here it works)
    eval_loader = None
    want_eval = args.do_eval or args.eval_cache or cfg.train.eval_steps > 0
    if want_eval:
        if args.eval_cache:
            eval_ds = TokenizedDataset.load(args.eval_cache)
            eval_media = media
        else:  # held-out synthetic split (different seed than training)
            eval_ds = synthetic_dataset(cfg, n=32, seed=1234)
            eval_media = None if args.no_media else _zero_media(cfg)
        per_eval_batch = cfg.train.per_device_batch_size * n_devices
        eval_loader = BatchLoader(
            eval_ds, eval_media, global_batch=per_eval_batch, accum=1,
            seed=cfg.train.seed, process_index=jax.process_index(),
            process_count=jax.process_count())

    # ---- model / trainer / resume ----
    params = load_pretrained(cfg, args)
    if cfg.train.lora_rank > 0:
        from macaw_llm_tpu.train.lora import init_lora
        params["llm"]["layers"]["lora"] = init_lora(
            jax.random.PRNGKey(cfg.train.seed + 1), cfg.model.llm,
            cfg.train.lora_rank)
    trainer = Trainer(cfg, mesh, total_steps)
    state = trainer.init_state(params)
    del params

    if cfg.train.save_steps > 0:
        ckpt = CheckpointManager(args.output_dir,
                                 save_steps=cfg.train.save_steps,
                                 max_to_keep=cfg.train.save_total_limit,
                                 snapshot=cfg.train.ckpt_snapshot)
    else:
        # save_steps=0 disables checkpointing entirely (benchmark runs;
        # also the axon relay moves ~4 MB/s d2h, making multi-GB saves
        # impractical in this environment)
        class _NullCkpt:
            def save(self, *a, **k):
                return False

            def wait(self):
                pass

            def close(self):
                pass

            def latest_step(self):
                return None

        ckpt = _NullCkpt()
    if cfg.train.resume and ckpt.latest_step() is not None:
        logger.info("resuming from step %s", ckpt.latest_step())
        state = ckpt.restore(state)

    metrics_log = MetricsLogger(
        os.path.join(args.output_dir, "metrics.jsonl"),
        log_every=cfg.train.log_steps)

    # preemption handling (SURVEY §5.3 — the reference has none): on
    # SIGTERM/SIGINT finish the current step, checkpoint, and exit cleanly
    preempted = {"flag": False}

    def _on_signal(signum, frame):
        logger.warning("signal %s received — checkpointing and exiting",
                       signum)
        preempted["flag"] = True

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    # ---- loop ----
    tokens_per_batch = global_batch * cfg.data.max_text_len
    start_step = int(state.step)
    done = start_step >= total_steps
    for epoch in range(epochs):
        if done:
            break
        # resume fast-forward: skip this epoch's already-trained prefix
        # WITHOUT assembling it (no media decode for skipped batches)
        skip = min(max(0, start_step - epoch * loader.steps_per_epoch),
                   loader.steps_per_epoch)
        if skip == loader.steps_per_epoch:
            continue
        batches = loader.epoch(epoch, skip=skip)
        if jax.process_count() == 1:
            # async device transfer overlapped with the previous step
            # (multi-process feeds per-host shards straight to the jitted
            # step instead — device_put of a global sharding needs global
            # arrays there)
            from jax.sharding import NamedSharding, PartitionSpec as P
            bshard = NamedSharding(mesh, P(None, ("dcn", "data", "fsdp")))
            batches = device_prefetch(batches, sharding=bshard)
        batch_iter = iter(batches)
        while True:
            # loader stall: host time blocked waiting for the next batch.
            # train_step dispatches async, so any wait here is time the
            # chip could go idle — the pipeline-health number a streaming
            # loader must keep ~0 (logged per step to metrics.jsonl).
            t_wait = time.perf_counter()
            try:
                batch = next(batch_iter)
            except StopIteration:
                break
            loader_wait_s = time.perf_counter() - t_wait
            state, m = trainer.train_step(state, batch)
            step = int(state.step)
            m = dict(m)
            m["loader_wait_s"] = round(loader_wait_s, 6)
            metrics_log.log(step, m, tokens_per_batch=tokens_per_batch,
                            examples_per_batch=global_batch,
                            n_chips=n_devices)
            if (eval_loader is not None and cfg.train.eval_steps > 0
                    and step % cfg.train.eval_steps == 0):
                em = _run_eval(trainer, state, eval_loader,
                               cfg.train.eval_batches)
                metrics_log.log(step, em)
                metrics_log.flush()
            ckpt.save(state, cfg)
            if preempted["flag"]:
                ckpt.save(state, cfg, force=True)
                ckpt.wait()
                logger.warning("checkpointed at step %d after preemption "
                               "signal; resume with the same command", step)
                done = True
                break
            if step >= total_steps:
                done = True
                break

    ckpt.save(state, cfg, force=True)
    ckpt.wait()
    if args.do_eval and eval_loader is not None:
        em = _run_eval(trainer, state, eval_loader, cfg.train.eval_batches)
        metrics_log.log(int(state.step), em)
        logger.info("final eval: loss=%.4f token_accuracy=%.4f",
                    em["eval_loss"], em["eval_token_accuracy"])
    metrics_log.close()
    logger.info("training done at step %d", int(state.step))
    return state


def _run_eval(trainer, state, eval_loader, max_batches: int):
    """Forward-only pass over up to max_batches eval batches; the loader
    yields [1, B, ...] (accum=1) — strip the accum axis."""
    def gen():
        n = 0
        for batch in eval_loader.epoch(0):
            if n >= max_batches:
                break
            n += 1
            yield jax.tree.map(lambda x: x[0], batch)
    return trainer.evaluate(state, gen())


def _zero_media(cfg: Config):
    """Synthetic media source: always-zero tensors (matches the
    reference's absent-modality behavior)."""
    return MediaSource([], cfg.data,
                       image_size=cfg.model.vision.image_size,
                       n_frames=cfg.model.fusion.n_frames)


if __name__ == "__main__":
    main()
