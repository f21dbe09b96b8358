"""Inference/eval entry point — the TPU-native run_clm_llms_inference.py.

Mirrors the reference CLI behavior (run_clm_llms_inference.py:379-515):
load the whole trained model from a checkpoint dir, read
``data/{ds}/{ds}_val_inference.json``, cap examples (default 2000), run
batched greedy generation with the Alpaca prompt, dump
``eval_outputs/{ds}_eval_outputs.json``.

Usage:
    python -m macaw_llm_tpu.run_inference --checkpoint out/ \
        --dataset vqa --val-json data/vqa/vqa_val_inference.json \
        --tokenizer trained_models/llama_tokenizer
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import jax

from macaw_llm_tpu.config import Config
from macaw_llm_tpu.data.loader import MediaSource
from macaw_llm_tpu.eval import batch_inference_generation, load_val_examples
from macaw_llm_tpu.models import fusion
from macaw_llm_tpu.parallel.mesh import create_mesh
from macaw_llm_tpu.train.checkpoint import CheckpointManager, load_config
from macaw_llm_tpu.train.state import merge_params
from macaw_llm_tpu.train.trainer import Trainer
from macaw_llm_tpu.utils.logging import setup_logging

logger = logging.getLogger("macaw.inference")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Macaw-TPU inference/eval")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="checkpoint dir written by run_train")
    p.add_argument("--dataset", type=str, default="vqa")
    p.add_argument("--val-json", type=str, default=None)
    p.add_argument("--names", type=str, default=None)
    p.add_argument("--tokenizer", type=str, required=True,
                   help="tokenizer dir/name (the reference always loads "
                        "one, run_clm_llms_inference.py:417); generation "
                        "cannot encode prompts without it")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-examples", type=int, default=None)
    p.add_argument("--max-new-tokens", type=int, default=None)
    p.add_argument("--num-beams", type=int, default=1)
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="prompt-lookup speculative decoding with K draft "
                        "tokens per verify forward (greedy only; output "
                        "identical to the non-speculative greedy path)")
    p.add_argument("--output-dir", type=str, default="eval_outputs")
    p.add_argument("--align-cache", default="bf16",
                   choices=["bf16", "int8", "off"],
                   help="precomputed alignment K/V projections + packed "
                        "tower qkv (inference layout; off = reference-"
                        "style per-step projection)")
    return p.parse_args(argv)


def restore_params(checkpoint_dir: str, cfg: Config) -> dict:
    """Whole-model restore (reference MM_LLMs.from_pretrained,
    run_clm_llms_inference.py:455-461)."""
    mesh = create_mesh(cfg.mesh)
    trainer = Trainer(cfg, mesh, total_steps=1)
    params = fusion.init_params(
        jax.random.PRNGKey(cfg.train.seed), cfg.model)
    state = trainer.init_state(params)
    mgr = CheckpointManager(checkpoint_dir)
    restored = mgr.restore(state)
    if restored is None:
        raise FileNotFoundError(
            f"no checkpoint under {checkpoint_dir}")
    return merge_params(restored.trainable, restored.frozen)


def main(argv=None):
    args = parse_args(argv)
    setup_logging()
    cfg = load_config(args.checkpoint) or Config()
    params = restore_params(args.checkpoint, cfg)
    from macaw_llm_tpu.serve import _init_align_cache
    params, align_cache = _init_align_cache(params, cfg.model,
                                            args.align_cache)

    val_json = args.val_json or os.path.join(
        "data", args.dataset, f"{args.dataset}_val_inference.json")
    cap = args.max_examples or cfg.data.max_eval_samples
    examples = load_val_examples(val_json, cap)

    media = None
    if args.names:
        with open(args.names) as f:
            names = json.load(f)["list"]
        media = MediaSource(names, cfg.data,
                            image_size=cfg.model.vision.image_size,
                            n_frames=cfg.model.fusion.n_frames)

    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)

    out_path = os.path.join(args.output_dir,
                            f"{args.dataset}_eval_outputs.json")
    results = batch_inference_generation(
        params, cfg, tokenizer, examples, media,
        batch_size=args.batch_size,
        max_new_tokens=args.max_new_tokens,
        num_beams=args.num_beams,
        speculative=args.speculative,
        out_path=out_path,
        align_cache=align_cache)
    logger.info("wrote %d generations to %s", len(results), out_path)
    return results


if __name__ == "__main__":
    main()
