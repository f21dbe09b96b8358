"""Offline preprocessing entry point — the TPU-native preprocess_data*.py.

Stage 1 (media extraction, host tools): video -> 120 sampled JPEG frames +
16 kHz WAV audio (reference preprocess_data.py). Needs OpenCV/ffmpeg on
the host; both are gated and reported if missing.

Stage 2 (dataset build): VQA / Alpaca / AVSD JSON -> tokenized npz cache +
name table (reference preprocess_data_supervised.py:378-451), using the
exact prompt/masking recipe (see data/datasets.py).

Usage:
    python -m macaw_llm_tpu.run_preprocess extract-media \
        --videos data/avsd/videos --out data/avsd
    python -m macaw_llm_tpu.run_preprocess build \
        --tokenizer trained_models/llama_tokenizer \
        --vqa data/vqa/train.json --alpaca data/alpaca_data.json \
        --avsd data/avsd/train.json --out data/train_cache.npz \
        --names-out data/all_visual_names.json --per-part 50000
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import subprocess
import sys

import numpy as np

from macaw_llm_tpu.config import SPECIAL_TOKENS
from macaw_llm_tpu.data.datasets import (build_alpaca, build_avsd,
                                         build_name_table, build_vqa,
                                         mix_datasets)
from macaw_llm_tpu.utils.logging import setup_logging

logger = logging.getLogger("macaw.preprocess")


def extract_media(videos_dir: str, out_dir: str, n_frames: int = 120):
    """Frames via OpenCV (reference preprocess_data.py:42-86 semantics:
    uniform n_frames sample, resample if shorter) + audio via ffmpeg
    (moviepy equivalent, :29-39)."""
    frames_dir = os.path.join(out_dir, "frames")
    audio_dir = os.path.join(out_dir, "audios")
    os.makedirs(frames_dir, exist_ok=True)
    os.makedirs(audio_dir, exist_ok=True)
    try:
        import cv2
    except ImportError:
        cv2 = None
        logger.warning("OpenCV unavailable — frame extraction skipped")
    import shutil
    ffmpeg = shutil.which("ffmpeg")
    if not ffmpeg:
        logger.warning("ffmpeg unavailable — audio extraction skipped")

    for path in sorted(glob.glob(os.path.join(videos_dir, "*.mp4"))):
        name = os.path.splitext(os.path.basename(path))[0]
        if cv2 is not None:
            cap = cv2.VideoCapture(path)
            frames = []
            ok, frame = cap.read()
            while ok:
                frames.append(frame)
                ok, frame = cap.read()
            cap.release()
            if frames:
                idx = np.linspace(0, len(frames) - 1, n_frames).astype(int)
                for i, fi in enumerate(idx):
                    cv2.imwrite(os.path.join(frames_dir,
                                             f"{name}_{i}.jpg"),
                                frames[fi])
        if ffmpeg:
            subprocess.run(
                [ffmpeg, "-y", "-i", path, "-vn", "-ac", "1", "-ar",
                 "16000", os.path.join(audio_dir, f"{name}.wav")],
                check=False, capture_output=True)
        logger.info("extracted %s", name)


def build(args):
    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    # centralize the vocab extension (reference added specials twice,
    # preprocess_data_supervised.py:384-398 — SURVEY quirk #6)
    tokenizer.add_special_tokens({
        "additional_special_tokens": list(SPECIAL_TOKENS.keys()),
        "pad_token": "[PAD]",
    })
    if args.tokenizer_out:
        tokenizer.save_pretrained(args.tokenizer_out)

    image_names, video_names = [], []
    parts = []
    rng = np.random.RandomState(args.seed)

    vqa_rows = json.load(open(args.vqa)) if args.vqa else []
    avsd_rows = json.load(open(args.avsd)) if args.avsd else []
    alpaca_rows = json.load(open(args.alpaca)) if args.alpaca else []

    image_names = sorted({r["image"] for r in vqa_rows if "image" in r})
    video_names = sorted({r["video"] for r in avsd_rows})
    table = build_name_table(image_names, video_names)
    if args.names_out:
        with open(args.names_out, "w") as f:
            json.dump(table, f)

    if vqa_rows:
        parts.append(build_vqa(tokenizer, vqa_rows, table["dict"],
                               args.max_len))
    if alpaca_rows:
        parts.append(build_alpaca(tokenizer, alpaca_rows, args.max_len))
    if avsd_rows:
        parts.append(build_avsd(tokenizer, avsd_rows, table["dict"],
                                args.max_len))
    if not parts:
        logger.error("no input datasets given")
        return 1
    mixed = mix_datasets(rng, parts, per_part=args.per_part)
    mixed.save(args.out)
    logger.info("wrote %d examples to %s", len(mixed), args.out)
    return 0


def main(argv=None):
    setup_logging()
    p = argparse.ArgumentParser(description="Macaw-TPU preprocessing")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract-media")
    pe.add_argument("--videos", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--n-frames", type=int, default=120)

    pb = sub.add_parser("build")
    pb.add_argument("--tokenizer", required=True)
    pb.add_argument("--tokenizer-out", default=None)
    pb.add_argument("--vqa", default=None)
    pb.add_argument("--alpaca", default=None)
    pb.add_argument("--avsd", default=None)
    pb.add_argument("--out", required=True)
    pb.add_argument("--names-out", default=None)
    pb.add_argument("--max-len", type=int, default=256)
    pb.add_argument("--per-part", type=int, default=50000)
    pb.add_argument("--seed", type=int, default=0)

    args = p.parse_args(argv)
    if args.cmd == "extract-media":
        extract_media(args.videos, args.out, args.n_frames)
        return 0
    return build(args)


if __name__ == "__main__":
    sys.exit(main())
