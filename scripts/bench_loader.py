"""Host input-pipeline benchmark: can the loader feed the chip?

Generates realistic media fixtures (224x224 JPEGs, 30 s 16 kHz WAVs,
120-frame video directories — the reference's storage layout,
llm_trainer.py:160-181), then measures BatchLoader throughput in
examples/sec at several decode-worker counts. Compare against the
train-step consumption rate in BENCH.md: the pipeline must sustain
>= 2x the step rate to never stall the device.

Usage: python scripts/bench_loader.py [--batch 32] [--n 256] [--accum 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_fixtures(root: str, n_videos: int, n_images: int,
                  n_frames: int = 120) -> dict:
    from PIL import Image
    img_dir = os.path.join(root, "frames")
    audio_dir = os.path.join(root, "audios")
    coco_dir = os.path.join(root, "coco")
    for d in (img_dir, audio_dir, coco_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)

    def noisy_jpeg(path):
        base = rng.randint(0, 255, (28, 28, 3), np.uint8)
        img = np.kron(base, np.ones((8, 8, 1), np.uint8))  # 224x224
        Image.fromarray(img).save(path, quality=85)

    names = []
    for v in range(n_videos):
        name = f"vid{v}"
        names.append(name)
        for i in range(n_frames):
            noisy_jpeg(os.path.join(img_dir, f"{name}_{i}.jpg"))
        # 30 s of 16 kHz PCM16
        import wave as W
        pcm = (rng.randn(480000) * 3000).astype(np.int16)
        with W.open(os.path.join(audio_dir, f"{name}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
    for i in range(n_images):
        name = f"img{i}.jpg"
        names.append(name)
        noisy_jpeg(os.path.join(coco_dir, name))
    return {"img_dir": img_dir, "audio_dir": audio_dir,
            "coco_dir": coco_dir, "names": names,
            "n_videos": n_videos, "n_images": n_images}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--n", type=int, default=256,
                   help="dataset examples per epoch")
    p.add_argument("--videos", type=int, default=8)
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--workers", type=int, nargs="*",
                   default=[1, 4, 8, 16])
    args = p.parse_args()

    from macaw_llm_tpu.config import DataConfig, IGNORE_ID
    from macaw_llm_tpu.data.datasets import TokenizedDataset
    from macaw_llm_tpu.data.loader import BatchLoader, MediaSource
    from macaw_llm_tpu.data import native

    with tempfile.TemporaryDirectory() as root:
        fx = make_fixtures(root, args.videos, args.images)
        n = args.n
        rng = np.random.RandomState(1)
        L = 256
        ids = rng.randint(16, 32000, (n, L)).astype(np.int32)
        labels = ids.copy()
        labels[:, :8] = IGNORE_ID
        # media layout mirroring the reference mix: every example has a
        # video+audio or an image (index into the shared name table)
        vids = np.full((n,), -1, np.int32)
        auds = np.full((n,), -1, np.int32)
        imgs = np.full((n,), -1, np.int32)
        for i in range(n):
            if i % 2 == 0:
                vids[i] = i % fx["n_videos"]
                auds[i] = i % fx["n_videos"]
            else:
                imgs[i] = fx["n_videos"] + (i % fx["n_images"])
        ds = TokenizedDataset(
            input_ids=ids, attention_mask=np.ones((n, L), np.int32),
            labels=labels, images=imgs, audios=auds, videos=vids)
        dcfg = DataConfig(image_dir=fx["img_dir"] + "/",
                          audio_dir=fx["audio_dir"] + "/",
                          coco_dir=fx["coco_dir"] + "/")
        print(f"native decoder: {native.available()}", file=sys.stderr)

        results = {}
        for w in args.workers:
            media = MediaSource(fx["names"], dcfg, image_size=224,
                                n_frames=6)
            loader = BatchLoader(ds, media, global_batch=args.batch,
                                 accum=args.accum, num_workers=w,
                                 prefetch=2)
            # warm one batch (thread pools, page cache)
            it = loader.epoch(0)
            next(it)
            t0 = time.perf_counter()
            count = 0
            for _ in it:
                count += 1
            dt = time.perf_counter() - t0
            ex_s = count * args.batch / dt
            results[w] = round(ex_s, 1)
            print(f"workers={w:3d}  {ex_s:8.1f} examples/sec  "
                  f"({count} batches in {dt:.2f}s)", file=sys.stderr)

        print(json.dumps({"metric": "loader examples/sec by workers",
                          "value": results[max(results)],
                          "unit": "examples/sec",
                          "by_workers": results}))


if __name__ == "__main__":
    main()
