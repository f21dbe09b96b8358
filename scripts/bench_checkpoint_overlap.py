"""Measure what an in-flight checkpoint save costs the train loop.

VERDICT r3 #5 asked for the step-time impact of an overlapped save. Two
schemes, both on the real chip at the 1b full-fine-tune profile:

  * snapshot=True (default): the mutable state is copied on-device into
    non-donated buffers, then Orbax's d2h read + disk write run in the
    background while training continues. Cost = the on-device copy
    (HBM-bandwidth bounded) + whatever the background d2h steals from
    the step's own HBM traffic.
  * snapshot=False: the save fences (`wait_until_finished`) so the next
    step's donation cannot race the async writer's device reads — the
    step loop stalls for the full d2h duration (~4 MB/s over the axon
    relay, so this is dominated by transfer, not disk).

Reports steady-state step time, per-step times in the overlap window
right after a snapshot save, the snapshot call's own latency, and the
fenced save's stall, plus checkpoint size. Reference behavior matched:
ZeRO-3 gather-on-save (configs/deepspeed_config.json:40) without
stalling semantics.

Usage: python scripts/bench_checkpoint_overlap.py [--profile 1b]
       [--batch 12] [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="1b",
                    choices=["1b", "7b", "tiny"])
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--lora", action="store_true",
                    help="QLoRA r=8 over an int8 frozen base (the 7b "
                         "training config; snapshot=True's sweet spot — "
                         "the mutable copy is adapters-only). A 1b FULL "
                         "fine-tune's mutable state is ~9.4 GiB, so the "
                         "snapshot copy itself OOMs one v5e: measured, "
                         "see BENCH.md — full-FT saves use "
                         "snapshot=False (fenced) on one chip")
    ap.add_argument("--scheme", default="both",
                    choices=["both", "snapshot", "fenced"],
                    help="which save scheme(s) to measure; the fenced "
                         "scheme's stall is the full state d2h at the "
                         "relay's ~10 MiB/s, so 7b runs may want "
                         "--scheme snapshot")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from macaw_llm_tpu.config import (Config, IGNORE_ID, MeshConfig,
                                      TrainConfig, macaw_1b, macaw_7b,
                                      tiny_model_config)
    from macaw_llm_tpu.models import fusion
    from macaw_llm_tpu.parallel.mesh import create_mesh
    from macaw_llm_tpu.train.checkpoint import CheckpointManager
    from macaw_llm_tpu.train.trainer import Trainer

    base = {"1b": macaw_1b, "7b": macaw_7b,
            "tiny": tiny_model_config}[args.profile]()
    mcfg = dataclasses.replace(base, dtype="bfloat16", remat=True,
                               remat_policy="nothing", loss_chunk=256)
    lora = args.lora
    tcfg = TrainConfig(per_device_batch_size=args.batch,
                       grad_accum_steps=1, freeze_encoders=True,
                       lora_rank=8 if lora else 0, quantize_base=lora,
                       grad_dtype="float32" if lora else "bfloat16",
                       mu_dtype="float32" if lora else "bfloat16")
    cfg = Config(model=mcfg, mesh=MeshConfig(data=1, fsdp=1, tensor=1),
                 train=tcfg)
    mesh = create_mesh(cfg.mesh, jax.devices()[:1])

    if lora:
        from macaw_llm_tpu.train.lora import init_lora
        from macaw_llm_tpu.utils.quantize import quantize_llama

        def _init(k1, k2):
            p = fusion.init_params(k1, mcfg, param_dtype=jnp.bfloat16)
            p["llm"] = quantize_llama(p["llm"])
            p["llm"]["layers"]["lora"] = init_lora(k2, mcfg.llm,
                                                   tcfg.lora_rank)
            return p

        params = jax.jit(_init)(jax.random.PRNGKey(0),
                                jax.random.PRNGKey(1))
    else:
        params = jax.jit(lambda k: fusion.init_params(
            k, mcfg, param_dtype=jnp.float32))(jax.random.PRNGKey(0))
        for k in ("image_encoder", "video_encoder", "audio_encoder"):
            params[k] = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                     params[k])
    jax.block_until_ready(params)
    trainer = Trainer(cfg, mesh, total_steps=1000)
    state = trainer.init_state(params, donate=True)
    del params

    b, s = args.batch, args.seq
    rng = np.random.RandomState(0)
    ids = rng.randint(16, 32000, (1, b, s)).astype(np.int32)
    ids[:, :, 0] = 1
    labels = ids.copy()
    labels[:, :, :8] = IGNORE_ID
    vis = mcfg.vision
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((1, b, s), jnp.int32),
        "labels": jnp.asarray(labels),
        "images": jnp.asarray(
            rng.randint(0, 255, (1, b, vis.image_size, vis.image_size, 3)),
            jnp.uint8),
        "audios": jnp.asarray(rng.randn(1, b, 480000) * 0.1, jnp.float32),
        "videos": jnp.asarray(
            rng.randint(0, 255, (1, b, mcfg.fusion.n_frames,
                                 vis.image_size, vis.image_size, 3)),
            jnp.uint8),
    }

    def step_timed():
        nonlocal state
        t0 = time.perf_counter()
        state, m = trainer.train_step(state, batch)
        np.asarray(m["loss"])   # force: per-step wall time, not dispatch
        return time.perf_counter() - t0

    ms = lambda xs: sum(xs) / len(xs) * 1e3

    # warmup (compile) + steady state
    for _ in range(3):
        step_timed()
    steady = [step_timed() for _ in range(args.steps)]

    mutable_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(
            (state.trainable, state.opt_state))
        if isinstance(x, jax.Array))
    frozen_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(state.frozen)
        if isinstance(x, jax.Array))
    print(f"\nprofile={args.profile} batch={b} "
          f"mutable_state={mutable_bytes / 2**30:.2f} GiB "
          f"frozen={frozen_bytes / 2**30:.2f} GiB", flush=True)
    print(f"  steady-state step          : {ms(steady):7.1f} ms "
          f"({[f'{x * 1e3:.0f}' for x in steady]})", flush=True)

    overhead = t_fenced = None
    if args.scheme in ("both", "snapshot"):
        # ---- snapshot=True: save, then keep stepping (overlap window) ----
        d1 = tempfile.mkdtemp(prefix="ck_overlap_")
        mgr = CheckpointManager(d1, save_steps=1, snapshot=True)
        t0 = time.perf_counter()
        assert mgr.save(state, force=True)
        t_call = time.perf_counter() - t0
        print(f"  snapshot save() call       : {t_call * 1e3:7.1f} ms "
              f"(on-device copy + async handoff)", flush=True)
        overlapped = [step_timed() for _ in range(args.steps)]
        overhead = ms(overlapped) - ms(steady)
        print(f"  steps while save in flight : {ms(overlapped):7.1f} ms "
              f"({[f'{x * 1e3:.0f}' for x in overlapped]})  "
              f"[{overhead:+.1f} ms/step vs steady]", flush=True)
        t0 = time.perf_counter()
        mgr.wait()
        t_drain = time.perf_counter() - t0
        print(f"  residual drain after steps : {t_drain:7.1f} s "
              f"(background d2h+write finishing)", flush=True)
        mgr.close()
        shutil.rmtree(d1, ignore_errors=True)

    if args.scheme in ("both", "fenced"):
        # ---- snapshot=False: the fenced save's full stall ----
        d2 = tempfile.mkdtemp(prefix="ck_fenced_")
        mgr2 = CheckpointManager(d2, save_steps=1, snapshot=False)
        step_timed()   # advance step id so the save isn't deduped
        t0 = time.perf_counter()
        assert mgr2.save(state, force=True)
        t_fenced = time.perf_counter() - t0
        after_fenced = [step_timed() for _ in range(2)]
        print(f"  fenced save (snapshot=False): {t_fenced:6.1f} s stall "
              f"(then {ms(after_fenced):.1f} ms steps)", flush=True)
        mgr2.close()
        shutil.rmtree(d2, ignore_errors=True)

    if overhead is not None and t_fenced is not None:
        print(f"\n  overlap overhead: {overhead:+.1f} ms/step "
              f"vs a {t_fenced:.1f} s hard stall", flush=True)


if __name__ == "__main__":
    main()
