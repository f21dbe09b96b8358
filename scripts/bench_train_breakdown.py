"""Train-step time breakdown on the real chip (VERDICT r3 #9).

Explains where the 1b full-fine-tune step goes (BENCH.md recorded 24%
"LLM MFU" at batch 12 with no decomposition). Times, each isolated on
the chip with forced readbacks:

  * full train step (fwd + bwd + AdamW update), remat policies
    nothing / dots / off
  * forward-only loss (same dropout/remat config)
  * value_and_grad only (no optimizer)  -> optimizer cost by subtraction
  * tower-only forward (fusion.prepare_inputs: CLIP x2 + Whisper + mel +
    align + splice) -> the frozen-tower share of the forward

The "LLM MFU" metric divides 6 * N_llm * tokens by the WHOLE step time:
it charges the LLM for tower forwards (frozen CLIP/Whisper/fusion still
run + get rematerialized in the bwd of everything downstream), remat
recompute, and the optimizer's HBM sweep. This script splits those out.

Each section can run alone via --only (step:nothing / step:dots /
step:off / parts) — at 1b the three full-step compiles plus the parts in
one process exhaust the compile helper / HBM; scripts/run one per
process and results print as they are measured.

Usage: python scripts/bench_train_breakdown.py [--profile 1b] [--batch 12]
       [--only step:nothing|step:dots|step:off|parts]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="1b", choices=["1b", "7b", "tiny"])
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--only", default=None,
                    choices=["step:nothing", "step:dots", "step:off",
                             "parts"])
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
    from macaw_llm_tpu.train.trainer import Trainer, _loss_fn

    base = {"1b": macaw_1b, "7b": macaw_7b,
            "tiny": tiny_model_config}[args.profile]()

    def build(remat, policy):
        mcfg = dataclasses.replace(base, dtype="bfloat16", remat=remat,
                                   remat_policy=policy, loss_chunk=256)
        tcfg = TrainConfig(per_device_batch_size=args.batch,
                           grad_accum_steps=1, freeze_encoders=True,
                           grad_dtype="bfloat16", mu_dtype="bfloat16")
        cfg = Config(model=mcfg, mesh=MeshConfig(data=1, fsdp=1, tensor=1),
                     train=tcfg)
        return cfg

    cfg = build(True, "nothing")
    mesh = create_mesh(cfg.mesh, jax.devices()[:1])

    def fresh_params():
        # fp32 masters for trainables, bf16 frozen towers — init fresh per
        # trainer state and DONATE into it (bench.py pattern): keeping one
        # long-lived fp32 copy alive across three trainer states OOMs at 1b
        p = jax.jit(lambda k: fusion.init_params(
            k, cfg.model, param_dtype=jnp.float32))(jax.random.PRNGKey(0))
        for k in ("image_encoder", "video_encoder", "audio_encoder"):
            p[k] = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p[k])
        jax.block_until_ready(p)
        return p

    b, s = args.batch, args.seq
    rng = np.random.RandomState(0)
    ids = rng.randint(16, 32000, (1, b, s)).astype(np.int32)
    ids[:, :, 0] = 1
    labels = ids.copy()
    labels[:, :, :8] = IGNORE_ID
    vis = cfg.model.vision
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((1, b, s), jnp.int32),
        "labels": jnp.asarray(labels),
        "images": jnp.asarray(
            rng.randint(0, 255, (1, b, vis.image_size, vis.image_size, 3)),
            jnp.uint8),
        "audios": jnp.asarray(rng.randn(1, b, 480000) * 0.1, jnp.float32),
        "videos": jnp.asarray(
            rng.randint(0, 255, (1, b, cfg.model.fusion.n_frames,
                                 vis.image_size, vis.image_size, 3)),
            jnp.uint8),
    }
    mb = jax.tree.map(lambda x: x[0], batch)

    def timed(f, warmup=2):
        """f() returns an array whose scalar [0...] readback closes the
        dispatch chain. Under the axon relay block_until_ready returns
        early (BENCH.md), so timing is a chain of `steps` dispatches with
        ONE forced host readback at the end, amortizing the ~29 ms RTT."""
        import numpy as _np

        def force(out):
            # reduce to one element ON DEVICE before the d2h: a large
            # output (e.g. the towers' [B, fused, H] embeds, ~15 MB)
            # would otherwise pay the relay's ~10 MiB/s for the full
            # buffer and dominate the measurement
            if isinstance(out, jax.Array) and out.size > 1:
                out = out.ravel()[0]
            return _np.asarray(out)

        for _ in range(warmup):
            out = f()
        force(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = f()
        force(out)
        return (time.perf_counter() - t0) / args.steps

    # LLM FLOPs accounting (matches bench.py: 6N per token full-FT fwd+bwd,
    # 2N fwd-only; prefix adds 56 positions to the text seq)
    lcfg = cfg.model.llm
    n_llm = (lcfg.padded_vocab * lcfg.hidden_size * 2   # embed + lm_head
             + lcfg.num_layers * (4 * lcfg.hidden_size ** 2
                                  + 3 * lcfg.hidden_size
                                  * lcfg.intermediate_size))
    fused_len = s + cfg.model.total_prefix_len
    tokens = b * fused_len
    peak = 197e12

    import gc

    results = {}
    print(f"profile={args.profile} batch={b} fused_len={fused_len} "
          f"N_llm={n_llm / 1e9:.2f}B tokens/step={tokens}", flush=True)

    def report(name, t):
        results[name] = t
        mfu = 6 * n_llm * tokens / t / peak
        print(f"  {name:28s}: {t * 1e3:7.1f} ms   "
              f"(6N 'LLM MFU' if this were the whole step: {mfu * 100:.0f}%)",
              flush=True)

    # ---- full step, three remat configs ----
    for only, (remat, policy) in (("step:nothing", (True, "nothing")),
                                  ("step:dots", (True, "dots")),
                                  ("step:off", (False, "nothing"))):
        if args.only and args.only != only:
            continue
        name = f"step[remat={policy if remat else 'off'}]"
        c = build(remat, policy)
        trainer = Trainer(c, mesh, total_steps=1000)
        state = trainer.init_state(fresh_params(), donate=True)
        try:
            def run():
                nonlocal state
                state, m = trainer.train_step(state, batch)
                return m["loss"]
            report(name, timed(run))
        except Exception as e:  # noqa: BLE001 — OOM at remat=off is a result
            results[name] = None
            print(f"  {name:28s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
        del state, trainer
        gc.collect()

    if args.only in (None, "parts"):
        # forward / grad-only / towers on a LIGHT param set: bf16
        # trainables (the step's compute dtype) + bf16 frozen, NO
        # optimizer state — the full-step sections above already price
        # the optimizer; carrying fp32 masters + moments here OOMs the
        # non-donated value_and_grad at 1b batch 12
        from macaw_llm_tpu.train.state import merge_params, split_params
        mcfg = cfg.model
        p = jax.jit(lambda k: fusion.init_params(
            k, mcfg, param_dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
        jax.block_until_ready(p)
        trainable, frozen = split_params(
            p, freeze_encoders=cfg.train.freeze_encoders)
        key = jax.random.PRNGKey(1)

        fwd = jax.jit(lambda t, f, m, r: _loss_fn(t, f, mcfg, m, r))
        report("forward loss", timed(lambda: fwd(trainable, frozen, mb, key)))

        gfn = jax.jit(jax.value_and_grad(
            lambda t, f, m, r: _loss_fn(t, f, mcfg, m, r)))
        report("fwd+bwd (no optimizer)",
               timed(lambda: gfn(trainable, frozen, mb, key)[0]))
        del gfn
        gc.collect()

        # tower-only forward (frozen CLIP x2 + Whisper + align + splice)
        prep = jax.jit(lambda p, m: fusion.prepare_inputs(
            p, mcfg, input_ids=m["input_ids"], images=m["images"],
            audios=m["audios"], videos=m["videos"],
            attention_mask=m["attention_mask"]))
        full = merge_params(trainable, frozen)
        report("towers fwd (prepare_inputs)",
               timed(lambda: prep(full, mb).inputs_embeds))

    t_step = results.get("step[remat=nothing]")
    t_grad = results.get("fwd+bwd (no optimizer)")
    t_fwd = results.get("forward loss")
    t_tower = results.get("towers fwd (prepare_inputs)")
    if all(x is not None for x in (t_step, t_grad, t_fwd, t_tower)):
        print("\ndecomposition (remat=nothing step):")
        print(f"  towers fwd      : {t_tower * 1e3:7.1f} ms "
              f"({t_tower / t_step * 100:.0f}% of step)")
        print(f"  LLM fwd (+CE)   : {(t_fwd - t_tower) * 1e3:7.1f} ms")
        print(f"  bwd (incl remat): {(t_grad - t_fwd) * 1e3:7.1f} ms")
        print(f"  optimizer+clip  : {(t_step - t_grad) * 1e3:7.1f} ms "
              f"({t_step - t_grad and (t_step - t_grad) / t_step * 100:.0f}%"
              f" of step)")


if __name__ == "__main__":
    main()
