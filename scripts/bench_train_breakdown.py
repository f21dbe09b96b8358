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

Usage: python scripts/bench_train_breakdown.py [--profile 1b] [--batch 12]
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
        for _ in range(warmup):
            out = f()
        _np.asarray(out).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = f()
        _np.asarray(out).ravel()[0]
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

    results = {}

    # ---- full step, three remat configs ----
    for name, (remat, policy) in (("step[remat=nothing]", (True, "nothing")),
                                  ("step[remat=dots]", (True, "dots")),
                                  ("step[remat=off]", (False, "nothing"))):
        c = build(remat, policy)
        trainer = Trainer(c, mesh, total_steps=1000)
        state = trainer.init_state(fresh_params(), donate=True)
        try:
            def run():
                nonlocal state
                state, m = trainer.train_step(state, batch)
                return m["loss"]
            results[name] = timed(run)
        except Exception as e:  # noqa: BLE001 — OOM at remat=off is a result
            results[name] = None
            print(f"{name:26s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")
        del state, trainer

    # ---- forward-only and grad-only, remat=nothing config ----
    trainer = Trainer(cfg, mesh, total_steps=1000)
    state = trainer.init_state(fresh_params(), donate=True)
    mcfg = cfg.model
    key = jax.random.PRNGKey(1)

    fwd = jax.jit(lambda t, f, m, r: _loss_fn(t, f, mcfg, m, r))
    results["forward loss"] = timed(
        lambda: fwd(state.trainable, state.frozen, mb, key))

    # bf16 trainables for the grad-only pass: matches the step's compute
    # dtype and halves the extra HBM the non-donated value_and_grad needs
    diff = jax.tree.map(lambda x: x.astype(jnp.bfloat16), state.trainable)
    gfn = jax.jit(jax.value_and_grad(
        lambda t, f, m, r: _loss_fn(t, f, mcfg, m, r)))
    results["fwd+bwd (no optimizer)"] = timed(
        lambda: gfn(diff, state.frozen, mb, key)[0])
    del diff, gfn

    # ---- tower-only forward (frozen CLIP x2 + Whisper + align + splice) ----
    prep = jax.jit(lambda p, m: fusion.prepare_inputs(
        p, mcfg, input_ids=m["input_ids"], images=m["images"],
        audios=m["audios"], videos=m["videos"],
        attention_mask=m["attention_mask"]))
    from macaw_llm_tpu.train.state import merge_params
    full = merge_params(state.trainable, state.frozen)
    results["towers fwd (prepare_inputs)"] = timed(
        lambda: prep(full, mb).inputs_embeds)

    print(f"\nprofile={args.profile} batch={b} fused_len={fused_len} "
          f"N_llm={n_llm / 1e9:.2f}B tokens/step={tokens}")
    for name, t in results.items():
        if t is None:
            continue
        mfu = 6 * n_llm * tokens / t / peak
        print(f"  {name:28s}: {t * 1e3:7.1f} ms   "
              f"(6N 'LLM MFU' if this were the whole step: {mfu * 100:.0f}%)")

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
