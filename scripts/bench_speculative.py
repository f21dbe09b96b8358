"""Speculative-decoding mechanism benchmark on the real chip.

Measures the three numbers that bound prompt-lookup speculative decoding:
  * plain greedy decode tokens/sec (the baseline)
  * ngram-proposer speculative on unstructured prompts (acceptance ~= 0
    floor — VQA-style short answers with no prompt overlap; measures the
    mechanism's pure overhead: drafting VPU work + wasted verify slots)
  * oracle-draft speculative (acceptance = 1 ceiling) — the drafts ARE
    the greedy continuation, so every verify forward emits
    draft_len + 1 tokens; real workloads land between floor and ceiling
    in proportion to their n-gram hit rate (grounded AVSD answers that
    copy prompt spans sit near the ceiling).

Also reports the verify-forward cost vs the single-token step cost (on an
HBM-bound decode both stream the same weight bytes, so the ratio should
be near 1 — that ratio IS the mechanism's headroom) and the break-even
acceptance rate implied by the measured floor/ceiling.

Real accept rates on eval text require trained weights, which neither
this repo nor the reference ships; the floor/ceiling bound is the honest
on-chip measurement (BENCH.md records the verdict).

Usage: python scripts/bench_speculative.py [--profile 1b|7b]
       [--batch 16] [--draft-len 4] [--quantize int8] [--kv-quant int8]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--profile", default="7b", choices=["1b", "7b", "tiny"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq", type=int, default=256)
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--draft-len", type=int, default=4)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--quantize", default="int8", choices=["none", "int8"])
    p.add_argument("--kv-quant", default=None, choices=[None, "int8"])
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from macaw_llm_tpu.config import macaw_1b, macaw_7b, tiny_model_config
    from macaw_llm_tpu.generate import generate, generate_speculative
    from macaw_llm_tpu.models import llama

    cfg = {"1b": macaw_1b, "7b": macaw_7b,
           "tiny": tiny_model_config}[args.profile]()
    cfg = dataclasses.replace(cfg, dtype="bfloat16")
    lcfg = cfg.llm

    def _init(key):
        p = llama.init_params(key, lcfg, param_dtype=jnp.bfloat16)
        if args.quantize == "int8":
            from macaw_llm_tpu.utils.quantize import (pack_llama_for_decode,
                                                      quantize_llama)
            p = pack_llama_for_decode(quantize_llama(p))
        return p

    params = jax.jit(_init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    b, s, n = args.batch, args.seq, args.max_new_tokens
    rng = np.random.RandomState(0)
    ids = rng.randint(16, 32000, (b, s)).astype(np.int32)
    ids[:, 0] = 1
    ids_j = jnp.asarray(ids)
    embeds = llama.embed(params, ids_j, jnp.bfloat16)
    mask = jnp.ones((b, s), jnp.int32)

    def timed(f):
        f()
        f()
        ts = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    # plain greedy: the floor, and the oracle's ground truth
    ref = generate(params, lcfg, inputs_embeds=embeds,
                   attention_mask=mask, max_new_tokens=n, eos_id=-1,
                   cache_dtype=args.kv_quant)
    oracle = jax.device_put(ref.tokens)

    t_plain = timed(lambda: np.asarray(
        generate(params, lcfg, inputs_embeds=embeds, attention_mask=mask,
                 max_new_tokens=n, eos_id=-1,
                 cache_dtype=args.kv_quant).tokens)[0, -1])

    def run_spec(proposer):
        return generate_speculative(
            params, lcfg, inputs_embeds=embeds, prompt_ids=ids_j,
            attention_mask=mask, max_new_tokens=n, eos_id=-1,
            draft_len=args.draft_len, proposer=proposer,
            oracle_tokens=oracle if proposer == "oracle" else None,
            cache_dtype=args.kv_quant)

    results = {}
    for proposer in ("ngram", "oracle"):
        out = run_spec(proposer)
        rounds = int(out.num_steps)
        match = (np.asarray(out.tokens) == np.asarray(ref.tokens)).mean()
        t = timed(lambda p=proposer: np.asarray(run_spec(p).tokens)[0, -1])
        results[proposer] = (t, rounds, match)

    tps_plain = b * n / t_plain
    k1 = args.draft_len + 1
    print(f"profile={args.profile} batch={b} new={n} "
          f"draft_len={args.draft_len} quant={args.quantize} "
          f"kv={args.kv_quant or 'bf16'}")
    print(f"  greedy decode      : {t_plain * 1e3:7.1f} ms  "
          f"{tps_plain:7.0f} tok/s  ({n} steps)")
    for proposer, label in (("ngram", "ngram floor (no overlap)"),
                            ("oracle", "oracle ceiling        ")):
        t, rounds, match = results[proposer]
        # emitted/round: batch-min rounds is the loop bound, so
        # b*n/rounds is the effective tokens-per-verify across the batch
        acc = n / max(rounds, 1)
        print(f"  {label}: {t * 1e3:7.1f} ms  {b * n / t:7.0f} tok/s  "
              f"({rounds} verify rounds, {acc:.2f} tok/round, "
              f"greedy-output match {match * 100:.1f}%)")
    t_or, r_or, _ = results["oracle"]
    t_ng, r_ng, _ = results["ngram"]
    ratio = (t_or / max(r_or, 1)) / (t_plain / n)
    print(f"  ceiling speedup {t_plain / t_or:.2f}x "
          f"(ideal {k1}x at equal step cost); floor "
          f"{t_plain / t_ng:.2f}x; verify/step cost ratio {ratio:.2f}")
    # break-even acceptance a* : n/(a*k+1 tokens/round) rounds at the
    # measured per-round cost equals plain decode's n steps
    per_round = t_or / max(r_or, 1)
    per_step = t_plain / n
    a_star = (per_round / per_step - 1.0) / args.draft_len
    print(f"  break-even acceptance: {a_star * 100:.0f}% of drafted "
          f"tokens must be accepted for any win")


if __name__ == "__main__":
    main()
