"""Int8 weight-only quantization for serving.

The reference scaffolds bitsandbytes ``load_in_8bit`` but never enables it
(run_clm_llms.py:489, requirements.txt:20). TPU-native version: symmetric
per-output-channel int8 for the LLaMA matmul weights. Decode is
HBM-bandwidth-bound (every step streams all weights), so halving weight
bytes directly lifts tokens/sec; XLA fuses the int8->bf16 convert into the
matmul operand read.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

QUANT_KEYS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def quantize_tensor(w: jnp.ndarray, reduce_axis: int = -2
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 with per-output-channel scale.

    Reduces |w| over the contraction (input) axis only — for our [in, out]
    / stacked [L, in, out] weights that is axis -2 — so leading layer-stack
    axes keep their size (lax.scan slices them per layer)."""
    amax = jnp.max(jnp.abs(w), axis=reduce_axis, keepdims=True)
    scale = (amax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / jnp.maximum(scale, 1e-12)), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize(q: jnp.ndarray, scale: jnp.ndarray,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_llama(params: dict) -> dict:
    """LLaMA param pytree -> same tree with attn/mlp weights replaced by
    {"q": int8, "s": scale} records. Norms/embeddings stay bf16/fp32
    (embeddings feed the alignment attention and the prefix lookups)."""
    out = dict(params)
    layers = dict(params["layers"])
    for group in ("attn", "mlp"):
        g = dict(layers[group])
        for k in list(g.keys()):
            if k in QUANT_KEYS:
                qv, sv = quantize_tensor(g[k])
                g[k] = {"q": qv, "s": sv}
        layers[group] = g
    out["layers"] = layers
    qh, sh = quantize_tensor(params["lm_head"])
    out["lm_head"] = {"q": qh, "s": sh}
    return out


def maybe_dequant(w, dtype):
    """Weight accessor used by the decoder: plain array or int8 record."""
    if isinstance(w, dict) and "q" in w:
        return dequantize(w["q"], w["s"], dtype)
    return w.astype(dtype)


def matmul(x: jnp.ndarray, w, compute) -> jnp.ndarray:
    """x [B, S, K] @ weight (plain or int8 record) -> [B, S, N].

    Benchmarked on v5e: XLA's fused dequantize-matmul (1442 tok/s decode)
    currently beats the Pallas int8 kernel (1288 tok/s) — XLA pipelines the
    convert into the operand stream well. The Pallas path stays available
    via MACAW_INT8_PALLAS=1 for kernel iteration (see BENCH.md).
    """
    if not (isinstance(w, dict) and "q" in w):
        return x @ w.astype(compute)
    import os
    b, s_len, k = x.shape
    rows = b * s_len
    if (os.environ.get("MACAW_INT8_PALLAS") == "1" and rows <= 64
            and w["q"].ndim == 2):
        from macaw_llm_tpu.ops.pallas.int8_matmul import int8_matmul
        out = int8_matmul(x.reshape(rows, k).astype(compute), w["q"],
                          w["s"].reshape(1, -1))
        return out.reshape(b, s_len, -1)
    return x @ dequantize(w["q"], w["s"], compute)
