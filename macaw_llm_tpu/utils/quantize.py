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

# decode matvec backend: "xla" (fused dequant-matmul) or "pallas"
# (ops/pallas/matvec.py weight-streaming kernel). Switched per-process by
# serving/bench entry points BEFORE tracing; a static choice, not a traced
# one. Default stays "xla" until the kernel wins on the target chip
# (scripts/bench_matvec.py measures both).
_DECODE_KERNEL = "xla"


def set_decode_kernel(name: str) -> None:
    global _DECODE_KERNEL
    assert name in ("xla", "pallas"), name
    _DECODE_KERNEL = name


# W8A8 prefill: quantize ACTIVATIONS per-token to int8 and run the native
# s8xs8->s32 MXU matmul. v5e rates 394 int8 TOPS vs 197 bf16 TFLOP/s;
# measured end-to-end at the 7b prefill shape ([4992, 4096] x [4096,
# 12288], scripts/bench_int8_mxu.py): bf16 126.2 TFLOP/s vs W8A8 176.8
# effective incl. the quant + rescale — 1.40x. Per-token activation
# scales and per-channel weight scales both commute with the dot, so the
# only approximation is int8 rounding of the activations. Static
# per-process switch (like _DECODE_KERNEL), set by serving/bench entry
# points before tracing; applies only to multi-row matmuls against
# already-int8 weights (decode matvecs stay on the bandwidth-bound
# weight-only path, where int8 activations buy nothing).
_ACT_QUANT = False
_ACT_QUANT_MIN_ROWS = 256


def set_activation_quant(enabled: bool) -> None:
    global _ACT_QUANT
    _ACT_QUANT = bool(enabled)


@jax.custom_vjp
def _w8a8_dot(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Per-token int8 activations x int8 weights on the native MXU path,
    fp32 output (pre-compute-dtype cast). Wrapped in a custom_vjp so the
    op stays differentiable: jnp.round + the int8 cast otherwise have a
    zero gradient, which would silently kill training through every
    >=_ACT_QUANT_MIN_ROWS-row matmul whenever a train step runs with
    activation quant left on (ADVICE r4). The backward pass is the
    straight-through estimator: d/dx (Q(x) @ W) ~= g @ W^T with the
    dequantized weight — exact up to the rounding the forward already
    accepts."""
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(xs, 1e-12) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        xq, q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y32.astype(jnp.float32) * xs \
        * s.reshape((1,) * (y32.ndim - 1) + (-1,))


def _w8a8_dot_fwd(x, q, s):
    # zero-size marker carries x's dtype through the residuals (a dtype
    # object itself is not a valid pytree leaf)
    return _w8a8_dot(x, q, s), (q, s, jnp.zeros((0,), x.dtype))


def _w8a8_dot_bwd(res, g):
    import numpy as np
    from jax import dtypes
    q, s, x_marker = res
    # STE: route the cotangent through the dequantized weight. One layer's
    # bf16 dequant temp (the scan slices stacks per layer), same footprint
    # as the weight-only backward.
    w = q.astype(jnp.float32) * s
    gx = jax.lax.dot_general(
        g.astype(jnp.float32), w,
        (((g.ndim - 1,), (1,)), ((), ()))).astype(x_marker.dtype)
    # int8 weights take a float0 cotangent; scales are frozen constants.
    gq = np.zeros(q.shape, dtype=dtypes.float0)
    return gx, gq, jnp.zeros_like(s)


_w8a8_dot.defvjp(_w8a8_dot_fwd, _w8a8_dot_bwd)


def quantize_tensor(w: jnp.ndarray, reduce_axis: int = -2
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 with per-output-channel scale.

    Reduces |w| over the contraction (input) axis only — for our [in, out]
    / stacked [L, in, out] weights that is axis -2 — so leading layer-stack
    axes keep their size (lax.scan slices them per layer). Stacked leaves
    quantize via lax.map over the layer dim so the fp32 rounding temp is
    one layer (~180 MB at 7b), not the whole stack (~5.8 GB)."""
    def one(x):
        amax = jnp.max(jnp.abs(x), axis=-2, keepdims=True)
        scale = (amax / 127.0).astype(jnp.float32)
        q = jnp.clip(jnp.round(x.astype(jnp.float32)
                               / jnp.maximum(scale, 1e-12)), -127, 127)
        return q.astype(jnp.int8), scale

    if w.ndim == 3 and reduce_axis == -2:
        return jax.lax.map(one, w)
    assert reduce_axis in (-2, w.ndim - 2)
    return one(w)


def dequantize(q: jnp.ndarray, scale: jnp.ndarray,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_llama(params: dict, donate: bool = False) -> dict:
    """LLaMA param pytree -> same tree with attn/mlp weights replaced by
    {"q": int8, "s": scale} records. Norms/embeddings stay bf16/fp32
    (embeddings feed the alignment attention and the prefix lookups).

    donate=True quantizes leaf-by-leaf through jit with input donation so
    each bf16 weight's HBM is released as its int8 record appears — keeps
    the init-time peak at ~1x the bf16 model instead of 1.5x (QLoRA init
    of a 7b base on one 16 GB chip needs this)."""
    qt = quantize_tensor
    if donate:
        qt = jax.jit(quantize_tensor, donate_argnums=(0,))
    out = dict(params)
    layers = dict(params["layers"])
    for group in ("attn", "mlp"):
        g = dict(layers[group])
        for k in list(g.keys()):
            if k in QUANT_KEYS:
                qv, sv = qt(g[k])
                g[k] = {"q": qv, "s": sv}
        layers[group] = g
    out["layers"] = layers
    qh, sh = qt(params["lm_head"])
    out["lm_head"] = {"q": qh, "s": sh}
    return out


def pack_llama_for_decode(params: dict) -> dict:
    """Serving layout: concatenate wq/wk/wv -> qkv and gate/up -> gateup
    along the output dim (plain arrays or int8 records — per-output
    scales concatenate the same way).

    Decode is HBM-bound and XLA streams one [16, 4096]x[4096, 4096]
    matvec at only ~283 GB/s effective on v5e; a single [4096, 12288]
    stream reaches ~456 GB/s (longer bursts, fewer kernel ramps). The
    decoder dispatches on the "qkv"/"gateup" keys; exact same math
    (split after the dot). Inference-only — LoRA and the partition rules
    target the unpacked names."""
    def cat(a, b=None, c=None):
        parts = [x for x in (a, b, c) if x is not None]
        if isinstance(parts[0], dict):
            return {"q": jnp.concatenate([p["q"] for p in parts], axis=-1),
                    "s": jnp.concatenate([p["s"] for p in parts], axis=-1)}
        return jnp.concatenate(parts, axis=-1)

    out = dict(params)
    layers = dict(params["layers"])
    attn = dict(layers["attn"])
    attn["qkv"] = cat(attn.pop("wq"), attn.pop("wk"), attn.pop("wv"))
    layers["attn"] = attn
    mlp = dict(layers["mlp"])
    mlp["gateup"] = cat(mlp.pop("gate"), mlp.pop("up"))
    layers["mlp"] = mlp
    out["layers"] = layers
    return out


def quantize_towers(params: dict) -> dict:
    """Quantize the CLIP/Whisper encoder projection weights (attention
    q/k/v/o or packed qkv, MLP fc1/fc2, CLIP visual_projection) to int8
    records for the W8A8 serving path. Conv frontends, embeddings and
    norms stay in the compute dtype. The towers run 18912 (CLIP video) /
    24000 (Whisper) activation rows per step, far past the W8A8
    min-rows gate, so with activation quant on every projection lands on
    the native int8 MXU. Layer stacks ([L, in, out]) quantize per layer
    via quantize_tensor's lax.map path and slice to 2D records inside the
    encoder scan."""
    def quant_proj(p: dict) -> dict:
        out = dict(p)
        qv, sv = quantize_tensor(p["w"])
        out["w"] = {"q": qv, "s": sv}
        return out

    def quant_tower(tower: dict) -> dict:
        out = dict(tower)
        layers = dict(tower["layers"])
        attn = {k: quant_proj(v) if isinstance(v, dict) and "w" in v else v
                for k, v in layers["attn"].items()}
        layers["attn"] = attn
        mlp = dict(layers["mlp"])
        for k in ("fc1", "fc2"):
            mlp[k] = quant_proj(mlp[k])
        layers["mlp"] = mlp
        out["layers"] = layers
        if "visual_projection" in out:
            qv, sv = quantize_tensor(out["visual_projection"])
            out["visual_projection"] = {"q": qv, "s": sv}
        return out

    out = dict(params)
    for name in ("image_encoder", "video_encoder", "audio_encoder"):
        if name in out:
            out[name] = quant_tower(out[name])
    return out


def maybe_dequant(w, dtype):
    """Weight accessor used by the decoder: plain array or int8 record."""
    if isinstance(w, dict) and "q" in w:
        return dequantize(w["q"], w["s"], dtype)
    return w.astype(dtype)


def matmul(x: jnp.ndarray, w, compute) -> jnp.ndarray:
    """x [B, S, K] @ weight (plain or int8 record) -> [B, S, N].

    XLA fuses the int8->bf16 convert + scale into the matmul's operand
    read, so decode streams 1 byte/weight from HBM at full bandwidth. A
    hand-written Pallas int8 kernel was benchmarked against this path on
    v5e (BENCH.md round 1: 1288 vs 1442 tok/s decode — XLA's software
    pipelining of the dequant won) and deleted; the fused XLA path IS the
    int8 fast path.
    """
    if not (isinstance(w, dict) and "q" in w):
        return x @ w.astype(compute)
    if (_DECODE_KERNEL == "pallas" and x.ndim == 3 and x.shape[1] == 1
            and w["q"].ndim == 2):
        # single-token decode: route the [B, K] @ int8 [K, N] matvec
        # through the Pallas weight-streaming kernel
        from macaw_llm_tpu.ops.pallas.matvec import matvec_int8
        y = matvec_int8(x[:, 0].astype(compute), w["q"],
                        w["s"].astype(jnp.float32), out_dtype=compute)
        return y[:, None]
    # optimization_barrier pins the dequant to its use site: inside a
    # lax.scan over stacked layers XLA otherwise rewrites
    # convert(dynamic-slice(W)) -> dynamic-slice(convert(W)) (loop-
    # invariant code motion), materializing the ENTIRE dequantized stack
    # — 12 GB of bf16 temps for a 7b QLoRA step. The barrier keeps the
    # sliced int8 loop-variant so only one layer is ever dequantized.
    q, s = jax.lax.optimization_barrier((w["q"], w["s"]))
    rows = 1
    for dim in x.shape[:-1]:
        rows *= dim
    if _ACT_QUANT and rows >= _ACT_QUANT_MIN_ROWS and q.ndim == 2:
        # W8A8: per-token symmetric int8 activations -> native int8 MXU
        # dot -> fp32 rescale by (per-token xs) x (per-channel s). Both
        # scale vectors are constant along the contracted axis, so the
        # factorization is exact; the activation ROUNDING is the only
        # approximation (bounded by tests/test_quantize.py W8A8 bounds).
        # rank-PRESERVING dot on purpose: flattening [B, S, K] -> [B*S, K]
        # here was measured 26 ms/step SLOWER at 7b prefill (420.5 vs
        # 394.7 ms) — the opposite of the tower projections (ops/linear),
        # where the flat form wins. Callers that benefit from flat inputs
        # (dense) flatten before calling. Differentiable via STE
        # (_w8a8_dot's custom_vjp).
        return _w8a8_dot(x, q, s).astype(compute)
    # scale is per-OUTPUT-channel, so (x @ (q*s)) == (x @ q) * s exactly;
    # applying it after the dot leaves only a convert on the weight
    # operand, which XLA fuses into the matmul's HBM read — decode then
    # streams 1 byte/weight instead of dequantize-to-bf16-and-reread
    # (int8 q values are integers <= 127: exact in bf16).
    y = x @ q.astype(compute)
    return (y * s.reshape((1,) * (y.ndim - 1) + (-1,))).astype(compute)
