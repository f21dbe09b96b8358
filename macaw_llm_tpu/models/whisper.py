"""Whisper audio encoder, TPU-native.

Covers the reference's audio path: HF ``WhisperModel(...).encoder`` over a
[B, 80, 3000] log-mel (reference modeling.py:875, encode_audio :1081-1083).
Architecture per HF WhisperEncoder (mirrored by the reference's vendored
copy, modeling.py:662-805): Conv1d(80→d, k=3, p=1)+GELU,
Conv1d(d→d, k=3, s=2, p=1)+GELU, learned position embedding added as a full
weight matrix, pre-norm transformer layers, final LayerNorm.

LayerDrop (reference modeling.py:766-768) — stochastic per-layer skip at
``cfg.encoder_layerdrop`` during training — is implemented as a scalar
``lax.cond`` per scan step (identity at eval / rate 0.0 / no rng, which is
the reference's shipped configuration: whisper-base ships rate 0.0 and the
tower is frozen).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from macaw_llm_tpu.config import WhisperConfig
from macaw_llm_tpu.ops import dense, gelu, layer_norm, mha_apply, mha_init


def init_params(rng: jax.Array, cfg: WhisperConfig,
                param_dtype=jnp.float32) -> dict:
    d, f, L = cfg.d_model, cfg.encoder_ffn_dim, cfg.encoder_layers
    keys = jax.random.split(rng, 8)
    init = jax.nn.initializers.normal(cfg.initializer_range)

    def ln_stack():
        return {"w": jnp.ones((L, d), param_dtype),
                "b": jnp.zeros((L, d), param_dtype)}

    attn = jax.vmap(
        lambda k: mha_init(k, d, cfg.encoder_attention_heads, bias=True,
                           initializer_range=cfg.initializer_range,
                           param_dtype=param_dtype))(
        jax.random.split(keys[2], L))
    # Whisper k_proj has no bias — keep the slot but zero (import writes 0s)
    attn["k"]["b"] = jnp.zeros_like(attn["k"]["b"])

    params = {
        "conv1": {"w": init(keys[0], (3, cfg.num_mel_bins, d), param_dtype),
                  "b": jnp.zeros((d,), param_dtype)},
        "conv2": {"w": init(keys[1], (3, d, d), param_dtype),
                  "b": jnp.zeros((d,), param_dtype)},
        "embed_positions": init(keys[3], (cfg.max_source_positions, d),
                                param_dtype),
        "layers": {
            "self_attn_ln": ln_stack(),
            "attn": attn,
            "final_ln": ln_stack(),
            "mlp": {
                "fc1": {"w": init(keys[4], (L, d, f), param_dtype),
                        "b": jnp.zeros((L, f), param_dtype)},
                "fc2": {"w": init(keys[5], (L, f, d), param_dtype),
                        "b": jnp.zeros((L, d), param_dtype)},
            },
        },
        "layer_norm": {"w": jnp.ones((d,), param_dtype),
                       "b": jnp.zeros((d,), param_dtype)},
    }
    return params


def _conv1d(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x [B, T, C_in] NWC -> [B, T', C_out], SAME-style padding of 1."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,),
        padding=[(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)
    return out + p["b"].astype(x.dtype)


def _encoder_layer(cfg: WhisperConfig, lp: dict,
                   h: jnp.ndarray, use_flash: bool = False) -> jnp.ndarray:
    ln = layer_norm(h, lp["self_attn_ln"]["w"], lp["self_attn_ln"]["b"],
                    cfg.layer_norm_eps)
    h = h + mha_apply(lp["attn"], cfg.encoder_attention_heads, ln,
                      use_flash=use_flash)
    ln = layer_norm(h, lp["final_ln"]["w"], lp["final_ln"]["b"],
                    cfg.layer_norm_eps)
    m = gelu(dense(ln, lp["mlp"]["fc1"]["w"], lp["mlp"]["fc1"]["b"]))
    m = dense(m, lp["mlp"]["fc2"]["w"], lp["mlp"]["fc2"]["b"])
    return h + m


def encode(params: dict, cfg: WhisperConfig,
           mel: jnp.ndarray, use_flash: bool = False,
           remat=False,
           dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Reference ``encode_audio`` (modeling.py:1081-1083).

    mel: [B, 80, 3000] log-mel (channel-first, Whisper convention)
    -> [B, 1500, d_model].

    ``remat`` (False | "nothing"/True | "dots") wraps each encoder layer
    in jax.checkpoint — the reference's gradient_checkpointing_enable on
    the towers (modeling.py:770-783); a no-op while the tower is frozen.

    ``dropout_rng`` + ``cfg.encoder_layerdrop > 0`` enables LayerDrop
    (reference modeling.py:766-768): each layer is skipped with
    probability ``encoder_layerdrop``, decided per batch (the reference
    draws one uniform per layer, not per example). Identity when the rng
    is None (eval) or the rate is 0.0 (whisper-base's shipped value).
    """
    x = jnp.transpose(mel, (0, 2, 1))        # NWC for TPU conv
    x = gelu(_conv1d(params["conv1"], x, 1))
    x = gelu(_conv1d(params["conv2"], x, 2))  # 3000 -> 1500
    x = x + params["embed_positions"].astype(x.dtype)[None, :x.shape[1]]

    def layer_fn(lp, h):
        return _encoder_layer(cfg, lp, h, use_flash=use_flash)

    if remat:
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if remat == "dots"
                  else jax.checkpoint_policies.nothing_saveable)
        layer_fn = jax.checkpoint(layer_fn, policy=policy)

    layerdrop = dropout_rng is not None and cfg.encoder_layerdrop > 0.0
    if layerdrop:
        # layout-independent leaf: pack_towers replaces attn q/k/v with a
        # fused "qkv", but the per-layer norms survive every packing
        n_layers = params["layers"]["self_attn_ln"]["w"].shape[0]
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - cfg.encoder_layerdrop, (n_layers,))

        def body(h, xs):
            lp, k = xs
            # scalar cond: a dropped layer costs nothing (XLA branches,
            # not selects — both sides are not evaluated)
            return jax.lax.cond(k, lambda a: layer_fn(*a),
                                lambda a: a[1], (lp, h)), None

        x, _ = jax.lax.scan(body, x, (params["layers"], keep))
    else:
        def body(h, lp):
            return layer_fn(lp, h), None

        x, _ = jax.lax.scan(body, x, params["layers"])
    return layer_norm(x, params["layer_norm"]["w"], params["layer_norm"]["b"],
                      cfg.layer_norm_eps)
