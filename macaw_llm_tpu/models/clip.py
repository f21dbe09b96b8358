"""CLIP ViT vision tower + visual projection, TPU-native.

Covers the reference's image/video encoders: two ``CLIPModel`` instances of
which only ``vision_model`` + ``visual_projection`` are used
(reference modeling.py:871-873, encode_image :1085-1093 =
``visual_projection(vision_model(x)[0])[:, 1:, :]`` — full patch-token
sequence, CLS dropped, projected to projection_dim).

Matches HF ``CLIPVisionTransformer``: patch conv (no bias) + class token +
learned position embeddings, pre-layernorm, N residual blocks
(LN→MHA→res, LN→MLP(quick_gelu)→res). Note HF applies ``post_layernorm``
only to the CLS pooled output, so the patch-token path used by the
reference is NOT post-layernormed — replicated here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from macaw_llm_tpu.config import ClipVisionConfig
from macaw_llm_tpu.ops import (dense, layer_norm, mha_apply, mha_init,
                               quick_gelu)


def init_params(rng: jax.Array, cfg: ClipVisionConfig,
                param_dtype=jnp.float32) -> dict:
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    keys = jax.random.split(rng, 12)
    init = jax.nn.initializers.normal(cfg.initializer_range)

    def ln_stack():
        return {"w": jnp.ones((L, h), param_dtype),
                "b": jnp.zeros((L, h), param_dtype)}

    mha_stacked = jax.vmap(
        lambda k: mha_init(k, h, cfg.num_heads, bias=True,
                           initializer_range=cfg.initializer_range,
                           param_dtype=param_dtype))(
        jax.random.split(keys[3], L))

    params = {
        "class_embedding": init(keys[0], (h,), param_dtype),
        "patch_embedding": init(
            keys[1], (cfg.patch_size, cfg.patch_size, 3, h), param_dtype),
        "position_embedding": init(keys[2], (cfg.seq_len, h), param_dtype),
        "pre_layernorm": {"w": jnp.ones((h,), param_dtype),
                          "b": jnp.zeros((h,), param_dtype)},
        "layers": {
            "ln1": ln_stack(),
            "ln2": ln_stack(),
            "attn": mha_stacked,
            "mlp": {
                "fc1": {"w": init(keys[4], (L, h, i), param_dtype),
                        "b": jnp.zeros((L, i), param_dtype)},
                "fc2": {"w": init(keys[5], (L, i, h), param_dtype),
                        "b": jnp.zeros((L, h), param_dtype)},
            },
        },
        "post_layernorm": {"w": jnp.ones((h,), param_dtype),
                           "b": jnp.zeros((h,), param_dtype)},
        "visual_projection": init(keys[6], (h, cfg.projection_dim),
                                  param_dtype),
    }
    return params


def _embeddings(params: dict, cfg: ClipVisionConfig,
                pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, 3, H, W] (reference/CLIP channel-first convention) ->
    [B, 1+P, hidden].

    The patch embedding is a stride==kernel VALID conv — mathematically a
    space-to-depth reshape followed by ONE [B*P, k*k*3] x [k*k*3, hidden]
    matmul (k*k*3 = 768 at CLIP-B/16: a full 128-lane contraction on the
    MXU instead of whatever tiling XLA picks for the conv)."""
    compute = pixels.dtype
    b = pixels.shape[0]
    k = cfg.patch_size
    gh, gw = pixels.shape[2] // k, pixels.shape[3] // k
    # NCHW -> [B, gh, k, gw, k, 3] -> [B, gh*gw, k*k*3] with the SAME
    # element order as the conv's HWIO kernel reduction (h, w, in-ch)
    x = pixels.reshape(b, 3, gh, k, gw, k)
    x = x.transpose(0, 2, 4, 3, 5, 1).reshape(b * gh * gw, k * k * 3)
    w = params["patch_embedding"].astype(compute).reshape(-1,
                                                          cfg.hidden_size)
    patches = (x @ w).reshape(b, gh * gw, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(compute)[None, None, :],
        (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, patches], axis=1)
    return x + params["position_embedding"].astype(compute)[None]


def _encoder_layer(cfg: ClipVisionConfig, lp: dict,
                   h: jnp.ndarray, use_flash: bool = False) -> jnp.ndarray:
    ln1 = layer_norm(h, lp["ln1"]["w"], lp["ln1"]["b"], cfg.layer_norm_eps)
    h = h + mha_apply(lp["attn"], cfg.num_heads, ln1, use_flash=use_flash)
    ln2 = layer_norm(h, lp["ln2"]["w"], lp["ln2"]["b"], cfg.layer_norm_eps)
    m = quick_gelu(dense(ln2, lp["mlp"]["fc1"]["w"], lp["mlp"]["fc1"]["b"]))
    m = dense(m, lp["mlp"]["fc2"]["w"], lp["mlp"]["fc2"]["b"])
    return h + m


def encode_patches(params: dict, cfg: ClipVisionConfig,
                   pixels: jnp.ndarray, use_flash: bool = False,
                   remat=False) -> jnp.ndarray:
    """Reference ``encode_image`` (modeling.py:1085-1093): projected patch
    tokens with CLS dropped. pixels [B, 3, H, W] -> [B, P, projection_dim].

    ``remat`` (False | "nothing"/True | "dots") wraps each encoder layer
    in jax.checkpoint — the reference's gradient_checkpointing_enable on
    the towers (modeling.py:770-783). Only bites when the tower is being
    differentiated through (freeze_encoders=False); frozen towers save no
    residuals either way.
    """
    h = _embeddings(params, cfg, pixels)
    h = layer_norm(h, params["pre_layernorm"]["w"],
                   params["pre_layernorm"]["b"], cfg.layer_norm_eps)

    def layer_fn(lp, h):
        return _encoder_layer(cfg, lp, h, use_flash=use_flash)

    if remat:
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if remat == "dots"
                  else jax.checkpoint_policies.nothing_saveable)
        layer_fn = jax.checkpoint(layer_fn, policy=policy)

    def body(h, lp):
        return layer_fn(lp, h), None

    h, _ = jax.lax.scan(body, h, params["layers"])
    # HF returns last_hidden_state un-post-layernormed; the reference
    # projects it directly and drops CLS.
    return dense(h, params["visual_projection"])[:, 1:, :]
