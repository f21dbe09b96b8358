"""Activation functions (HF ACT2FN equivalents used by the three towers)."""

from __future__ import annotations

import jax


def silu(x):
    return jax.nn.silu(x)  # LLaMA SwiGLU gate (hidden_act="silu")


def gelu(x):
    # HF "gelu" is the exact erf formulation (Whisper uses nn.GELU default).
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x):
    # CLIP's activation: x * sigmoid(1.702 * x)
    return x * jax.nn.sigmoid(1.702 * x)


_ACT = {
    "silu": silu,
    "gelu": gelu,
    "gelu_new": gelu_tanh,
    "gelu_tanh": gelu_tanh,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
}


def get_activation(name: str):
    return _ACT[name]
