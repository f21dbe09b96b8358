"""Train state: params + optimizer state + step + PRNG, one pytree.

The reference's equivalent state lives inside HF Trainer + the DeepSpeed
engine (llm_trainer.py:183, deepspeed configs). Here it is an explicit,
checkpointable pytree — params split into trainable/frozen subtrees so
gradients are only ever computed and optimizer state only ever allocated
for trainable parameters (the reference trains with all encoders frozen,
run_clm_llms.py:378-398 — see SURVEY quirk #1)."""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    trainable: Any             # param pytree (optimized)
    frozen: Any                # param pytree (constant during training)
    opt_state: Any             # optax state over `trainable`
    rng: jax.Array             # dropout PRNG


FROZEN_PREFIXES = ("image_encoder", "video_encoder", "audio_encoder")


def split_params(params: dict, freeze_encoders: bool = True,
                 lora: bool = False) -> Tuple[dict, dict]:
    """Split the fusion-model param dict into (trainable, frozen).

    Matches the reference's *intent* (freeze any '*encoder*' module,
    run_clm_llms.py:390-396; actual behavior freezes unconditionally —
    here the flag works). With ``lora`` the LLM base is frozen too and
    only the adapter subtree (llm/layers/lora) + fusion modules train.
    """
    if not freeze_encoders and not lora:
        return params, {}
    trainable = {k: v for k, v in params.items()
                 if k not in FROZEN_PREFIXES}
    frozen = {k: v for k, v in params.items() if k in FROZEN_PREFIXES}
    if not freeze_encoders:
        trainable = dict(trainable)
        trainable.update(frozen)
        frozen = {}
    if lora:
        llm = trainable.pop("llm")
        layers = dict(llm["layers"])
        lora_tree = layers.pop("lora")
        frozen = dict(frozen)
        frozen["llm"] = {**llm, "layers": layers}
        trainable["llm"] = {"layers": {"lora": lora_tree}}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    """Deep merge (dict-of-dict leaves win from either side; disjoint by
    construction except the llm/layers split under LoRA)."""
    def _merge(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(a)
            for k, v in b.items():
                out[k] = _merge(a[k], v) if k in a else v
            return out
        return a if b is None else b

    return _merge(dict(trainable), frozen)
