"""Parameter partition rules: the ZeRO-3 / FSDP + TP equivalent.

The reference shards params/grads/optimizer state across 8 GPUs with
DeepSpeed ZeRO-3 (configs/deepspeed_config.json:24-41). Here sharding is
declarative: each parameter path maps to a PartitionSpec over the
(data, fsdp, tensor) mesh; GSPMD inserts the all-gathers/reduce-scatters
that DeepSpeed does imperatively. Optimizer state inherits parameter
shardings through GSPMD propagation (mu/nu are zeros_like(param)).

Rules follow the standard megatron-style layout:
  * column-parallel (out-dim on tensor, in-dim on fsdp): wq/wk/wv, gate/up
  * row-parallel (in-dim on tensor, out-dim on fsdp):    wo, down
  * embed/lm_head: vocab dim on tensor, hidden on fsdp
  * norms / small vectors: replicated
Any axis that does not divide the dimension is dropped (falls back to
replication on that dim) so odd sizes like vocab 32007 never hard-fail.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from macaw_llm_tpu.parallel.mesh import FSDP_AXIS, TENSOR_AXIS

# (path regex, spec) — first match wins. Paths look like
# "llm/layers/attn/wq", "fusion/to_hidden/video/w", ...
# Layer-stacked leaves have a leading num_layers dim mapped to None.
PARTITION_RULES: List[Tuple[str, P]] = [
    # ---- LLaMA (stacked [L, ...]) ----
    (r"llm/layers/attn/w[qkv](/q)?$", P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"llm/layers/attn/wo(/q)?$", P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"llm/layers/mlp/(gate|up)(/q)?$", P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"llm/layers/mlp/down(/q)?$", P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"llm/layers/(input|post)_norm$", P()),
    (r"llm/embed_tokens$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r"llm/lm_head(/q)?$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r"llm/norm$", P()),
    # ---- CLIP / Whisper towers (frozen; shard the big matrices on fsdp) ----
    (r"(image|video)_encoder/layers/attn/[qkv]/w$",
     P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"(image|video)_encoder/layers/attn/o/w$",
     P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"(image|video)_encoder/layers/mlp/fc1/w$",
     P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"(image|video)_encoder/layers/mlp/fc2/w$",
     P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"audio_encoder/layers/attn/[qkv]/w$", P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"audio_encoder/layers/attn/o/w$", P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"audio_encoder/layers/mlp/fc1/w$", P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"audio_encoder/layers/mlp/fc2/w$", P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"audio_encoder/embed_positions$", P(None, FSDP_AXIS)),
    # ---- fusion modules ----
    (r"fusion/(image|audio|video)_align/in_proj_w$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r"fusion/(image|audio|video)_align/out_proj_w$",
     P(TENSOR_AXIS, FSDP_AXIS)),
    (r"fusion/to_hidden/\w+/w$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r"fusion/conv/\w+/w$", P(None, FSDP_AXIS, None)),
    # ---- default: replicate ----
    (r".*", P()),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for(path_str: str, shape, mesh: Mesh,
             rules=None) -> P:
    """Resolve the PartitionSpec for one leaf, dropping axes that do not
    divide the corresponding dimension."""
    rules = rules or PARTITION_RULES
    spec = P()
    for pat, s in rules:
        if re.search(pat, path_str):
            spec = s
            break
    fixed = []
    for dim, axis in enumerate(spec):
        if axis is None:
            fixed.append(None)
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        if dim < len(shape) and shape[dim] % size == 0 and size > 1:
            fixed.append(axis)
        else:
            fixed.append(None)
    # trim trailing Nones
    while fixed and fixed[-1] is None:
        fixed.pop()
    return P(*fixed)


def infer_shardings(tree: Any, mesh: Mesh, rules=None):
    """Pytree of NamedShardings matching ``tree`` (params or abstract)."""

    def leaf(path, x):
        return NamedSharding(mesh, spec_for(_path_str(path), x.shape, mesh,
                                            rules))

    return jax.tree_util.tree_map_with_path(leaf, tree)


def shard_params(params: Any, mesh: Mesh, rules=None):
    """Place a (host-resident) param pytree onto the mesh."""
    shardings = infer_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)


def opt_state_shardings(abstract_opt_state: Any, param_shardings: Any,
                        mesh: Mesh):
    """Shardings for an optax state whose mu/nu subtrees mirror the param
    tree (the ZeRO-3 'optimizer state sharded like params' property,
    deepspeed_config.json:24-39). Matched structurally: any opt-state
    subtree whose treedef equals the param treedef (adam mu/nu, master
    copies, ...) gets the param shardings leaf-for-leaf; everything else
    (counts, scalars) replicates. Structural equality cannot suffer the
    same-path-suffix collisions a string match can."""
    param_def = jax.tree_util.tree_structure(param_shardings)
    rep = NamedSharding(mesh, P())

    def mirrors_params(x):
        return jax.tree_util.tree_structure(x) == param_def

    return jax.tree_util.tree_map(
        lambda sub: param_shardings if mirrors_params(sub) else rep,
        abstract_opt_state, is_leaf=mirrors_params)
