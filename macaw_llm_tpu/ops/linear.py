"""Dense projection with a flattened-batch contraction.

On TPU, XLA lowers a rank-3 ``[B, S, E] @ [E, F]`` dot far worse than the
algebraically identical flat ``[B*S, E] @ [E, F]`` form when B is large
and S is not tile-aligned — measured on v5e (CLIP-B/16, 96 frames,
scripts/bench_tower_internals.py): 12 encoder layers went 4987 ms -> 41 ms
from this reshape alone. Row-major ``[B, S, E]`` *is* ``[B*S, E]``, so the
reshapes are layout no-ops.

Used by the encoder towers and fusion adapters (the LLaMA stack already
contracts over 2D shapes via its own einsums).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def dense(x: jnp.ndarray, w,
          b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``x @ w + b`` with the leading dims flattened around the dot.

    x: [..., E]; w: [E, F] plain array or int8 record {"q", "s"}
    (utils/quantize) — records route through quantize.matmul, which also
    takes the W8A8 int8-MXU path when activation quant is on;
    b: [F] or None -> [..., F].
    """
    shape = x.shape
    if x.ndim > 2:
        x = x.reshape(-1, shape[-1])
    if isinstance(w, dict) and "q" in w:
        from macaw_llm_tpu.utils import quantize as qz
        y = qz.matmul(x, w, x.dtype)
    else:
        y = x @ w.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    if len(shape) > 2:
        y = y.reshape(*shape[:-1], y.shape[-1])
    return y
