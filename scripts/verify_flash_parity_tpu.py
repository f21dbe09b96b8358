"""On-chip numeric probe: flash kernel fwd+grad vs einsum reference.

Run after kernel changes (compiled Mosaic path differs from the CPU
interpret-mode path the tests cover). Shapes: Whisper tower (non-causal,
d=64 padded in flash_sdpa) and LLM-ish causal d=128, non-128-aligned
seq lens, plus an all-padding row (must stay finite).

Usage: python scripts/verify_flash_parity_tpu.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from macaw_llm_tpu.ops.attention import dot_product_attention, flash_sdpa
from macaw_llm_tpu.ops.pallas.flash_attention import flash_attention


def check(name, a, b, tol):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    assert np.isfinite(a).all(), f"{name}: non-finite flash output"
    err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-6)
    status = "OK " if err < tol else "FAIL"
    print(f"{status} {name}: rel err {err:.2e} (tol {tol})", flush=True)
    assert err < tol, name


def main():
    print(jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    # --- whisper shape, non-causal, d=64 (flash_sdpa pads to 128) ---
    q = jnp.asarray(rng.randn(4, 1500, 8, 64) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.randn(4, 1500, 8, 64) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.randn(4, 1500, 8, 64) * 0.5, jnp.bfloat16)

    f = jax.jit(lambda q, k, v: flash_sdpa(q, k, v))
    r = jax.jit(lambda q, k, v: dot_product_attention(q, k, v))
    check("whisper fwd", f(q, k, v), r(q, k, v), 2e-2)

    gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        flash_sdpa(q, k, v).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
    gr = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        dot_product_attention(q, k, v).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2)))
    for name, a, b in zip(("dq", "dk", "dv"), gf(q, k, v), gr(q, k, v)):
        check(f"whisper {name}", a, b, 4e-2)

    # --- causal d=128, non-aligned seq 312, with padding rows ---
    from macaw_llm_tpu.ops import causal_mask, combine_masks, padding_mask
    q = jnp.asarray(rng.randn(2, 312, 4, 128) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, 312, 4, 128) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, 312, 4, 128) * 0.5, jnp.bfloat16)
    am = np.ones((2, 312), np.int32)
    am[1, 200:] = 0  # padded tail on row 1
    am = jnp.asarray(am)
    bias = jnp.where(am == 1, 0.0, float(np.finfo(np.float32).min)
                     ).astype(jnp.float32)

    f = jax.jit(lambda q, k, v, bias: flash_attention(q, k, v, bias,
                                                      causal=True))
    mask = combine_masks(causal_mask(312, 312), padding_mask(am, 312))
    r = jax.jit(lambda q, k, v, mask: dot_product_attention(q, k, v, mask))
    fo, ro = f(q, k, v, bias), r(q, k, v, mask)
    # compare only valid query rows (padded-row outputs are don't-care but
    # must be finite)
    assert np.isfinite(np.asarray(fo, np.float32)).all()
    check("causal fwd (valid rows)", fo[:, :200], ro[:, :200], 2e-2)

    gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        (flash_attention(q, k, v, bias, causal=True)[:, :200]
         ).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
    gr = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        (dot_product_attention(q, k, v, mask)[:, :200]
         ).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
    for name, a, b in zip(("dq", "dk", "dv"), gf(q, k, v), gr(q, k, v)):
        check(f"causal {name}", a, b, 4e-2)

    print("ALL PARITY PROBES PASSED", flush=True)


if __name__ == "__main__":
    main()
