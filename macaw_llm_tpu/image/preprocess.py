"""CLIP image preprocessing on-device (JAX) + frame-sampling policy.

The reference runs torchvision transforms per example on CPU inside the
loss function (llm_trainer.py:151-158,308-323): Resize(224, bicubic) ->
CenterCrop(224) -> ToTensor -> Normalize(CLIP mean/std). Here the same
pipeline runs as XLA ops so uint8 frames can be shipped to device and
normalized there, batched.

Frame subsampling replicates llm_trainer.py:172-181: choose
``n_sampled`` of ``n_stored`` frames uniformly with the last frame pinned.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def sample_frame_indices(n_stored: int = 120,
                         n_sampled: int = 6) -> np.ndarray:
    """Uniform frame subsampling, last frame pinned
    (llm_trainer.py:172-181: stride = n_stored // n_sampled, last index
    replaced by n_stored - 1)."""
    stride = n_stored // n_sampled
    idx = np.arange(0, n_stored, stride)[:n_sampled].copy()
    idx[-1] = n_stored - 1
    return idx


@partial(jax.jit, static_argnames=("size",))
def preprocess(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """uint8/float [B, H, W, 3] -> CLIP-normalized [B, 3, size, size].

    Resize shortest side to ``size`` (bicubic, antialiased) then center
    crop — torchvision semantics of the reference ``_transform``
    (llm_trainer.py:151-158).
    """
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    b, h, w, c = x.shape
    # resize shortest side to `size`, preserving aspect ratio (static shapes
    # per (h, w) — jit recompiles per input geometry, as XLA requires)
    if h < w:
        new_h, new_w = size, max(size, int(round(size * w / h)))
    else:
        new_h, new_w = max(size, int(round(size * h / w))), size
    x = jax.image.resize(x, (b, new_h, new_w, c), method="bicubic",
                         antialias=True)
    top = (new_h - size) // 2
    left = (new_w - size) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, size, size, c))
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    x = (x - mean) / std
    return jnp.transpose(x, (0, 3, 1, 2))  # channel-first, CLIP convention


def preprocess_batch_numpy(images: Sequence[np.ndarray],
                           size: int = 224) -> np.ndarray:
    """Host-side convenience for ragged input sizes: per-image resize+crop
    then one stacked device transfer."""
    outs = [np.asarray(preprocess(jnp.asarray(im[None]), size))[0]
            for im in images]
    return np.stack(outs)
