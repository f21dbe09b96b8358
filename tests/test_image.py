"""Image preprocessing parity vs the reference's torchvision transform
(llm_trainer.py:151-158) and frame-sampling policy (llm_trainer.py:172-181).
"""

import jax.numpy as jnp
import numpy as np

from macaw_llm_tpu.image.preprocess import (CLIP_MEAN, CLIP_STD, preprocess,
                                            sample_frame_indices)


def _torch_reference(img_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    import torch
    from torchvision.transforms import (CenterCrop, Compose, Normalize,
                                        Resize, ToTensor)
    from torchvision.transforms import InterpolationMode
    from PIL import Image
    t = Compose([
        Resize(size, interpolation=InterpolationMode.BICUBIC),
        CenterCrop(size),
        ToTensor(),
        Normalize(CLIP_MEAN, CLIP_STD),
    ])
    return t(Image.fromarray(img_uint8)).numpy()


def test_frame_sampling_policy():
    # 120 stored, 6 sampled: stride 20 -> [0,20,40,60,80,119]
    idx = sample_frame_indices(120, 6)
    np.testing.assert_array_equal(idx, [0, 20, 40, 60, 80, 119])


def test_preprocess_shape_and_normalization():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (2, 224, 224, 3), np.uint8)
    out = np.asarray(preprocess(jnp.asarray(img)))
    assert out.shape == (2, 3, 224, 224)
    # normalization: uint8 128 -> (128/255 - mean)/std
    exp = (128 / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    got = np.asarray(preprocess(jnp.full((1, 224, 224, 3), 128,
                                         jnp.uint8)))[0, :, 0, 0]
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_preprocess_close_to_torchvision():
    try:
        import torchvision  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError:
        import pytest
        pytest.skip("torchvision/PIL not available")
    rng = np.random.RandomState(1)
    # smooth image so resampling-kernel differences stay small
    base = rng.rand(40, 60, 3)
    img = np.kron(base, np.ones((8, 8, 1)))[:320, :480]
    img = (img * 255).astype(np.uint8)
    expected = _torch_reference(img)
    got = np.asarray(preprocess(jnp.asarray(img[None])))[0]
    assert got.shape == expected.shape
    # bicubic kernels differ slightly (PIL vs XLA); demand close agreement
    err = np.abs(got - expected).mean()
    assert err < 0.03, f"mean abs err {err}"
