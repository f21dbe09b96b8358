"""Log-mel frontend parity vs HF WhisperFeatureExtractor (numpy reference
implementation of whisper's audio.py DSP)."""

import jax.numpy as jnp
import numpy as np

from macaw_llm_tpu.audio.mel import (N_SAMPLES, log_mel_spectrogram,
                                     mel_filterbank, pad_or_trim)


def _hf_reference(audio: np.ndarray) -> np.ndarray:
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor(feature_size=80, sampling_rate=16000,
                                 hop_length=160, chunk_length=30, n_fft=400)
    out = fe(audio, sampling_rate=16000, return_tensors="np",
             padding="max_length")
    return out.input_features[0]


def test_filterbank_matches_hf():
    from transformers.audio_utils import mel_filter_bank
    expected = mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney").T  # HF returns [F, M]
    got = mel_filterbank()
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


def test_log_mel_parity_random_audio():
    rng = np.random.RandomState(0)
    audio = (rng.randn(N_SAMPLES) * 0.1).astype(np.float32)
    expected = _hf_reference(audio)
    got = np.asarray(log_mel_spectrogram(jnp.asarray(audio))[0])
    assert got.shape == (80, 3000)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_log_mel_parity_tone():
    t = np.arange(N_SAMPLES) / 16000.0
    audio = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    expected = _hf_reference(audio)
    got = np.asarray(log_mel_spectrogram(jnp.asarray(audio))[0])
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_pad_or_trim():
    short = jnp.ones((1000,))
    assert pad_or_trim(short).shape == (N_SAMPLES,)
    assert float(pad_or_trim(short)[999]) == 1.0
    assert float(pad_or_trim(short)[1000]) == 0.0
    long = jnp.ones((N_SAMPLES + 5,))
    assert pad_or_trim(long).shape == (N_SAMPLES,)


def test_batched():
    rng = np.random.RandomState(1)
    audio = (rng.randn(3, N_SAMPLES) * 0.1).astype(np.float32)
    got = log_mel_spectrogram(jnp.asarray(audio))
    assert got.shape == (3, 80, 3000)
    for i in range(3):
        one = log_mel_spectrogram(jnp.asarray(audio[i]))[0]
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(one),
                                   rtol=1e-5, atol=1e-6)
