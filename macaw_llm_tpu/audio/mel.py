"""Whisper-parity log-mel frontend, computed on-device with JAX/XLA.

The reference computes this on CPU inside the training loss function via
openai-whisper (`load_audio` -> `pad_or_trim` (30 s) ->
`log_mel_spectrogram` [80, 3000], llm_trainer.py:335-341) — a per-step
host-side bottleneck (SURVEY §1). Here the DSP runs as XLA ops on TPU so
raw 16 kHz waveforms can be shipped to the device and featurized there,
batched, in bf16-safe fp32.

Numerics match whisper's audio.py / HF WhisperFeatureExtractor:
  * STFT: n_fft=400, hop=160, periodic Hann, center=True reflect pad
  * power spectrum of frames [:-1] (3001 -> 3000 frames)
  * 80-bin slaney-scale, slaney-normalized mel filterbank (librosa
    filters.mel equivalent, generated here in closed form)
  * log10(clamp(., 1e-10)), floor at per-example max - 8, then (x+4)/4
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 400
HOP_LENGTH = 160
SAMPLE_RATE = 16000
N_MELS = 80
CHUNK_LENGTH = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_LENGTH  # 480000


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False): linear < 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(
            np.maximum(f, 1e-30) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=4)
def mel_filterbank(sr: int = SAMPLE_RATE, n_fft: int = N_FFT,
                   n_mels: int = N_MELS) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] slaney-normalized triangular filterbank
    (librosa.filters.mel(htk=False, norm='slaney') equivalent)."""
    fmax = sr / 2.0
    fft_freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(np.array(0.0)),
                          _hz_to_mel(np.array(fmax)), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)          # [n_mels + 2]
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]   # [n_mels+2, F]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def pad_or_trim(audio: jnp.ndarray, length: int = N_SAMPLES) -> jnp.ndarray:
    """whisper.pad_or_trim: zero-pad or clip the last axis to ``length``."""
    n = audio.shape[-1]
    if n > length:
        return audio[..., :length]
    if n < length:
        pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - n)]
        return jnp.pad(audio, pad)
    return audio


@lru_cache(maxsize=2)
def _dft_basis(n_fft: int = N_FFT):
    """Windowed real-DFT basis as a conv kernel [n_fft, 1, 2*(n_fft//2+1)].

    The STFT becomes ONE strided convolution (frame extraction + window +
    DFT fused) — a dense MXU matmul instead of a 3001-row gather.
    Numerically identical to rfft(frames * hann) in fp32.
    """
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    basis = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)  # [400, 402]
    basis = basis * window[:, None]
    # return numpy (NOT jnp): this is lru_cached and must never capture a
    # tracer; callers convert per-trace
    return basis.astype(np.float32).reshape(n_fft, 1, -1)


@partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram(audio: jnp.ndarray,
                        n_mels: int = N_MELS) -> jnp.ndarray:
    """[B, 480000] fp32 waveform -> [B, 80, 3000] Whisper log-mel."""
    if audio.ndim == 1:
        audio = audio[None]
    audio = audio.astype(jnp.float32)
    b, n = audio.shape

    pad = N_FFT // 2
    x = jnp.pad(audio, [(0, 0), (pad, pad)], mode="reflect")

    # conv-DFT STFT: one strided conv over the windowed cos/sin basis
    basis = jnp.asarray(_dft_basis(N_FFT))             # [400, 1, 402]
    spec = jax.lax.conv_general_dilated(
        x[:, :, None], basis, window_strides=(HOP_LENGTH,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)            # [B, 3001, 402]
    nb = N_FFT // 2 + 1
    re, im = spec[:, :-1, :nb], spec[:, :-1, nb:]      # drop last frame
    magnitudes = re * re + im * im

    filters = jnp.asarray(mel_filterbank(n_mels=n_mels))  # [80, 201]
    mel_spec = jnp.einsum("mf,btf->bmt", filters, magnitudes)

    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    log_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, log_max - 8.0)
    return (log_spec + 4.0) / 4.0
