"""STFT + mel spectrogram as pure-JAX matmul-friendly ops.

Replaces the torchaudio MelSpectrogram C++/CUDA transform used by the
reference's spectral loss (util/losses.py:28-42) with an on-device
implementation living inside the jitted train step. Semantics match
``torchaudio.transforms.MelSpectrogram(sample_rate, n_fft, hop_length=n_fft//4,
n_mels, norm='slaney')``: centered reflect-padded frames, periodic Hann
window, power-2 spectrum, HTK mel scale with Slaney area normalization.

On TPU the mel projection is a (freq × mel) matmul that XLA places on the MXU;
the rFFT lowers to the XLA FFT HLO.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float32)


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, f_min: float = 0.0, f_max: float | None = None
) -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank, HTK scale, Slaney-normalized.

    Matches torchaudio.functional.melscale_fbanks(norm='slaney',
    mel_scale='htk') — the configuration used at util/losses.py:30.
    """
    if f_max is None:
        f_max = sr / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(np.array(f_min)), _hz_to_mel_htk(np.array(f_max)), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa ``htk=False`` default): linear below 1 kHz,
    logarithmic above."""
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
        f / (200.0 / 3.0),
    )


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    min_log_mel = 1000.0 / (200.0 / 3.0)
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel,
        1000.0 * np.exp(logstep * (m - min_log_mel)),
        m * (200.0 / 3.0),
    )


@functools.lru_cache(maxsize=None)
def mel_filterbank_slaney(
    sr: int, n_fft: int, n_mels: int, f_min: float = 0.0, f_max: float | None = None
) -> np.ndarray:
    """(n_freqs, n_mels) filterbank on the SLANEY mel scale, Slaney-normalized
    — the ``librosa.filters.mel`` default configuration the reference's
    (unfinished) ``spec_to_melspec`` caches at util/audio.py:11-15, as
    opposed to the HTK scale torchaudio uses for the training mel loss
    (``mel_filterbank`` above)."""
    if f_max is None:
        f_max = sr / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    m_pts = np.linspace(
        _hz_to_mel_slaney(np.array(f_min)), _hz_to_mel_slaney(np.array(f_max)), n_mels + 2
    )
    f_pts = _mel_to_hz_slaney(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def spec_to_melspec(
    spec: jnp.ndarray,
    sr: int = 16000,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> jnp.ndarray:
    """Project a magnitude/power spectrogram onto a Slaney mel basis.

    Rebuilds ``spec_to_melspec`` (util/audio.py:18-25), which is UNFINISHED
    dead code in the reference: its body is literally ``#TODO: matrix
    multiply mel and spec`` and returns the input spectrogram unchanged, and
    nothing calls it. We complete the evident intent — the librosa-style mel
    basis it already caches (Slaney scale + Slaney norm) applied as a single
    MXU matmul. Layout is channels-last like the rest of this package:
    ``spec`` is ``(..., frames, n_fft//2+1)`` as produced by
    :func:`stft_power` (the reference's torch layout puts freq at -2);
    ``n_fft`` is recovered from the freq axis like the reference (:19).
    """
    n_fft = (spec.shape[-1] - 1) * 2
    fb = jnp.asarray(mel_filterbank_slaney(sr, n_fft, n_mels, f_min, f_max))
    return jnp.matmul(spec, fb, preferred_element_type=jnp.float32)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int, center: bool = True) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, frame_length) overlapping frames.

    With center=True the signal is reflect-padded by frame_length//2 on both
    sides (torch.stft center/pad_mode='reflect' semantics).
    """
    if center:
        p = frame_length // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(p, p)], mode="reflect")
    n = x.shape[-1]
    n_frames = 1 + (n - frame_length) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def stft_power(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Power spectrogram |STFT|^2: (B, T) -> (B, n_frames, n_fft//2+1)."""
    frames = frame_signal(x, n_fft, hop, center=True)
    win = jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    return (spec.real**2 + spec.imag**2).astype(x.dtype)


def stft_magnitude(x: jnp.ndarray, n_fft: int, hop: int, window: str = "hann") -> jnp.ndarray:
    """Magnitude spectrogram |STFT|: (B, T) -> (B, n_frames, n_fft//2+1).

    ``window="rect"`` reproduces a bare ``torch.stft(x, n_fft, hop)`` call
    with no window argument (an implicit all-ones window), which is what the
    reference's PWG-style loss does at util/losses.py:13-14.
    """
    frames = frame_signal(x, n_fft, hop, center=True)
    if window == "hann":
        frames = frames * jnp.asarray(hann_window(n_fft))
    elif window != "rect":
        raise ValueError(f"unknown window {window!r}")
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.sqrt(spec.real**2 + spec.imag**2).astype(x.dtype)


def melspectrogram(
    x: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 2048,
    n_mels: int = 80,
    hop: int | None = None,
) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, n_mels) power mel spectrogram."""
    if hop is None:
        hop = n_fft // 4
    power = stft_power(x, n_fft, hop)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    return jnp.matmul(power, fb, preferred_element_type=jnp.float32)
