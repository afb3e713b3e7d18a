"""YIN pitch estimation, fully vectorized in JAX.

TPU-native port of the reference's torch YIN (util/yin.py:24-140, itself the
de Cheveigné & Kawahara 2002 algorithm): FFT-autocorrelation difference
function, cumulative-mean-normalized difference, threshold search (hard) or
softmax-weighted differentiable search. Runs on device with static shapes so
it can sit inside a jitted train/eval step.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _next_fft_size(n: int) -> int:
    """2^(ceil(log2 n) + 1), matching util/yin.py:98."""
    return 2 ** (-int(-np.log(n) // np.log(2)) + 1)


def _frame(signal: jnp.ndarray, frame_length: int, frame_stride: int) -> jnp.ndarray:
    if signal.shape[-1] < frame_length:
        signal = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(0, frame_length - signal.shape[-1])])
    signal = jnp.pad(
        signal, [(0, 0)] * (signal.ndim - 1) + [(frame_length // 2, frame_length // 2 - 1)]
    )
    n = signal.shape[-1]
    n_frames = (n - frame_length) // frame_stride + 1
    idx = jnp.arange(n_frames)[:, None] * frame_stride + jnp.arange(frame_length)[None, :]
    return signal[..., idx]


def _diff(frames: jnp.ndarray, tau_max: int) -> jnp.ndarray:
    """Cumulative-mean-normalized difference function (eqs. 6 & 8)."""
    fft_size = _next_fft_size(frames.shape[-1])
    fft = jnp.fft.rfft(frames, fft_size, axis=-1)
    corr = jnp.fft.irfft(fft * jnp.conj(fft))[..., :tau_max]

    sqrcs = jnp.pad(jnp.cumsum(frames * frames, axis=-1), [(0, 0)] * (frames.ndim - 1) + [(1, 0)])
    corr_0 = sqrcs[..., -1:]
    corr_tau = jnp.flip(sqrcs, -1)[..., :tau_max] - sqrcs[..., :tau_max]
    diff = corr_0 + corr_tau - 2 * corr

    return (
        diff[..., 1:]
        * jnp.arange(1, diff.shape[-1])
        / jnp.maximum(jnp.cumsum(diff[..., 1:], axis=-1), 1e-5)
    )


def _search(cmdf: jnp.ndarray, tau_max: int, threshold: float) -> jnp.ndarray:
    first_below = jnp.argmax((cmdf < threshold).astype(jnp.int32), axis=-1, keepdims=True)
    first_below = jnp.where(first_below > 0, first_below, tau_max)
    beyond_threshold = jnp.arange(cmdf.shape[-1]) >= first_below
    increasing_slope = jnp.pad(
        jnp.diff(cmdf, axis=-1) >= 0.0,
        [(0, 0)] * (cmdf.ndim - 1) + [(0, 1)],
        constant_values=True,
    )
    return jnp.argmax((beyond_threshold & increasing_slope).astype(jnp.int32), axis=-1)


def _softsearch(cmdf: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Differentiable soft-argmin over lags (util/yin.py:129-140)."""
    threshold_mask = jnp.any(cmdf < threshold, axis=-1).astype(cmdf.dtype)
    alpha = jnp.exp(jnp.log(jnp.array(1.0)) - 0)  # keep grads simple
    alpha = jnp.exp(-cmdf * 100.0)
    alpha = alpha / jnp.sum(alpha, axis=-1, keepdims=True)
    idx = jnp.arange(cmdf.shape[-1], dtype=cmdf.dtype)
    tau = jnp.sum(alpha * idx, axis=-1)
    return tau * threshold_mask


def estimate(
    signal: jnp.ndarray,
    sample_rate: float,
    pitch_min: float = 20,
    pitch_max: float = 20000,
    frame_stride: float = 0.01,
    threshold: float = 0.1,
    soft: bool = False,
) -> jnp.ndarray:
    """Estimate F0 per frame; 0 marks non-periodic frames.

    Args/semantics match util/yin.py:24-85. ``signal`` is (..., T).
    """
    tau_min = int(sample_rate / pitch_max)
    tau_max = int(sample_rate / pitch_min)
    frame_length = 2 * tau_max
    stride = int(frame_stride * sample_rate)

    frames = _frame(signal, frame_length, stride)
    cmdf = _diff(frames, tau_max)[..., tau_min:]
    if soft:
        tau = _softsearch(cmdf, threshold)
    else:
        tau = _search(cmdf, tau_max, threshold)

    return jnp.where(
        tau > 0,
        sample_rate / (tau + tau_min + 1).astype(signal.dtype),
        jnp.zeros((), signal.dtype),
    )
