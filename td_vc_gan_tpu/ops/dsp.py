"""Waveform DSP utilities, on-device and jittable.

TPU-native re-implementations of the reference's CPU/torch DSP helpers
(reference: util/__init__.py:22-113, util/dsp.py:5-16, util/audio.py:27-30).
Everything here is static-shape and differentiable where it needs to be, so it
can live *inside* the compiled train step instead of on the host.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal.windows import kaiser as _kaiser_window


# ---------------------------------------------------------------------------
# FIR design (host-side constants; consumed as fixed conv weights on device)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def kaiser_filter(L: int, w: float) -> np.ndarray:
    """Kaiser-windowed sinc low-pass, beta=2.5 variant.

    Matches util/__init__.py:104-113 (used by the excitation anti-aliasing
    shortcut): ``n = arange(-L//2, L//2+1)`` (floor division — L+1 taps),
    sinc(w·n) with the 1e-8-regularized denominator, center tap = w, unit-sum
    normalized. Returns float32 of shape (L+1,).
    """
    n = np.arange(-(L // 2), L // 2 + 1, dtype=np.float64)
    f = np.sin(math.pi * w * n) / (math.pi * n + 1e-8)
    f[len(n) // 2] = w
    f = f * _kaiser_window(L + 1, 2.5, sym=True)
    f = f / f.sum()
    return f.astype(np.float32)


@functools.lru_cache(maxsize=None)
def kaiser_filter_fc(L: int, fc: float, beta: float = 2.5) -> np.ndarray:
    """Kaiser low-pass with explicit cutoff/beta, odd length required.

    Matches util/dsp.py:5-16 (the discriminator's 129-tap band-split filter,
    fc=0.5, beta=10). Returns float32 of shape (L,).
    """
    if L % 2 == 0:
        raise ValueError("even-length filter not supported (parity with reference)")
    Lm = L - 1
    n = np.arange(-(Lm // 2), Lm // 2 + 1, dtype=np.float64)
    f = np.sin(math.pi * fc * n) / (math.pi * n + 1e-8)
    f[len(n) // 2] = fc
    f = f * _kaiser_window(Lm + 1, beta, sym=True)
    f = f / f.sum()
    return f.astype(np.float32)


# ---------------------------------------------------------------------------
# Pitch-excitation synthesis
# ---------------------------------------------------------------------------


def _linear_upsample(x: jnp.ndarray, scale: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Linear interpolation matching torch F.interpolate(mode='linear',
    align_corners=False) on the last axis.

    Returns (values, left_index, right_index) so callers can build validity
    masks from the contributing source frames.
    """
    n = x.shape[-1]
    t = jnp.arange(n * scale, dtype=jnp.float32)
    src = (t + 0.5) / scale - 0.5
    src = jnp.clip(src, 0.0, n - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    frac = src - lo
    xl = jnp.take(x, lo, axis=-1)
    xh = jnp.take(x, hi, axis=-1)
    return xl * (1.0 - frac) + xh * frac, lo, hi


def f0_to_excitation(
    f0: jnp.ndarray,
    step_size: int,
    key: jax.Array,
    sampling_rate: int = 16000,
    linear: bool = True,
) -> jnp.ndarray:
    """F0 frames -> sinusoid+noise excitation at sample rate.

    Mirrors util/__init__.py:22-50: drop the last frame, convert to angular
    frequency, upsample ×step_size (linear where both contributing frames are
    voiced — the reference achieves that with a log/-inf trick at :36-39 —
    nearest elsewhere), integrate phase with a single random start phase
    shared across the batch, emit 0.1·sin(φ) + N(0, 0.003²); unvoiced spans
    become pure noise with gain 0.1/(3·0.003).

    Args:
      f0: (B, F) F0 in Hz per hop (0 = unvoiced).
      step_size: hop size in samples (64 in all shipped configs).
      key: PRNG key (replaces torch's global RNG).

    Returns:
      (B, (F-1)*step_size) float32 excitation.
    """
    sin_gain = 0.1
    noise_std = 0.003
    noise_gain = sin_gain / (3 * noise_std)

    f0 = f0[..., :-1]
    ang = 2.0 * jnp.pi * f0 / sampling_rate

    up_nearest = jnp.repeat(ang, step_size, axis=-1)
    if linear:
        up_lin, lo, hi = _linear_upsample(ang, step_size)
        voiced = ang > 0
        # linear interp of log(ang) stays finite only where both frames voiced
        both_voiced = jnp.take(voiced, lo, axis=-1) & jnp.take(voiced, hi, axis=-1)
        freq = jnp.where(both_voiced, up_lin, up_nearest)
    else:
        freq = up_nearest

    phase = jnp.cumsum(freq, axis=-1)
    k_phase, k_noise = jax.random.split(key)
    start_phase = jax.random.uniform(k_phase, ()) * 2.0 * jnp.pi
    noise = jax.random.normal(k_noise, phase.shape, dtype=phase.dtype)

    excitation = sin_gain * jnp.sin(phase + start_phase) + noise * noise_std
    unvoiced = freq == 0
    excitation = jnp.where(unvoiced, noise * noise_std * noise_gain, excitation)
    return excitation


# ---------------------------------------------------------------------------
# Batched rolls / jitter / RMS
# ---------------------------------------------------------------------------


def roll_batches(x: jnp.ndarray, shifts: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Per-batch-element circular shift along ``axis``.

    Matches util/__init__.py:91-102 (gather with (idx - shift) mod N):
    positive shift moves content toward higher indices.
    ``shifts`` has shape (B,) and indexes axis 0 of ``x``.

    TPU note: the obvious take_along_axis lowers to a scalar-core gather
    (~10 ms for a (16,141,360) roll in the train step). For short axes we
    instead build a one-hot permutation and ride the MXU; for long axes we
    scan a dynamic-slice over the doubled array (contiguous DMA per item).
    """
    axis = axis % x.ndim  # the scan path below indexes axis-1 on the
    # batch-stripped slice, so a negative axis must be normalized first
    n = x.shape[axis]
    if n <= 512:
        # out[..., j] = x[..., (j - s) % n]  ==  einsum over one-hot P[i,j]
        i = jnp.arange(n)[:, None]
        j = jnp.arange(n)[None, :]
        # P[b, i, j] = 1 where i == (j - s_b) % n
        p = ((j - shifts[:, None, None]) % n) == i  # (B, n, n)
        p = p.astype(x.dtype)
        xm = jnp.moveaxis(x, axis, -1)  # (B, ..., n)
        # HIGHEST precision keeps the selection exact for f32 inputs (the
        # TPU default matmul precision would round values through bf16)
        out = jnp.einsum("b...i,bij->b...j", xm, p,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(out, -1, axis)

    x2 = jnp.concatenate([x, x], axis=axis)

    def one(_, args):
        xi2, s = args  # xi2: x2 without the batch dim
        start = (n - s) % n
        return None, jax.lax.dynamic_slice_in_dim(xi2, start, n, axis=axis - 1)

    _, out = jax.lax.scan(one, None, (x2, shifts))
    return out


def add_jitter(x: jnp.ndarray, jitter_amp: int, key: jax.Array) -> jnp.ndarray:
    """Random circular time shift in [-amp, amp] per batch element
    (util/audio.py:27-30). Time axis is the last axis."""
    shifts = jax.random.randint(key, (x.shape[0],), -jitter_amp, jitter_amp + 1)
    return roll_batches(x, shifts, x.ndim - 1)


def eq_rms_gain(signal: np.ndarray, target_rms_db: float) -> float:
    """The scalar ``eq_rms`` multiplies by — exposed so the input pipeline
    can cache it per file and normalize crop slices without re-reading the
    whole utterance (scalar multiply commutes bitwise with slicing)."""
    rms = np.sqrt((signal**2).mean())
    return 10 ** (target_rms_db / 20) / rms


def eq_rms(signal: np.ndarray, target_rms_db: float) -> np.ndarray:
    """Scale a waveform to a target RMS in dBFS (util/__init__.py:53-56)."""
    return signal * eq_rms_gain(signal, target_rms_db)


def eq_rms_signals(signal_eq: np.ndarray, signal_tgt: np.ndarray) -> np.ndarray:
    """Match the RMS of ``signal_eq`` to ``signal_tgt`` (util/__init__.py:58-62)."""
    rms_eq = np.sqrt((signal_eq**2).mean())
    rms_tgt = np.sqrt((signal_tgt**2).mean())
    return signal_eq * rms_tgt / (rms_eq + 1e-8)
