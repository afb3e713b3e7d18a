"""CREPE pitch estimator in JAX, on-device and differentiable.

Replaces the torchcrepe dependency used throughout the reference's train loop
and inference CLIs (util/crepe.py:22-89; invoked 2-4× per train step at
train.py:239,439). The CNN (Kim et al. 2018, 'tiny' capacity) runs as a
frozen flax module *inside* the compiled train step; its activation map is
the F0-loss target space and keeps gradients, exactly as the reference relies
on (train.py:470).

Semantics matched to torchcrepe: 1024-sample frames at hop 64 (4 ms @16 kHz),
per-frame mean/std normalization (unbiased std, 1e-10 floor), 6 conv blocks
(conv → relu → eval-mode batchnorm → 2× maxpool), sigmoid 360-bin head; 20
cents per bin starting at 1997.3794084376191 cents (f = 10·2^(cents/1200));
argmax / weighted-argmax / viterbi decoders; periodicity threshold gating.

Weights: import a torchcrepe ``.pth`` with
``td_vc_gan_tpu.training.torch_import.load_torchcrepe`` when available; a
randomly initialized net keeps every pipeline runnable (and trainable) in
environments without the checkpoint.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


PITCH_BINS = 360
WINDOW_SIZE = 1024
HOP = 64
SAMPLE_RATE = 16000
CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191
FMIN = 50.0
FMAX = 550.0
PERIODICITY_THRESHOLD = 0.21

# 'tiny' capacity multiplier 4; 'full' is 32.
_CAPACITY = {"tiny": 4, "full": 32}
_BASE_CHANNELS = (32, 4, 4, 4, 8, 16)
_KERNELS = (512, 64, 64, 64, 64, 64)
_STRIDES = (4, 1, 1, 1, 1, 1)
_PADS = ((254, 256), (31, 32), (31, 32), (31, 32), (31, 32), (31, 32))


# ---------------------------------------------------------------------------
# cents/bins/frequency conversions
# ---------------------------------------------------------------------------


def cents_to_frequency(cents):
    return 10.0 * 2.0 ** (cents / 1200.0)


def frequency_to_cents(freq):
    return 1200.0 * jnp.log2(freq / 10.0)


def bins_to_cents(bins):
    return CENTS_PER_BIN * bins + CENTS_OFFSET


def bins_to_frequency(bins):
    return cents_to_frequency(bins_to_cents(bins))


def frequency_to_bins(freq, quantize=jnp.floor):
    return quantize((frequency_to_cents(freq) - CENTS_OFFSET) / CENTS_PER_BIN).astype(jnp.int32)


def get_shift(pitch_source, pitch_target):
    """Bin shift between two pitches (util/crepe.py:88-89) for rolling
    activation maps along the bin axis."""
    return frequency_to_bins(pitch_target) - frequency_to_bins(pitch_source)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class _EvalBatchNorm(nn.Module):
    """Inference-mode batch norm: fixed affine from stored running stats.

    CREPE is always frozen here (as in the reference, which never trains it),
    so eval-mode BN — differentiable w.r.t. the input — is exact.
    """

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # fold to one multiply-add, in x's dtype: f32 params would otherwise
        # promote the whole (frames, T, C) map to f32 under the bf16 scope
        # (observed as a 1.2 GB f32 tensor in the round-3 profile)
        s = scale * jax.lax.rsqrt(var + self.epsilon)
        a = s.astype(x.dtype)
        b = (bias - mean * s).astype(x.dtype)
        return x * a + b


class Crepe(nn.Module):
    """The CREPE CNN over normalized frames: (N, 1024) -> (N, 360) sigmoid."""

    model: str = "tiny"

    @nn.compact
    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        from td_vc_gan_tpu.models.layers import get_compute_dtype

        from td_vc_gan_tpu.models.layers import relu_from_output

        cap = _CAPACITY[self.model]
        dt = get_compute_dtype()  # honor the train-step mixed-precision scope
        x = frames[..., None]  # (N, 1024, 1) NWC
        for i, (base, k, s, pad) in enumerate(zip(_BASE_CHANNELS, _KERNELS, _STRIDES, _PADS)):
            ch = base * cap
            x = jnp.pad(x, ((0, 0), pad, (0, 0)))
            kernel = self.param(
                f"conv{i}_kernel",
                nn.initializers.he_normal(),
                (k, x.shape[-1], ch),
            )
            b = self.param(f"conv{i}_bias", nn.initializers.zeros, (ch,))
            if dt is not None:
                x = x.astype(dt)
                kernel = kernel.astype(dt)
            preferred = jnp.float32 if dt is None else None  # bf16 operands
            # keep the AD transpose sound (see layers.py)
            bn = _EvalBatchNorm(ch, name=f"bn{i}")
            bias = b.astype(dt) if dt is not None else b
            if i == 0:
                # Dual-phase conv0: fold the 2x maxpool into TWO stride-2s
                # convs (even/odd output phases) and take an elementwise max.
                # Bit-identical math (same windows, same kernel, same pairwise
                # max), but the (N, 256, 128ch) conv0 output never
                # materializes — the pairwise-max reshape on it forced three
                # 591 MB layout copies per step at batch 64 (fwd signal run,
                # fwd fake run, backward scatter; round-3 HLO profile) that
                # strided-slice and reduce_window formulations only made
                # worse when A/B'd on a v5e.
                ye = jax.lax.conv_general_dilated(
                    x, kernel, (2 * s,), [(0, 0)],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=preferred,
                )
                yo = jax.lax.conv_general_dilated(
                    x[:, s:], kernel, (2 * s,), [(0, 0)],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=preferred,
                )
                x = jnp.maximum(
                    bn(relu_from_output(ye + bias)),
                    bn(relu_from_output(yo + bias)),
                )
                continue
            y = jax.lax.conv_general_dilated(
                x, kernel, (s,), [(0, 0)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=preferred,
            )
            x = relu_from_output(y + bias)  # output-vjp: drops the 1.2 GB/
            # step pre-activation residual at conv0 scale (round-3 profile)
            x = bn(x)
            # maxpool (2,) stride (2,) as a pairwise max over a reshape:
            # reduce_window's backward is a select-and-scatter kernel that
            # dominated CREPE's bwd bytes (round-3 profile); jnp.maximum's
            # backward is a fusable elementwise select. Measured against
            # strided-slice maximum too (12.3 -> 19.2 GB accessed, slower).
            n, tl, c = x.shape
            x = x[:, : tl - tl % 2].reshape(n, tl // 2, 2, c)  # floor, like torch
            x = jnp.maximum(x[:, :, 0], x[:, :, 1])
        # (N, 4, 64·cap/4?) -> flatten time-major (matches torchcrepe permute)
        x = x.reshape(x.shape[0], -1)
        w = self.param(
            "classifier_kernel", nn.initializers.he_normal(), (x.shape[-1], PITCH_BINS)
        )
        b = self.param("classifier_bias", nn.initializers.zeros, (PITCH_BINS,))
        if dt is not None:
            x = x.astype(dt)
            w = w.astype(dt)
        # activations return in f32 regardless of the compute scope: the f0
        # loss and the decoders consume them
        return jax.nn.sigmoid((x @ w).astype(jnp.float32) + b)


def preprocess(signal: jnp.ndarray, hop_length: int = HOP) -> jnp.ndarray:
    """(B, T) waveform -> (B, F, 1024) normalized frames, F = T//hop + 1.

    Matches torchcrepe.preprocess with pad=True: center-pad by 512 both
    sides, per-frame mean subtraction, division by the unbiased std clamped
    at 1e-10.
    """
    b, t = signal.shape
    n_frames = t // hop_length + 1
    x = jnp.pad(signal, ((0, 0), (WINDOW_SIZE // 2, WINDOW_SIZE // 2)))
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(WINDOW_SIZE)[None, :]
    frames = x[:, idx]  # (B, F, 1024)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    std = jnp.std(frames, axis=-1, keepdims=True, ddof=1)
    return frames / jnp.maximum(std, 1e-10)


# ---------------------------------------------------------------------------
# Decoders (operate on masked activations; no gradients needed)
# ---------------------------------------------------------------------------


def _mask_range(act: jnp.ndarray, fmin: float = FMIN, fmax: float = FMAX) -> jnp.ndarray:
    lo = int(np.floor((1200 * np.log2(fmin / 10) - CENTS_OFFSET) / CENTS_PER_BIN))
    hi = int(np.ceil((1200 * np.log2(fmax / 10) - CENTS_OFFSET) / CENTS_PER_BIN))
    bins = jnp.arange(PITCH_BINS)
    mask = (bins >= lo) & (bins < hi)
    return jnp.where(mask, act, -jnp.inf)


def decode_argmax(act: jnp.ndarray):
    """act: (B, F, 360) -> (bins, frequency)."""
    bins = jnp.argmax(act, axis=-1)
    return bins, bins_to_frequency(bins)


def decode_weighted_argmax(act: jnp.ndarray, window: int = 4):
    """Average cents around the argmax bin weighted by activations."""
    bins = jnp.argmax(act, axis=-1)
    offs = jnp.arange(-window, window + 1)
    idx = jnp.clip(bins[..., None] + offs, 0, PITCH_BINS - 1)
    w = jnp.take_along_axis(act, idx, axis=-1)
    w = jnp.where(jnp.isfinite(w), jnp.maximum(w, 0.0), 0.0)
    cents = bins_to_cents(idx.astype(jnp.float32))
    avg_cents = jnp.sum(w * cents, -1) / jnp.maximum(jnp.sum(w, -1), 1e-12)
    return bins, cents_to_frequency(avg_cents)


@functools.lru_cache(maxsize=None)
def _viterbi_log_transition() -> np.ndarray:
    """Band-limited transition matrix: max(12-|i-j|, 0), row-normalized."""
    xx, yy = np.meshgrid(np.arange(PITCH_BINS), np.arange(PITCH_BINS))
    t = np.maximum(12 - np.abs(xx - yy), 0).astype(np.float64)
    t = t / t.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore"):
        return np.log(t).astype(np.float32)


def decode_viterbi(act: jnp.ndarray):
    """Viterbi decoding over softmaxed activations with the banded transition
    prior (torchcrepe decode.viterbi / librosa.sequence.viterbi semantics)."""
    log_obs = jax.nn.log_softmax(act, axis=-1)  # (B, F, 360); -inf-safe
    log_trans = jnp.asarray(_viterbi_log_transition())  # (from, to)
    log_init = jnp.full((PITCH_BINS,), -np.log(PITCH_BINS))

    def step(delta, obs_t):
        # delta: (B, 360) best log prob ending in each state
        scores = delta[:, :, None] + log_trans[None, :, :]  # (B, from, to)
        best_prev = jnp.argmax(scores, axis=1)  # (B, to)
        delta_new = jnp.max(scores, axis=1) + obs_t
        return delta_new, best_prev

    obs = jnp.moveaxis(log_obs, 1, 0)  # (F, B, 360)
    delta0 = log_init[None, :] + obs[0]
    delta_final, backptrs = jax.lax.scan(step, delta0, obs[1:])

    last = jnp.argmax(delta_final, axis=-1)  # (B,)

    def backtrack(state, ptr_t):
        prev = jnp.take_along_axis(ptr_t, state[:, None], axis=1)[:, 0]
        return prev, state

    _, path_rev = jax.lax.scan(backtrack, last, backptrs, reverse=True)
    bins = jnp.concatenate([jnp.moveaxis(path_rev, 0, 1), last[:, None]], axis=1)
    return bins, bins_to_frequency(bins)


_DECODERS = {
    "argmax": decode_argmax,
    "weighted_argmax": decode_weighted_argmax,
    "viterbi": decode_viterbi,
}


def postprocess(act: jnp.ndarray, decoder: str = "argmax"):
    """Masked decode + per-frame periodicity (activation at the decoded bin).

    act: (B, F, 360) sigmoid activations. Returns (pitch, periodicity).
    """
    masked = _mask_range(act)
    bins, pitch = _DECODERS[decoder](masked)
    periodicity = jnp.take_along_axis(act, bins[..., None], axis=-1)[..., 0]
    return pitch, periodicity


def filtered_pitch(params, signal: jnp.ndarray, decoder: str = "argmax", model: str = "tiny"):
    """CREPE F0 with periodicity gating (util/crepe.py:22-85).

    signal: (B, T) -> (pitch (B, F), activations (B, F, 360)); F = T//64 + 1.
    ``activations`` keep gradients; pitch/periodicity are stop-gradient
    decodes. Pitch is zeroed where periodicity < 0.21.
    """
    b, t = signal.shape
    frames = preprocess(signal)
    flat = frames.reshape(-1, WINDOW_SIZE)
    act = Crepe(model).apply(params, flat).reshape(b, -1, PITCH_BINS)
    pitch, periodicity = postprocess(jax.lax.stop_gradient(act), decoder)
    pitch = jnp.where(periodicity < PERIODICITY_THRESHOLD, 0.0, pitch)
    return pitch, act


def init_crepe(key: jax.Array, model: str = "tiny"):
    """Randomly initialized CREPE params (used when no torchcrepe checkpoint
    is available; import real weights via training.torch_import)."""
    return Crepe(model).init(key, jnp.zeros((1, WINDOW_SIZE)))
