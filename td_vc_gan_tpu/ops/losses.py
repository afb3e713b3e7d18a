"""Loss suite for the VC-GAN, fused into the jitted train step.

Re-implements the reference's losses (util/losses.py, train.py:271-281,
325-331) as pure-JAX functions over channels-last tensors. All reductions are
static-shape; everything here runs on TPU inside one XLA program.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp

from td_vc_gan_tpu.ops.stft import melspectrogram


# ---------------------------------------------------------------------------
# LSGAN adversarial losses (train.py:271-281, 325-331)
# ---------------------------------------------------------------------------


def lsgan_d_loss(real_logits: Sequence[jnp.ndarray], fake_logits: Sequence[jnp.ndarray]):
    """Per-scale LSGAN D losses: real -> 1, fake -> 0.

    Returns (loss_real_total, loss_fake_total, per_scale_real, per_scale_fake).
    """
    reals = [jnp.mean((r - 1.0) ** 2) for r in real_logits]
    fakes = [jnp.mean(f**2) for f in fake_logits]
    return sum(reals), sum(fakes), reals, fakes


def lsgan_g_loss(fake_logits: Sequence[jnp.ndarray]):
    """Per-scale LSGAN G adversarial loss: fake -> 1."""
    per_scale = [jnp.mean((f - 1.0) ** 2) for f in fake_logits]
    return sum(per_scale), per_scale


# ---------------------------------------------------------------------------
# Reconstruction losses
# ---------------------------------------------------------------------------


def multiscale_spec_loss(
    signal: jnp.ndarray,
    ref: jnp.ndarray,
    fft_sizes: Sequence[int] = (2048,),
    sr: int = 16000,
    n_mels: int = 80,
) -> jnp.ndarray:
    """Log-mel L1 loss summed over FFT sizes.

    Matches util/losses.py:33-53 per FFT size (80 mels, hop=fft//4, slaney
    norm, clamp 1e-5, L1, reference detached). NOTE: the reference's loop
    early-returns after the first FFT size (:51-53), so its shipped behavior
    is fft_sizes=[2048]; we honor whatever list the config passes.

    Args: signal/ref (B, T) waveforms.
    """
    total = 0.0
    ref = jax.lax.stop_gradient(ref)
    for n_fft in fft_sizes:
        s = jnp.log(jnp.clip(melspectrogram(signal, sr, n_fft, n_mels), min=1e-5))
        r = jnp.log(jnp.clip(melspectrogram(ref, sr, n_fft, n_mels), min=1e-5))
        total = total + jnp.mean(jnp.abs(s - r))
    return total


def multiscale_spec_loss_pwg(
    signal: jnp.ndarray,
    ref: jnp.ndarray,
    fft_sizes: Sequence[int],
    return_separated: bool = False,
):
    """Parallel-WaveGAN-style multiscale linear-STFT loss (util/losses.py:8-26).

    DEAD CODE in the reference, rebuilt for completeness: nothing calls it
    (training uses the mel variant above), and as written it cannot even run
    — its ``return`` statements sit INSIDE the fft_sizes loop so only the
    first size would ever contribute, and ``torch.sum(losses)`` over a
    Python list raises TypeError. This implements the per-FFT-size math
    exactly as the reference wrote it, with the control flow fixed to the
    evident intent (accumulate over every size):

      per size: mean((|S_sig| - sg(|S_ref|))^2) / mean(|S_sig|^2)      # :16-17
              + mean(|log|S_sig| - log sg(|S_ref|)|) / (frames*freqs)  # :19-20

    quirks preserved: the STFT is rectangular-window (bare torch.stft, no
    window arg), the "Frobenius" term is a ratio of mean SQUARES (not the
    canonical PWG sqrt-of-sums spectral convergence), the log term divides
    an already-mean by frames*freqs a second time, and the logs are
    unclamped (zero bins give -inf — callers feed real audio). Reductions
    keep the batch axis like the reference's ``dim=(-1,-2)``; returns the
    (B,) loss summed over sizes, plus the per-size list when
    ``return_separated``.
    """
    from td_vc_gan_tpu.ops.stft import stft_magnitude

    losses = []
    for n_fft in fft_sizes:
        s = stft_magnitude(signal, n_fft, n_fft // 4, window="rect")
        r = jax.lax.stop_gradient(stft_magnitude(ref, n_fft, n_fft // 4, window="rect"))
        loss_lin = jnp.mean((s - r) ** 2, axis=(-1, -2)) / jnp.mean(s**2, axis=(-1, -2))
        loss_log = jnp.mean(jnp.abs(jnp.log(s) - jnp.log(r)), axis=(-1, -2)) / (
            s.shape[-1] * s.shape[-2]
        )
        losses.append(loss_lin + loss_log)
    total = sum(losses)
    if return_separated:
        return total, losses
    return total


def multiscale_feat_loss(
    feat_sig: Sequence[Sequence[jnp.ndarray]],
    feat_ref: Sequence[Sequence[jnp.ndarray]],
) -> jnp.ndarray:
    """Discriminator feature-matching L1 (util/losses.py:55-68): per scale,
    sum of per-layer mean-L1 against the detached reference features, summed
    over scales."""
    total = 0.0
    for maps_sig, maps_ref in zip(feat_sig, feat_ref):
        scale_loss = 0.0
        for m_sig, m_ref in zip(maps_sig, maps_ref):
            scale_loss = scale_loss + jnp.mean(jnp.abs(m_sig - jax.lax.stop_gradient(m_ref)))
        total = total + scale_loss
    return total


def wave_l1_loss(signal: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(ref - signal))


# ---------------------------------------------------------------------------
# Contrastive content-preservation loss (util/losses.py:70-116)
# ---------------------------------------------------------------------------


def _sample_negatives(x: jnp.ndarray, n_neg: int, key: jax.Array) -> jnp.ndarray:
    """Sample per-frame within-utterance negatives, excluding self.

    x: (B, T, C). Returns detached negatives (B, T, N, C). Indices are drawn
    uniformly from {0..T-1}\\{t} via the shift trick at util/losses.py:79-83.
    """
    b, t, _ = x.shape
    idx = jax.random.randint(key, (b, t, n_neg), 0, t - 1)
    self_idx = jnp.arange(t)[None, :, None]
    idx = jnp.where(idx >= self_idx, idx + 1, idx)
    negs = jnp.take_along_axis(x[:, :, None, :], idx[..., None], axis=1)
    return jax.lax.stop_gradient(negs)


def _cosine_logits(x: jnp.ndarray, y: jnp.ndarray, negs: jnp.ndarray, temp: float) -> jnp.ndarray:
    """x, y: (B, T, C); negs: (B, T, N, C) -> logits (B, T, N+1) with the
    positive at index 0. Cosine similarity uses torch's 1e-8 epsilon."""
    targets = jnp.concatenate([y[:, :, None, :], negs], axis=2)  # (B,T,N+1,C)
    xn = jnp.linalg.norm(x, axis=-1, keepdims=True)
    tn = jnp.linalg.norm(targets, axis=-1)
    dots = jnp.einsum("btc,btnc->btn", x, targets)
    denom = jnp.maximum(xn * tn, 1e-8)
    return dots / denom / temp


def contrastive_loss(
    sig_x: jnp.ndarray,
    sig_y: jnp.ndarray,
    key: jax.Array,
    num_negatives: int = 100,
    temp: float = 0.1,
) -> jnp.ndarray:
    """Bidirectional InfoNCE over time frames (util/losses.py:70-116).

    sig_x, sig_y: (B, T, C) content embeddings (e.g. clean vs corrupted).
    """
    kx, ky = jax.random.split(key)
    negs_x = _sample_negatives(sig_x, num_negatives, kx)
    negs_y = _sample_negatives(sig_y, num_negatives, ky)
    logits_x = _cosine_logits(sig_x, sig_y, negs_x, temp)
    logits_y = _cosine_logits(sig_y, sig_x, negs_y, temp)
    logits = jnp.concatenate([logits_x, logits_y], axis=0)  # (2B, T, N+1)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(log_probs[..., 0])


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross entropy with integer labels."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=-1))
