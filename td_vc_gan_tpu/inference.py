"""Batch conversion engine: jitted, bucketed full-utterance synthesis.

The conversion hot path of generate_with_target.py:126-177 re-built for XLA:
utterances are padded to shape buckets (multiples of the ×320 decoder ratio)
so each bucket compiles exactly once; CREPE (viterbi), the log-F0 mean shift,
excitation synthesis, and the generator forward all run in one compiled
program per bucket. This is the "conversion RTF" benchmark path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from td_vc_gan_tpu.config import Config
from td_vc_gan_tpu.models import crepe as crepe_mod
from td_vc_gan_tpu.ops import dsp


def _log_f0_mean(f0: jnp.ndarray) -> jnp.ndarray:
    """Voiced log-F0 mean (generate_with_target.py:140)."""
    voiced = f0 > 0
    return jnp.sum(voiced * jnp.log(f0 + 1e-6), -1, keepdims=True) / (
        jnp.sum(voiced, -1, keepdims=True) + 1e-6
    )


class Converter:
    """Stateful wrapper holding compiled per-bucket functions."""

    def __init__(self, cfg: Config, G, params_g, crepe_params,
                 bucket_multiple: int = 320, decoder: str = "viterbi"):
        self.cfg = cfg
        self.G = G
        self.params_g = params_g
        self.crepe_params = crepe_params
        self.bucket = bucket_multiple
        self.decoder = decoder
        self.num_classes = G.num_classes

    def pad_to_bucket(self, signal: np.ndarray) -> tuple[np.ndarray, int]:
        n = signal.shape[-1]
        m = -(-n // self.bucket) * self.bucket
        return np.pad(signal, (0, m - n)), n

    @functools.lru_cache(maxsize=64)
    def _pitch_fn(self, length: int):
        @jax.jit
        def f(signal):
            f0, _ = crepe_mod.filtered_pitch(self.crepe_params, signal, self.decoder)
            return f0, _log_f0_mean(f0)

        return f

    @functools.lru_cache(maxsize=64)
    def _convert_fn(self, length: int):
        @jax.jit
        def f(signal, f0_src, mu_src, mu_tgt, label_tgt, key):
            # log-mean shift on voiced frames (generate_with_target.py:163-165)
            f0_conv = jnp.where(
                f0_src > 0, jnp.exp(jnp.log(f0_src + 1e-6) + mu_tgt - mu_src), 0.0
            )
            exc = dsp.f0_to_excitation(f0_conv, 64, key, self.cfg.model.sample_rate)
            onehot = jax.nn.one_hot(label_tgt, self.num_classes)
            wav, _, _ = self.G.apply(
                self.params_g, signal[..., None], onehot, None, exc[..., None]
            )
            return wav[..., 0]

        return f

    def pitch(self, signal: np.ndarray):
        """signal: (T,) -> (f0 (1, F) np, mu (1, 1) np) with padding applied."""
        padded, _ = self.pad_to_bucket(signal)
        f0, mu = self._pitch_fn(padded.shape[-1])(jnp.asarray(padded[None]).astype(jnp.float32))
        return np.asarray(f0), np.asarray(mu)

    def convert(
        self, signal: np.ndarray, label_tgt: int,
        f0_src: np.ndarray, mu_src: np.ndarray, mu_tgt: np.ndarray,
        seed: int = 0,
    ) -> np.ndarray:
        """Convert one utterance to the target speaker with pitch matching."""
        padded, n = self.pad_to_bucket(signal)
        wav = self._convert_fn(padded.shape[-1])(
            jnp.asarray(padded[None], dtype=jnp.float32),
            jnp.asarray(f0_src), jnp.asarray(mu_src), jnp.asarray(mu_tgt),
            jnp.asarray([label_tgt]), jax.random.PRNGKey(seed),
        )
        return np.asarray(wav)[0, :n]

    def convert_with_ratio(self, signal: np.ndarray, label_tgt: int, f0_ratio: float = 1.0,
                           seed: int = 0) -> np.ndarray:
        """Convert with an explicit pitch ratio instead of a target utterance."""
        f0, mu = self.pitch(signal)
        shift = np.log(np.asarray(f0_ratio, dtype=np.float32))
        return self.convert(signal, label_tgt, f0, mu, mu + shift, seed)
