"""Speaker-similarity metrics for converted audio.

Re-design of test_scripts/common/test_speaker_rec.py:120-183: embed every
utterance, compute cosine similarity of each conversion against the mean
target-speaker embedding, and nearest-mean classification accuracy.

Embedding backends, best available first:
1. resemblyzer d-vectors (if the wheel is importable — not in this image),
2. a self-contained spectral d-vector: per-utterance statistics of log-mel
   frames (means/stds + delta stats), length-normalized. Crude but monotone
   for same-vs-different-speaker comparisons, keeping the harness runnable
   hermetically.
"""

from __future__ import annotations

import numpy as np


def _mel_stat_embed(wav: np.ndarray, sr: int) -> np.ndarray:
    import jax.numpy as jnp

    from td_vc_gan_tpu.ops.stft import melspectrogram

    mel = np.asarray(melspectrogram(jnp.asarray(wav[None], dtype=jnp.float32), sr, 1024, 40))[0]
    logm = np.log(np.maximum(mel, 1e-8))
    # drop near-silent frames
    energy = logm.mean(-1)
    active = logm[energy > energy.max() - 6.0] if (energy > energy.max() - 6.0).any() else logm
    delta = np.diff(active, axis=0) if len(active) > 1 else np.zeros_like(active)
    emb = np.concatenate([
        active.mean(0), active.std(0), delta.mean(0), delta.std(0),
    ])
    return emb / (np.linalg.norm(emb) + 1e-9)


class SpeakerEmbedder:
    def __init__(self, sr: int = 16000):
        self.sr = sr
        self.backend = "mel_stats"
        try:
            from resemblyzer import VoiceEncoder  # type: ignore

            self._enc = VoiceEncoder()
            self.backend = "resemblyzer"
        except ImportError:
            self._enc = None

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        if self._enc is not None:
            return self._enc.embed_utterance(wav.astype(np.float32))
        return _mel_stat_embed(wav, self.sr)


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def evaluate(conv_items, target_items, sr: int = 16000) -> dict:
    """conv_items: list of (wav, tgt_speaker); target_items: list of
    (wav, speaker) original utterances. Returns similarity + accuracy."""
    embed = SpeakerEmbedder(sr)

    by_spk: dict = {}
    for wav, spk in target_items:
        by_spk.setdefault(spk, []).append(embed(wav))
    means = {spk: np.mean(v, axis=0) for spk, v in by_spk.items()}

    sims, correct = [], 0
    per_item = []
    for wav, tgt in conv_items:
        e = embed(wav)
        sim = cosine(e, means[tgt])
        sims.append(sim)
        pred = max(means, key=lambda s: cosine(e, means[s]))
        correct += int(pred == tgt)
        per_item.append({"target": tgt, "similarity": sim, "predicted": pred})
    return {
        "backend": embed.backend,
        "mean_similarity": float(np.mean(sims)) if sims else float("nan"),
        "accuracy": correct / len(conv_items) if conv_items else float("nan"),
        "items": per_item,
    }
