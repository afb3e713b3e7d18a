"""Batch conversion engine: jitted, bucketed full-utterance synthesis.

The conversion hot path of generate_with_target.py:126-177 re-built for XLA:
utterances are padded to shape buckets (multiples of the ×320 decoder ratio)
so each bucket compiles exactly once; CREPE (viterbi), the log-F0 mean shift,
excitation synthesis, and the generator forward all run in one compiled
program per bucket. This is the "conversion RTF" benchmark path.
"""

from __future__ import annotations

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
                 bucket_multiple: int = 320, decoder: str = "viterbi",
                 compute_dtype: str | None = None):
        self.cfg = cfg
        self.G = G
        self.params_g = params_g
        self.crepe_params = crepe_params
        self.bucket = bucket_multiple
        self.decoder = decoder
        self.num_classes = G.num_classes
        # None inherits cfg.train.compute_dtype; 'float32' forces full
        # precision (e.g. the fidelity parity suite)
        self.compute_dtype = (
            compute_dtype if compute_dtype is not None
            else getattr(cfg.train, "compute_dtype", None)
        )
        # ONE jitted fn each, built per instance: jax.jit already
        # re-specializes and caches per input shape, so a per-length cache
        # layer on top is redundant. NOT functools.lru_cache on the
        # methods: that keys on ``self`` in a process-global cache, pinning
        # every Converter (and its device params) for the process lifetime
        # — a device-memory leak in a serving process that reloads
        # checkpoints. Dropping the instance frees all its executables.
        #
        # Params are EXPLICIT ARGUMENTS of the jitted fns, never closure
        # captures (round-5): jit embeds closed-over arrays as program
        # CONSTANTS, so a flagship (WavLM) convert program serialized
        # ~1.2 GB of literal weights into every remote-compile RPC — the
        # round-4 relay "Broken pipe"/hang on conversion compiles, while
        # the train step (params ride in ``state`` as arguments) compiled
        # fine. As arguments they're device-resident buffers referenced by
        # the executable, the compile payload is weight-free, and a
        # checkpoint reload reuses the compiled program instead of
        # retracing.
        self._pitch_jit = None
        self._convert_jit = None
        self._dev_params_g = None
        self._dev_crepe = None

    def pad_to_bucket(self, signal: np.ndarray) -> tuple[np.ndarray, int]:
        n = signal.shape[-1]
        m = -(-n // self.bucket) * self.bucket
        return np.pad(signal, (0, m - n)), n

    def _pitch_fn(self, length: int | None = None):
        if self._pitch_jit is not None:
            return self._pitch_jit
        decoder = self.decoder

        @jax.jit
        def f_inner(crepe_params, signal):
            f0, _ = crepe_mod.filtered_pitch(crepe_params, signal, decoder)
            return f0, _log_f0_mean(f0)

        if self._dev_crepe is None:
            self._dev_crepe = jax.device_put(self.crepe_params)

        def f(signal):
            return f_inner(self._dev_crepe, signal)

        self._pitch_inner = f_inner  # exposed for the no-constants test
        self._pitch_jit = f
        return f

    def _convert_fn(self, length: int | None = None):
        if self._convert_jit is not None:
            return self._convert_jit
        from td_vc_gan_tpu import perf
        from td_vc_gan_tpu.models.layers import compute_dtype_scope

        # bind the config's perf flags at trace time (round-4): serving
        # programs honor cfg.train.split_cond etc. exactly like training
        pflags = perf.from_config(self.cfg)
        G = self.G
        num_classes = self.num_classes
        sample_rate = self.cfg.model.sample_rate
        compute_dtype = self.compute_dtype

        @jax.jit
        def f_inner(params_g, signal, f0_src, mu_src, mu_tgt, label_tgt, key):
            # log-mean shift on voiced frames (generate_with_target.py:163-165)
            f0_conv = jnp.where(
                f0_src > 0, jnp.exp(jnp.log(f0_src + 1e-6) + mu_tgt - mu_src), 0.0
            )
            exc = dsp.f0_to_excitation(f0_conv, 64, key, sample_rate)
            onehot = jax.nn.one_hot(label_tgt, num_classes)
            with perf.flags_scope(pflags), compute_dtype_scope(compute_dtype):
                wav, _, _ = G.apply(
                    params_g, signal[..., None], onehot, None, exc[..., None]
                )
            return wav[..., 0]

        if self._dev_params_g is None:
            self._dev_params_g = jax.device_put(self.params_g)

        def f(signal, f0_src, mu_src, mu_tgt, label_tgt, key):
            return f_inner(self._dev_params_g, signal, f0_src, mu_src,
                           mu_tgt, label_tgt, key)

        self._convert_inner = f_inner  # exposed for the no-constants test
        self._convert_jit = f
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

    def convert_batch(
        self,
        signals: np.ndarray,
        labels_tgt: np.ndarray,
        f0_src: np.ndarray,
        mu_src: np.ndarray,
        mu_tgt: np.ndarray,
        seed: int = 0,
    ) -> np.ndarray:
        """Convert a whole (B, T) batch in one device call.

        This is the high-throughput path: per-call dispatch/transfer latency
        dominates single-utterance conversion on networked TPU runtimes, so
        many-to-many jobs should batch the (utterance × target) grid.
        """
        wav = self._convert_fn(signals.shape[-1])(
            jnp.asarray(signals, dtype=jnp.float32),
            jnp.asarray(f0_src), jnp.asarray(mu_src), jnp.asarray(mu_tgt),
            jnp.asarray(labels_tgt), jax.random.PRNGKey(seed),
        )
        return np.asarray(wav)

    def pitch_batch(self, signals: np.ndarray):
        f0, mu = self._pitch_fn(signals.shape[-1])(jnp.asarray(signals, dtype=jnp.float32))
        return np.asarray(f0), np.asarray(mu)

    def convert_with_ratio(self, signal: np.ndarray, label_tgt: int, f0_ratio: float = 1.0,
                           seed: int = 0) -> np.ndarray:
        """Convert with an explicit pitch ratio instead of a target utterance."""
        f0, mu = self.pitch(signal)
        shift = np.log(np.asarray(f0_ratio, dtype=np.float32))
        return self.convert(signal, label_tgt, f0, mu, mu + shift, seed)

    def convert_long(
        self, signal: np.ndarray, label_tgt: int, mu_tgt: np.ndarray | float,
        chunk: int = 71680, overlap: int = 12800, seed: int = 0,
    ) -> np.ndarray:
        """Unbounded-length conversion by chunked overlap-add.

        The reference caps inference at test.max_segment=71680 samples
        (config wavlm-stage2_2.yaml); XLA's static shapes make one-shot
        unbounded synthesis impractical, so long audio is processed in
        fixed-size chunks (one compile total) with a ``overlap``-sample
        raised-cosine crossfade — the conv halo (receptive field ≈ 0.9 s at
        the deepest scale) means a short fade region differs slightly from a
        one-shot pass; 12800 samples (0.8 s) keeps the seam inaudible.
        Pitch statistics (mu_src) are computed globally for consistency.
        """
        if len(signal) <= chunk:
            f0, mu = self.pitch(signal)
            mu_t = np.full_like(mu, float(mu_tgt)) if np.isscalar(mu_tgt) else mu_tgt
            return self.convert(signal, label_tgt, f0, mu, mu_t, seed)

        hop = chunk - overlap
        # global source pitch statistics over the whole utterance
        mus = []
        for start in range(0, len(signal), chunk):
            seg = signal[start : start + chunk]
            if len(seg) < self.bucket:
                break
            _, mu = self.pitch(seg)
            mus.append(mu)
        mu_src = np.mean(mus, axis=0)
        mu_t = np.full_like(mu_src, float(mu_tgt)) if np.isscalar(mu_tgt) else mu_tgt

        out = np.zeros(len(signal), dtype=np.float32)
        weight = np.zeros(len(signal), dtype=np.float32)
        fade = 0.5 - 0.5 * np.cos(np.pi * np.arange(overlap) / overlap)
        n_chunks = 0
        for start in range(0, max(len(signal) - overlap, 1), hop):
            seg = signal[start : start + chunk]
            pad = chunk - len(seg)
            if pad:
                seg = np.pad(seg, (0, pad))
            f0, _ = self.pitch(seg)
            y = self.convert(seg, label_tgt, f0, mu_src, mu_t, seed + n_chunks)
            w = np.ones(chunk, dtype=np.float32)
            if start > 0:
                w[:overlap] = fade
            if start + chunk < len(signal):
                w[-overlap:] = fade[::-1]
            end = min(start + chunk, len(signal))
            out[start:end] += (y * w)[: end - start]
            weight[start:end] += w[: end - start]
            n_chunks += 1
        return out / np.maximum(weight, 1e-6)

    def convert_long_sharded(
        self, signal: np.ndarray, label_tgt: int, mu_tgt: np.ndarray | float,
        mesh, chunk: int = 71680, overlap: int = 12800, seed: int = 0,
    ) -> np.ndarray:
        """Device-parallel unbounded-length conversion (SURVEY §2.10/§7).

        The serial :meth:`convert_long` round-trips one chunk per device
        call; here the time axis is the parallel axis — ALL overlap-add
        chunks are stacked into one (n_chunks, chunk) batch sharded over the
        mesh's ``data`` axis, so pitch tracking and synthesis each run as a
        single SPMD program and long audio scales linearly with chip count.
        Values are sharding-invariant: a 1-device and an n-device mesh
        produce identical output (tests/test_inference.py).

        Protocol notes vs convert_long: the global source pitch statistic is
        the voiced-weighted mean over the same OLA chunks (not the serial
        method's disjoint re-segmentation), and all chunks share one
        excitation PRNG key folded with the chunk index.
        """
        from jax.sharding import NamedSharding, PartitionSpec

        chunk = -(-chunk // self.bucket) * self.bucket  # model-stride multiple
        hop = chunk - overlap
        if len(signal) <= chunk:
            return self.convert_long(signal, label_tgt, mu_tgt, chunk, overlap, seed)

        starts = list(range(0, max(len(signal) - overlap, 1), hop))
        n = len(starts)
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        n_pad = -(-n // n_dev) * n_dev
        segs = np.zeros((n_pad, chunk), dtype=np.float32)
        for i, start in enumerate(starts):
            seg = signal[start : start + chunk]
            segs[i, : len(seg)] = seg

        bsh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        # params ride as jit arguments (see _convert_fn); for the SPMD path
        # replicate them over this mesh explicitly so the compiled program
        # reads local replicas instead of resharding from one device
        repl = NamedSharding(mesh, PartitionSpec())
        self._dev_params_g = jax.device_put(self.params_g, repl)
        self._dev_crepe = jax.device_put(self.crepe_params, repl)
        segs_dev = jax.device_put(segs, bsh)
        f0, mu = self._pitch_fn(chunk)(segs_dev)
        f0, mu = np.asarray(f0), np.asarray(mu)

        # voiced-weighted global mean over the real chunks
        voiced = (f0[:n] > 0).sum(axis=1)
        mu_src = np.full((n_pad, 1), float(
            (mu[:n, 0] * voiced).sum() / max(voiced.sum(), 1)), np.float32)
        mu_t = (np.full((n_pad, 1), float(mu_tgt), np.float32)
                if np.isscalar(mu_tgt) else
                np.broadcast_to(np.asarray(mu_tgt, np.float32).reshape(1, 1),
                                (n_pad, 1)))
        labels = np.full((n_pad,), label_tgt, dtype=np.int32)

        ys = self._convert_fn(chunk)(
            segs_dev, jax.device_put(jnp.asarray(f0), bsh),
            jax.device_put(jnp.asarray(mu_src), bsh),
            jax.device_put(jnp.asarray(mu_t), bsh),
            jax.device_put(jnp.asarray(labels), bsh),
            jax.random.PRNGKey(seed),
        )
        ys = np.asarray(ys)

        out = np.zeros(len(signal), dtype=np.float32)
        weight = np.zeros(len(signal), dtype=np.float32)
        fade = 0.5 - 0.5 * np.cos(np.pi * np.arange(overlap) / overlap)
        for i, start in enumerate(starts):
            w = np.ones(chunk, dtype=np.float32)
            if start > 0:
                w[:overlap] = fade
            if start + chunk < len(signal):
                w[-overlap:] = fade[::-1]
            end = min(start + chunk, len(signal))
            out[start:end] += (ys[i] * w)[: end - start]
            weight[start:end] += w[: end - start]
        return out / np.maximum(weight, 1e-6)
