"""SSL content encoder: frozen WavLM features → WaveNet posterior encoder.

Re-design of model/ssl_encoder.py:17-148. The WavLM backbone runs under
stop_gradient (frozen, as in the reference where it is .eval() with no_grad);
its parameters live under ``encoder/wavlm`` in the generator tree and are
masked out of the optimizer. The trainable part is the WaveNet-style
posterior encoder whose *mean* head is the content embedding.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from td_vc_gan_tpu.models.layers import WNConv1d


class WN(nn.Module):
    """WaveNet stack: per-layer dilated conv → gated tanh·sigmoid fusion →
    1×1 residual/skip, all weight-normed (model/ssl_encoder.py:17-82)."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            pad = (self.kernel_size * dilation - dilation) // 2
            x_in = WNConv1d(
                2 * h, self.kernel_size, dilation=dilation, padding=pad, name=f"in_{i}"
            )(x)
            t_act = jnp.tanh(x_in[..., :h])
            s_act = jax.nn.sigmoid(x_in[..., h:])
            acts = t_act * s_act
            if i < self.n_layers - 1:
                res_skip = WNConv1d(2 * h, 1, name=f"res_skip_{i}")(acts)
                x = x + res_skip[..., :h]
                output = output + res_skip[..., h:]
            else:
                res_skip = WNConv1d(h, 1, name=f"res_skip_{i}")(acts)
                output = output + res_skip
        return output


class PosteriorEncoder(nn.Module):
    """pre 1×1 → WN → proj to 2·out; returns (z, m, logs)
    (model/ssl_encoder.py:93-116). Only ``m`` is consumed downstream."""

    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, rng: jax.Array | None = None):
        x = WNConv1d(self.hidden_channels, 1, use_weight_norm=False, name="pre")(x)
        x = WN(self.hidden_channels, self.kernel_size, self.dilation_rate, self.n_layers, name="enc")(x)
        stats = WNConv1d(self.out_channels * 2, 1, use_weight_norm=False, name="proj")(x)
        m, logs = jnp.split(stats, 2, axis=-1)
        if rng is not None:
            z = m + jax.random.normal(rng, m.shape) * jnp.exp(logs)
        else:
            z = m
        return z, m, logs


class SSLEncoder(nn.Module):
    """Frozen WavLM-Large → trainable posterior encoder → content mean.

    forward (model/ssl_encoder.py:141-148): left-pad the waveform by 160
    samples, extract 1024-dim 50 Hz WavLM features under no-grad, then return
    the posterior mean. ``features`` may be supplied directly (precomputed) to
    skip the backbone.
    """

    num_layers: int = 16
    emb_dim: int = 128
    kernel_size: int = 5
    dilation_rate: int = 1
    ssl_dim: int = 1024
    wavlm_cfg: object | None = None  # WavLMConfig; None = WavLM-Large defaults

    @nn.compact
    def __call__(self, x: jnp.ndarray, features: jnp.ndarray | None = None) -> jnp.ndarray:
        if features is None:
            from td_vc_gan_tpu.models.wavlm import WavLM, WavLMConfig

            wav = x[..., 0] if x.ndim == 3 else x
            wav = jnp.pad(wav, ((0, 0), (160, 0)))
            cfg = self.wavlm_cfg if self.wavlm_cfg is not None else WavLMConfig()
            features = WavLM(cfg, name="wavlm")(wav)
            features = jax.lax.stop_gradient(features)
        _, m, _ = PosteriorEncoder(
            self.emb_dim, self.emb_dim, self.kernel_size, self.dilation_rate,
            self.num_layers, name="posterior",
        )(features)
        return m
