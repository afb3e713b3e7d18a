"""Waveform discriminators with per-speaker output heads.

TPU-native re-design of model/discriminator.py:7-118: MelGAN-style conv
stacks whose final conv emits one logit map per speaker; the target label
selects the scored map (StarGAN-style class-conditional D). The multiband
variant scores a Kaiser-low-passed cascade plus the generator's intermediate
subsample taps with shared per-band weights.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from td_vc_gan_tpu.models.layers import WNConv1d, finalize_dtype, leaky_relu
from td_vc_gan_tpu.ops.dsp import kaiser_filter_fc


class Discriminator(nn.Module):
    """Single-band discriminator (discriminator.py:7-53).

    Returns (selected_logits (B, T', 1), features list) — features are the
    activations after every conv block, consumed by the feature-matching loss.
    """

    num_classes: int
    num_layers: int = 4
    num_channels_base: int = 16
    num_channel_mult: int = 4
    downsampling_factor: int = 4
    num_channel_max: int = 1024
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, label_tgt: jnp.ndarray):
        wn = self.use_weight_norm
        features = []
        x = leaky_relu(
            WNConv1d(self.num_channels_base, 15, padding=7, pad_mode="reflect",
                     use_weight_norm=wn, name="input")(x)
        )
        features.append(x)

        nf = self.num_channels_base
        ds = self.downsampling_factor
        for i in range(self.num_layers):
            nf_prev = nf
            nf = min(nf * self.num_channel_mult, self.num_channel_max)
            x = leaky_relu(
                WNConv1d(
                    nf,
                    ds * 10 + 1,
                    stride=ds,
                    padding=ds * 5,
                    groups=nf_prev // self.num_channel_mult,
                    use_weight_norm=wn,
                    name=f"down_{i}",
                )(x)
            )
            features.append(x)

        x = leaky_relu(WNConv1d(nf, 5, padding=2, use_weight_norm=wn, name="pre_out")(x))
        features.append(x)

        logits = WNConv1d(self.num_classes, 3, padding=1, use_bias=False,
                          use_weight_norm=wn, name="output")(x)
        # per-speaker head selection (discriminator.py:49-52)
        out = jnp.take_along_axis(logits, label_tgt[:, None, None], axis=-1)
        # adversarial + feature-matching losses run in f32
        return finalize_dtype(out), [finalize_dtype(f) for f in features]


def _kaiser_downsample(x: jnp.ndarray, L: int = 129) -> jnp.ndarray:
    """Fixed 129-tap Kaiser (β=10, fc=0.5) low-pass + stride-2 decimation
    (discriminator.py:87-102). x: (B, T, 1)."""
    f = jnp.asarray(kaiser_filter_fc(L, 0.5, 10.0)).astype(x.dtype)[:, None, None]
    return jax.lax.conv_general_dilated(
        x, f, window_strides=(2,), padding=[((L - 1) // 2, (L - 1) // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


class MultiscaleDiscriminator(nn.Module):
    """AvgPool-cascade multiscale D (discriminator.py:55-75). Imported but
    unused by the reference trainer; provided for API parity."""

    num_disc: int
    num_classes: int
    num_layers: int = 4
    num_channels_base: int = 16
    num_channel_mult: int = 4
    downsampling_factor: int = 4
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, label_tgt: jnp.ndarray):
        outs, feats = [], []
        for i in range(self.num_disc):
            o, f = Discriminator(
                self.num_classes, self.num_layers, self.num_channels_base,
                self.num_channel_mult, self.downsampling_factor,
                use_weight_norm=self.use_weight_norm, name=f"disc_{i}",
            )(x, label_tgt)
            outs.append(o)
            feats.append(f)
            # count_include_pad=False avg pool, k=4 s=2 p=1
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
            ones = jnp.pad(jnp.ones_like(x), ((0, 0), (1, 1), (0, 0)))
            num = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, 4, 1), (1, 2, 1), "VALID")
            den = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 4, 1), (1, 2, 1), "VALID")
            x = num / den
        return outs, feats


class CollaborativeMultibandDiscriminator(nn.Module):
    """Multiband D over a Kaiser-decimated cascade plus generator subsample
    taps (discriminator.py:77-118).

    One call scores up to ``2*num_disc - 1`` (scale, signal) pairs with
    ``num_disc`` weight sets: the input at full rate through disc_0, then
    decimated ×2 per disc; the provided ``subscales`` (generator taps,
    ordered coarsest-first) are routed to the discriminators in reverse.
    """

    num_disc: int
    num_classes: int
    num_layers: int = 4
    num_channels_base: int = 16
    num_channel_mult: int = 4
    downsampling_factor: int = 4
    use_weight_norm: bool = True

    def _discs(self):
        return [
            Discriminator(
                self.num_classes, self.num_layers, self.num_channels_base,
                self.num_channel_mult, self.downsampling_factor,
                use_weight_norm=self.use_weight_norm, name=f"disc_{i}",
            )
            for i in range(self.num_disc)
        ]

    @nn.compact
    def __call__(self, x: jnp.ndarray, label_tgt: jnp.ndarray, subscales=()):
        discs = self._discs()
        outs, feats = [], []
        for disc in discs:
            o, f = disc(x, label_tgt)
            outs.append(o)
            feats.append(f)
            x = _kaiser_downsample(x)
        for x_sub, disc in zip(subscales, reversed(discs)):
            o, f = disc(x_sub, label_tgt)
            outs.append(o)
            feats.append(f)
        return outs, feats

    @staticmethod
    def get_subsamples(x: jnp.ndarray, num_disc: int = 3) -> list[jnp.ndarray]:
        """Low-passed real-signal pyramid matching the generator's taps
        (discriminator.py:110-118): [x / 2^(num_disc-1), ..., x/2]."""
        ret = []
        for _ in range(num_disc - 1):
            x = _kaiser_downsample(x)
            ret.append(x)
        return list(reversed(ret))
