"""Generator: content encoder → bottleneck → excitation-conditioned decoder.

TPU-native re-design of the reference generator (model/generator.py:409-508).
Channels-last layout, functional flax modules, explicit returns instead of the
reference's mutated ``self.content_embedding`` attribute (generator.py:494-495).

Shipped-config shapes (config/wavlm-stage2_2.yaml): decoder_ratios [10,8,2,2]
(×320 upsampling), channels [256,128,64,32,16], content_dim=conditional_dim=128,
empty bottleneck; conditioning happens via FiLM in the decoder MRF blocks on
(speaker embedding ⊕ excitation pyramid).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from td_vc_gan_tpu.models.layers import (
    ConditionalInstanceNorm,
    FiLMResnetBlock,
    InstanceNorm,
    Linear,
    MRFBlock,
    ResnetBlock,
    WNConv1d,
    WNConvTranspose1d,
    finalize_dtype,
    leaky_relu,
)
from td_vc_gan_tpu.ops.dsp import kaiser_filter
import jax


EXCITE_CHANNELS = (8, 8, 8, 8, 8)  # generator.py:292
SUBSAMPLE_OUT = (False, True, True, False)  # generator.py:296


def _apply_norm(norm: str | None, features: int, x, c, name: str):
    """Normalization slot used between decoder/encoder stages.

    With the shipped configs norm is None => identity (get_norm_layer(None)
    returns nn.Identity; util/__init__.py:8-14)."""
    if norm is None:
        return x
    if norm == "instance_norm":
        return InstanceNorm(name=name)(x)
    if norm == "conditional_instance_norm":
        return ConditionalInstanceNorm(features, name=name)(x, c)
    raise ValueError(f"unknown norm {norm!r}")


class ExciteDownsampleBlock(nn.Module):
    """Strided conv stack with an anti-aliased (fixed Kaiser low-pass)
    shortcut, downsampling the excitation by ``scale_factor``
    (generator.py:141-173)."""

    out_channels: int
    scale_factor: int
    n_layers: int = 2
    kernel_size: int = 5
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = self.scale_factor
        # main branch: strided conv + n_layers [lrelu, k5 'same' conv]
        h = WNConv1d(
            self.out_channels, 2 * r, stride=r, padding=r // 2,
            use_weight_norm=self.use_weight_norm, name="down_conv",
        )(x)
        for i in range(self.n_layers):
            h = WNConv1d(
                self.out_channels, self.kernel_size, padding="same",
                use_weight_norm=self.use_weight_norm, name=f"conv_{i}",
            )(leaky_relu(h))

        # shortcut: 1x1 conv (plain, no WN: generator.py:157) then a fixed
        # depthwise Kaiser low-pass stride-r decimation (non-trainable buffer)
        sh = WNConv1d(self.out_channels, 1, use_weight_norm=False, name="shortcut")(x)
        f = jnp.asarray(kaiser_filter(16 * r, 1.0 / r)).astype(sh.dtype)  # (16r+1,)
        kernel = jnp.tile(f[:, None, None], (1, 1, self.out_channels))
        sh = jax.lax.conv_general_dilated(
            sh, kernel,
            window_strides=(r,), padding=[(8 * r, 8 * r)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.out_channels,
        )
        # branch lengths agree for even ratios (the only ones the reference
        # supports — generator.py:314); trim to the shorter for odd ratios
        n = min(h.shape[1], sh.shape[1])
        return h[:, :n] + sh[:, :n]


class Encoder(nn.Module):
    """Conv content encoder (generator.py:197-273): input k7 reflect conv,
    per-stage [norm, lrelu, strided conv k=2r] + MRF, final k7 conv and
    optional projection to ``embedding_dim``; output L2-normalized over
    channels — the content embedding lives on the unit sphere."""

    downsample_ratios: tuple[int, ...]
    channel_sizes: tuple[int, ...]
    conditional_dim: int = 0
    embedding_dim: int | None = None
    norm: str | None = None
    use_weight_norm: bool = True
    kernel_sizes: tuple[int, ...] = (3, 7, 11)
    dilations: tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray | None = None) -> jnp.ndarray:
        wn = self.use_weight_norm
        cin = self.norm == "conditional_instance_norm"
        x = WNConv1d(
            self.channel_sizes[0], 7, padding=3, pad_mode="reflect",
            use_weight_norm=wn, name="input_conv",
        )(x)
        if self.conditional_dim > 0 and not cin and c is not None:
            # speaker conditioning by concat after the input conv
            # (generator.py:259-261; unused in shipped configs)
            c_rep = jnp.broadcast_to(c[:, None, :], (x.shape[0], x.shape[1], c.shape[-1]))
            x = jnp.concatenate([x, c_rep], axis=-1)

        for i, r in enumerate(self.downsample_ratios):
            ch = self.channel_sizes[i + 1]
            x = _apply_norm(self.norm, x.shape[-1], x, c, name=f"stage_{i}_norm")
            x = WNConv1d(
                ch, 2 * r, stride=r, padding=r // 2 + r % 2,
                use_weight_norm=wn, name=f"stage_{i}_down",
            )(leaky_relu(x))
            x = MRFBlock(
                ch, 0, dilations=self.dilations, kernel_sizes=self.kernel_sizes,
                use_weight_norm=wn,
                name=f"stage_{i}_mrf",
            )(x)

        x = WNConv1d(
            self.channel_sizes[-1], 7, padding=3, use_weight_norm=wn, name="final_conv"
        )(leaky_relu(x))
        if self.embedding_dim:
            x = WNConv1d(
                self.embedding_dim, 7, padding=3, use_bias=False,
                use_weight_norm=wn, name="proj",
            )(leaky_relu(x))
        # F.normalize(dim=channels), torch eps=1e-12 (generator.py:271);
        # computed in f32 — the unit-sphere content embedding feeds the
        # contrastive loss and deserves full precision
        x = finalize_dtype(x)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)


class Decoder(nn.Module):
    """Upsampling decoder with per-scale excitation conditioning and
    subsample audio taps (generator.py:276-407).

    Forward per stage: [norm slot, lrelu, ConvT ×r] then (tap, cond refresh)
    then MRF FiLM-conditioned on (speaker-embedding repeated ⊕ excitation at
    that scale). Taps at 1/4 and 1/2 rate feed the multiband discriminator.
    """

    upsample_ratios: tuple[int, ...]
    channel_sizes: tuple[int, ...]
    conditional_dim: int = 0
    embedding_dim: int | None = None
    norm: str | None = None
    use_weight_norm: bool = True
    kernel_sizes: tuple[int, ...] = (3, 7, 11)
    dilations: tuple[int, ...] = (1, 3, 5)

    def _excite_pyramid(self, c_var: jnp.ndarray) -> list[jnp.ndarray]:
        """Excitation at every decoder scale (generator.py:353-372).

        The downsample chain is *constructed* per-ratio in forward order but
        *applied* reversed: full-rate input conv first, then blocks with
        ratios reversed. Module names keep the reference's list indices for
        checkpoint conversion. Returns [full, /r_n, ..., /prod(r)] rates.
        """
        wn = self.use_weight_norm
        n = len(self.upsample_ratios)
        scaled = []
        c = WNConv1d(
            EXCITE_CHANNELS[0], 7, padding=3, pad_mode="reflect",
            use_weight_norm=wn, name=f"excite_down_{n}",
        )(c_var)
        scaled.append(c)
        for j in range(n - 1, -1, -1):
            c = ExciteDownsampleBlock(
                EXCITE_CHANNELS[j + 1], self.upsample_ratios[j],
                use_weight_norm=wn, name=f"excite_down_{j}",
            )(c)
            scaled.append(c)
        return scaled

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: jnp.ndarray | None = None,
        c_var: jnp.ndarray | None = None,
        out_subsample: bool = False,
    ):
        wn = self.use_weight_norm
        subsamples: list[jnp.ndarray] = []

        # excitation pyramid; index -1-k gives the excitation at scale k
        c_scales = self._excite_pyramid(c_var) if c_var is not None else None

        # conditioning at the bottleneck rate: spk embedding ⊕ coarsest excite.
        # The concat(broadcast, excite) tensor is only materialized for
        # conditional norms; the MRF FiLM chains consume the (spk, excite)
        # pair directly (layers.py _split_cond_enabled — the broadcast half
        # is time-constant, so the wide concat is pure byte traffic)
        use_cin = self.norm == "conditional_instance_norm"
        c_const = None
        cond = None
        if c is not None and use_cin:
            c_const = jnp.broadcast_to(c[:, None, :], (x.shape[0], x.shape[1], c.shape[-1]))
            cond = (
                jnp.concatenate([c_const, c_scales[-1]], axis=-1)
                if c_scales is not None
                else c_const
            )

        if self.embedding_dim:
            x = WNConv1d(
                self.channel_sizes[0], 7, padding=3, use_bias=False,
                use_weight_norm=wn, name="proj",
            )(leaky_relu(x))
        x = WNConv1d(
            self.channel_sizes[0], 7, padding=3, use_weight_norm=wn, name="input_conv"
        )(leaky_relu(x))

        for i, r in enumerate(self.upsample_ratios):
            ch = self.channel_sizes[i + 1]
            x = _apply_norm(self.norm, x.shape[-1], x, cond, name=f"stage_{i}_norm")
            x = WNConvTranspose1d(
                ch, 2 * r, stride=r, padding=r // 2 + r % 2, output_padding=r % 2,
                use_weight_norm=wn, name=f"stage_{i}_up",
            )(leaky_relu(x))

            # subsample tap (generator.py:332-340,391-394): emitted from x
            # right after the ConvT at stages flagged in SUBSAMPLE_OUT
            if SUBSAMPLE_OUT[i] if i < len(SUBSAMPLE_OUT) else False:
                tap = WNConv1d(
                    1, 7, padding=3, pad_mode="reflect",
                    use_weight_norm=wn, name=f"subsample_out_{i}",
                )(leaky_relu(x))
                subsamples.append(jnp.tanh(tap))

            # refresh conditioning to this scale (generator.py:396-399)
            if c_const is not None:
                c_const = jnp.repeat(c_const, r, axis=1)
                cond = (
                    jnp.concatenate([c_const, c_scales[-2 - i]], axis=-1)
                    if c_scales is not None
                    else c_const
                )

            mrf_cond = None
            mrf_cond_ch = 0
            if c is not None:
                if c_scales is not None:
                    mrf_cond = (c, c_scales[-2 - i])  # split form
                    mrf_cond_ch = self.conditional_dim + EXCITE_CHANNELS[i + 1]
                else:
                    mrf_cond = c  # 2-D; MRFBlock broadcasts
                    mrf_cond_ch = self.conditional_dim + EXCITE_CHANNELS[i + 1]
            x = MRFBlock(
                ch, mrf_cond_ch, dilations=self.dilations,
                kernel_sizes=self.kernel_sizes, use_weight_norm=wn,
                name=f"stage_{i}_mrf",
            )(x, mrf_cond)

        x = _apply_norm(self.norm, x.shape[-1], x, cond, name="final_norm")
        x = WNConv1d(
            1, 7, padding=3, pad_mode="reflect", use_weight_norm=wn, name="output_conv"
        )(leaky_relu(x))
        x = jnp.tanh(x)

        if out_subsample:
            return x, subsamples
        return x


class Generator(nn.Module):
    """Full generator (generator.py:409-508).

    forward(x, c_tgt_onehot[, c_src_onehot, c_var]) returns
    ``(waveform, subsamples, content_embedding)`` — the content embedding is
    an explicit output (the reference caches it on the module instead).

    x: (B, T, 1) waveform; c_*: (B, num_classes) one-hot; c_var: (B, T, 1)
    excitation at sample rate.
    """

    decoder_ratios: tuple[int, ...]
    decoder_channels: tuple[int, ...]
    num_bottleneck_layers: int
    num_classes: int
    conditional_dim: int
    content_dim: int | None = None
    encoder_model: str | None = None  # None/'conv' | 'wavlm'
    num_enc_layers: int = 16
    norm_layer: tuple[str | None, str | None, str | None] = (None, None, None)  # (bot, enc, dec)
    weight_norm: tuple[bool, bool, bool] = (True, True, True)  # (bot, enc, dec)
    bot_cond: str = "target"  # 'target' | 'both'
    enc_cond: str | None = None
    dec_cond: str | None = "target"
    kernel_sizes: tuple[int, ...] = (3, 7, 11)
    dilations: tuple[int, ...] = (1, 3, 5)
    wavlm_cfg: object | None = None  # WavLMConfig for the SSL encoder path

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c_tgt: jnp.ndarray,
        c_src: jnp.ndarray | None = None,
        c_var: jnp.ndarray | None = None,
        out_subsample: bool = True,
        train: bool = False,
        encode_only: bool = False,
        content: jnp.ndarray | None = None,
    ):
        """``content``: a precomputed content embedding — skips the encoder.

        The fused train step encodes each source signal ONCE and decodes the
        conversion + identity passes from the same embedding (the encoder is
        unconditioned here: the reference's encoder call likewise sees only x,
        model/generator.py:445-452), halving encoder FLOPs/bytes per step.
        The embedding crossing this boundary is f32-finalized either way
        (Encoder L2-normalizes in f32; encode_only finalizes), so results
        are identical to the fused single call.
        """
        bot_norm, enc_norm, dec_norm = self.norm_layer
        bot_wn, enc_wn, dec_wn = self.weight_norm
        embedding = Linear(self.conditional_dim, name="embedding")

        c_tgt_emb = embedding(c_tgt) if c_tgt is not None else None
        c_src_emb = embedding(c_src) if c_src is not None else None

        if content is not None:
            pass  # encoder skipped: params exist (init never takes this path)
        elif self.encoder_model == "wavlm":
            from td_vc_gan_tpu.models.ssl_encoder import SSLEncoder

            content = SSLEncoder(
                num_layers=self.num_enc_layers,
                emb_dim=self.content_dim,
                wavlm_cfg=self.wavlm_cfg,
                name="encoder",
            )(x)
        else:
            enc_cond_dim = self.conditional_dim if self.enc_cond is not None else 0
            content = Encoder(
                tuple(reversed(self.decoder_ratios)),
                tuple(reversed(self.decoder_channels)),
                conditional_dim=enc_cond_dim,
                embedding_dim=self.content_dim,
                norm=enc_norm,
                use_weight_norm=enc_wn,
                kernel_sizes=self.kernel_sizes,
                dilations=self.dilations,
                name="encoder",
            )(x, c_src_emb if self.enc_cond is not None else None)

        if encode_only:
            # standalone content embedding, e.g. for the contrastive loss on
            # corrupted audio (train.py:404-413)
            return finalize_dtype(content)

        # bottleneck (empty in all shipped configs; generator.py:459-472)
        h = content
        if self.num_bottleneck_layers:
            bot_c = (
                jnp.concatenate([c_src_emb, c_tgt_emb], axis=-1)
                if self.bot_cond == "both"
                else c_tgt_emb
            )
            # NOTE: the reference sizes these blocks at decoder_channels[0]
            # (generator.py:468-470), which breaks whenever the encoder
            # projects to content_dim != decoder_channels[0]; shipped configs
            # never instantiate the bottleneck. We size from the actual width.
            for i in range(self.num_bottleneck_layers):
                h = FiLMResnetBlock(
                    h.shape[-1],
                    bot_c.shape[-1],
                    dilation=1,
                    use_weight_norm=bot_wn,
                    name=f"bottleneck_{i}",
                )(h, bot_c)

        # Calling without an excitation (generate_from_dataset.py:118) keeps
        # the parameter structure by substituting a zero excitation — the
        # reference's decoder crashes on this path (generator.py:390-391).
        if c_var is None:
            total = 1
            for r in self.decoder_ratios:
                total *= r
            c_var = jnp.zeros((h.shape[0], h.shape[1] * total, 1), h.dtype)

        dec_cond_dim = self.conditional_dim if self.dec_cond is not None else 0
        out = Decoder(
            tuple(self.decoder_ratios),
            tuple(self.decoder_channels),
            conditional_dim=dec_cond_dim,
            embedding_dim=self.content_dim,
            norm=dec_norm,
            use_weight_norm=dec_wn,
            kernel_sizes=self.kernel_sizes,
            dilations=self.dilations,
            name="decoder",
        )(h, c_tgt_emb, c_var, out_subsample=True)
        wav, subsamples = out

        # losses and audio IO run in f32; cast the bf16-scope outputs back
        wav = finalize_dtype(wav)
        subsamples = [finalize_dtype(s) for s in subsamples]
        content = finalize_dtype(content)
        if out_subsample:
            return wav, subsamples, content
        return wav, content


def generator_from_config(gen_cfg, num_classes: int,
                          compute_dtype: str | None = None,
                          wavlm_cfg=None) -> Generator:
    """Build a Generator from a GeneratorConfig (td_vc_gan_tpu.config).

    compute_dtype ('bfloat16' | 'float32' | None) configures the frozen
    WavLM backbone's precision; the conv stacks read the dtype from the
    step's compute_dtype_scope instead (models/layers.py).
    ``wavlm_cfg`` overrides the backbone architecture (default WavLM-Large)
    — used by the multichip dryrun/scaling sweep to exercise the SSL path
    with a toy backbone.
    """
    nl = gen_cfg.norm_layer
    wnl = gen_cfg.weight_norm
    cond = gen_cfg.conditioning
    if (wavlm_cfg is None and gen_cfg.encoder_model == "wavlm"
            and compute_dtype not in (None, "float32")):
        from td_vc_gan_tpu.models.wavlm import WavLMConfig

        wavlm_cfg = WavLMConfig(compute_dtype=compute_dtype)
    return Generator(
        decoder_ratios=tuple(gen_cfg.decoder_ratios),
        decoder_channels=tuple(gen_cfg.decoder_channels),
        num_bottleneck_layers=gen_cfg.num_bottleneck_layers,
        num_classes=num_classes,
        conditional_dim=gen_cfg.conditional_dim,
        content_dim=gen_cfg.content_dim,
        encoder_model=gen_cfg.encoder_model if gen_cfg.encoder_model != "conv" else None,
        num_enc_layers=gen_cfg.num_enc_layers,
        norm_layer=(nl.bottleneck, nl.encoder, nl.decoder),
        weight_norm=(
            wnl.bottleneck == "weight_norm",
            wnl.encoder == "weight_norm",
            wnl.decoder == "weight_norm",
        ),
        bot_cond=cond.bottleneck or "target",
        enc_cond=cond.encoder,
        dec_cond=cond.decoder,
        kernel_sizes=tuple(gen_cfg.mrf_kernel_sizes),
        dilations=tuple(gen_cfg.mrf_dilations),
        wavlm_cfg=wavlm_cfg,
    )
