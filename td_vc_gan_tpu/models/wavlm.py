"""WavLM in JAX — frozen SSL feature backbone for the content encoder.

Re-implementation (not a translation) of the vendored Microsoft WavLM
(reference: wavlm/WavLM.py:220-375, wavlm/modules.py:303-763) sized by
default for WavLM-Large (24 layers, 1024-dim, 16 heads, layer-norm-first,
gated T5-style relative position bias in layer 0). Used inference-only and
frozen (ssl_encoder.py:127-133), so there is no masking/dropout path; the
whole stack runs inside jit in channels-last layout with the attention
matmuls on the MXU.

Weights come from the Microsoft ``WavLM-Large.pt`` checkpoint via
``load_wavlm_checkpoint``; random init keeps pipelines runnable without it.
"""

from __future__ import annotations

import dataclasses
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    # WavLM-Large defaults (WavLM.py:162-214 + the Large checkpoint cfg)
    extractor_mode: str = "layer_norm"  # 'default' (Base) | 'layer_norm' (Large)
    encoder_layers: int = 24
    encoder_embed_dim: int = 1024
    encoder_ffn_embed_dim: int = 4096
    encoder_attention_heads: int = 16
    layer_norm_first: bool = True
    conv_feature_layers: tuple = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2
    conv_bias: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True
    # 'bfloat16' runs the (frozen, inference-only) backbone with bf16 matmul
    # inputs and bf16 inter-layer activations; accumulation and layer norms
    # stay f32, the output is cast back to f32. None = pure f32.
    compute_dtype: str | None = None

    @property
    def total_stride(self) -> int:
        s = 1
        for _, _, stride in self.conv_feature_layers:
            s *= stride
        return s  # 320 => 50 Hz frames at 16 kHz


def _dt(cfg: "WavLMConfig"):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def wavlm_base_config() -> WavLMConfig:
    return WavLMConfig(
        extractor_mode="default", encoder_layers=12, encoder_embed_dim=768,
        encoder_ffn_embed_dim=3072, encoder_attention_heads=12,
        layer_norm_first=False, max_distance=800,
    )


class _LayerNorm(nn.Module):
    """Affine LayerNorm computed in float32 (Fp32LayerNorm, modules.py:30-44)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (xn * scale + bias).astype(dtype)


class _GroupNorm(nn.Module):
    """Affine GroupNorm(d, d) in float32 — per-channel instance norm over time
    (Fp32GroupNorm, modules.py:47-58; used by 'default' extractor layer 0)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (B, T, C), groups == C
        dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, 1, keepdims=True)
        var = jnp.var(x, 1, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (xn * scale + bias).astype(dtype)


class ConvFeatureExtractor(nn.Module):
    """Strided conv front-end: (B, T) wav -> (B, T/320, 512)
    (WavLM.py:378-504, 'default'/'layer_norm' modes)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = _dt(self.cfg)
        h = x[..., None]
        if dt is not None:
            h = h.astype(dt)
        for i, (dim, k, stride) in enumerate(self.cfg.conv_feature_layers):
            kernel = self.param(
                f"conv_{i}", nn.initializers.he_normal(), (k, h.shape[-1], dim)
            )
            args = {}
            if self.cfg.conv_bias:
                args["b"] = self.param(f"conv_{i}_bias", nn.initializers.zeros, (dim,))
            h = jax.lax.conv_general_dilated(
                h, kernel.astype(h.dtype), (stride,), [(0, 0)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
            )
            if dt is not None:
                h = h.astype(dt)
            if "b" in args:
                h = h + args["b"].astype(h.dtype)
            if self.cfg.extractor_mode == "layer_norm":
                h = _LayerNorm(name=f"ln_{i}")(h)
            elif i == 0:
                h = _GroupNorm(name="gn_0")(h)
            h = jax.nn.gelu(h, approximate=False)
        return h


def _relative_position_buckets(n: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """T5 bidirectional bucket map (modules.py:421-446), host-side (static n)."""
    ctx = np.arange(n)[:, None]
    mem = np.arange(n)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


class MultiheadAttention(nn.Module):
    """Self-attention with gated relative position bias
    (modules.py:303-763). Input (B, T, C); returns (out, position_bias)."""

    cfg: WavLMConfig
    has_relative_attention_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, position_bias: jnp.ndarray | None = None):
        c = self.cfg
        b, t, d = x.shape
        h = c.encoder_attention_heads
        dh = d // h

        def proj(name):
            w = self.param(f"{name}_kernel", nn.initializers.xavier_uniform(), (d, d))
            bb = self.param(f"{name}_bias", nn.initializers.zeros, (d,))
            return lambda y: y @ w.astype(y.dtype) + bb.astype(y.dtype)

        q = proj("q")(x).reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        k = proj("k")(x).reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        v = proj("v")(x).reshape(b, t, h, dh).transpose(0, 2, 1, 3)

        if self.has_relative_attention_bias and position_bias is None:
            emb = self.param(
                "rel_attn_bias", nn.initializers.normal(0.02), (c.num_buckets, h)
            )
            buckets = jnp.asarray(
                _relative_position_buckets(t, c.num_buckets, c.max_distance)
            )
            position_bias = emb[buckets].transpose(2, 0, 1)  # (H, T, T)

        bias = None
        if position_bias is not None:
            bias = jnp.broadcast_to(position_bias[None], (b, h, t, t))
            if c.gru_rel_pos:
                # gated rel-pos (modules.py:523-533): gates from the query
                gw = self.param("grep_kernel", nn.initializers.xavier_uniform(), (dh, 8))
                gb = self.param("grep_bias", nn.initializers.zeros, (8,))
                grep_a = self.param("grep_a", nn.initializers.ones, (1, h, 1, 1))
                gates = jax.nn.sigmoid(jnp.sum(
                    (q @ gw.astype(q.dtype) + gb.astype(q.dtype))
                    .reshape(b, h, t, 2, 4), axis=-1))
                gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]
                gate_a_1 = gate_a * (gate_b * grep_a - 1.0) + 2.0  # (B,H,T,1)
                bias = gate_a_1 * bias

        scores = jnp.einsum("bhqd,bhkd->bhqk", q * (dh**-0.5), k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            scores = scores + bias
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)  # softmax in f32
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d).astype(x.dtype)
        out = proj("out")(out)
        return out, position_bias


class EncoderLayer(nn.Module):
    """Pre/post-LN transformer layer (WavLM.py:616-743)."""

    cfg: WavLMConfig
    has_relative_attention_bias: bool = False

    @nn.compact
    def __call__(self, x, position_bias=None):
        c = self.cfg
        attn = MultiheadAttention(c, self.has_relative_attention_bias, name="self_attn")
        ln1 = _LayerNorm(name="self_attn_layer_norm")
        ln2 = _LayerNorm(name="final_layer_norm")

        def ffn(y):
            w1 = self.param("fc1_kernel", nn.initializers.xavier_uniform(),
                            (y.shape[-1], c.encoder_ffn_embed_dim))
            b1 = self.param("fc1_bias", nn.initializers.zeros, (c.encoder_ffn_embed_dim,))
            w2 = self.param("fc2_kernel", nn.initializers.xavier_uniform(),
                            (c.encoder_ffn_embed_dim, y.shape[-1]))
            b2 = self.param("fc2_bias", nn.initializers.zeros, (y.shape[-1],))
            h = jax.nn.gelu(y @ w1.astype(y.dtype) + b1.astype(y.dtype),
                            approximate=False)
            return h @ w2.astype(y.dtype) + b2.astype(y.dtype)

        if c.layer_norm_first:
            a, position_bias = attn(ln1(x), position_bias)
            x = x + a
            x = x + ffn(ln2(x))
        else:
            a, position_bias = attn(x, position_bias)
            x = ln1(x + a)
            x = ln2(x + ffn(x))
        return x, position_bias


class TransformerEncoder(nn.Module):
    """Conv positional embedding + layer stack (WavLM.py:507-613)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        d = c.encoder_embed_dim
        # pos_conv: grouped k=conv_pos conv, weight-normed over dim=2 (per
        # spatial tap — WavLM.py:526), SamePad trims the trailing element.
        kpos = c.conv_pos
        v = self.param(
            "pos_conv_v", nn.initializers.normal(0.02), (kpos, d // c.conv_pos_groups, d)
        )
        g = self.param("pos_conv_g", nn.initializers.ones, (kpos,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True))
        kernel = v * (g.reshape(-1, 1, 1) / jnp.maximum(norm, 1e-12))
        bias = self.param("pos_conv_bias", nn.initializers.zeros, (d,))
        pos = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1,), [(kpos // 2, kpos // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=c.conv_pos_groups,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + bias.astype(x.dtype)
        if kpos % 2 == 0:
            pos = pos[:, :-1]
        x = x + jax.nn.gelu(pos, approximate=False)

        final_ln = _LayerNorm(name="layer_norm")
        if not c.layer_norm_first:
            x = final_ln(x)

        position_bias = None
        for i in range(c.encoder_layers):
            x, position_bias = EncoderLayer(
                c,
                has_relative_attention_bias=(c.relative_position_embedding and i == 0),
                name=f"layer_{i}",
            )(x, position_bias)

        if c.layer_norm_first:
            x = final_ln(x)
        return x


class WavLM(nn.Module):
    """(B, T) wav -> (B, T//320, encoder_embed_dim) features
    (extract_features, WavLM.py:324-375; inference path, no masking)."""

    cfg: WavLMConfig = WavLMConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        feats = ConvFeatureExtractor(c, name="feature_extractor")(x)
        feats = _LayerNorm(name="post_extract_layer_norm")(feats)
        if feats.shape[-1] != c.encoder_embed_dim:
            w = self.param(
                "post_proj_kernel", nn.initializers.xavier_uniform(),
                (feats.shape[-1], c.encoder_embed_dim),
            )
            b = self.param("post_proj_bias", nn.initializers.zeros, (c.encoder_embed_dim,))
            feats = feats @ w.astype(feats.dtype) + b.astype(feats.dtype)
        out = TransformerEncoder(c, name="encoder")(feats)
        return out.astype(jnp.float32) if _dt(c) is not None else out


# ---------------------------------------------------------------------------
# checkpoint import
# ---------------------------------------------------------------------------


def load_wavlm_checkpoint(path) -> tuple[WavLMConfig, dict]:
    """Load Microsoft ``WavLM-Large.pt`` -> (config, flax params)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    raw_cfg = ckpt["cfg"]
    fields = {f.name for f in dataclasses.fields(WavLMConfig)}
    cfg_kwargs = {k: v for k, v in raw_cfg.items() if k in fields}
    if "conv_feature_layers" in cfg_kwargs and isinstance(cfg_kwargs["conv_feature_layers"], str):
        cfg_kwargs["conv_feature_layers"] = tuple(
            tuple(t) for t in eval(cfg_kwargs["conv_feature_layers"])  # noqa: S307
        )
    cfg = WavLMConfig(**cfg_kwargs)

    sd = ckpt["model"]

    def _np(k):
        return np.asarray(sd[k].detach().cpu().numpy())

    p: dict = {"feature_extractor": {}, "encoder": {}}
    for i in range(len(cfg.conv_feature_layers)):
        p["feature_extractor"][f"conv_{i}"] = _np(
            f"feature_extractor.conv_layers.{i}.0.weight"
        ).transpose(2, 1, 0)
        if cfg.extractor_mode == "layer_norm":
            p["feature_extractor"][f"ln_{i}"] = {
                "scale": _np(f"feature_extractor.conv_layers.{i}.2.1.weight"),
                "bias": _np(f"feature_extractor.conv_layers.{i}.2.1.bias"),
            }
        elif i == 0:
            p["feature_extractor"]["gn_0"] = {
                "scale": _np("feature_extractor.conv_layers.0.2.weight"),
                "bias": _np("feature_extractor.conv_layers.0.2.bias"),
            }
    p["post_extract_layer_norm"] = {"scale": _np("layer_norm.weight"), "bias": _np("layer_norm.bias")}
    if "post_extract_proj.weight" in sd:
        p["post_proj_kernel"] = _np("post_extract_proj.weight").T
        p["post_proj_bias"] = _np("post_extract_proj.bias")

    enc = p["encoder"]
    enc["pos_conv_v"] = _np("encoder.pos_conv.0.weight_v").transpose(2, 1, 0)
    enc["pos_conv_g"] = _np("encoder.pos_conv.0.weight_g").reshape(-1)
    enc["pos_conv_bias"] = _np("encoder.pos_conv.0.bias")
    enc["layer_norm"] = {"scale": _np("encoder.layer_norm.weight"), "bias": _np("encoder.layer_norm.bias")}
    for i in range(cfg.encoder_layers):
        base = f"encoder.layers.{i}"
        layer: dict = {
            "self_attn": {},
            "self_attn_layer_norm": {
                "scale": _np(f"{base}.self_attn_layer_norm.weight"),
                "bias": _np(f"{base}.self_attn_layer_norm.bias"),
            },
            "final_layer_norm": {
                "scale": _np(f"{base}.final_layer_norm.weight"),
                "bias": _np(f"{base}.final_layer_norm.bias"),
            },
            "fc1_kernel": _np(f"{base}.fc1.weight").T,
            "fc1_bias": _np(f"{base}.fc1.bias"),
            "fc2_kernel": _np(f"{base}.fc2.weight").T,
            "fc2_bias": _np(f"{base}.fc2.bias"),
        }
        sa = layer["self_attn"]
        for name in ("q", "k", "v", "out"):
            sa[f"{name}_kernel"] = _np(f"{base}.self_attn.{name}_proj.weight").T
            sa[f"{name}_bias"] = _np(f"{base}.self_attn.{name}_proj.bias")
        if cfg.gru_rel_pos:
            sa["grep_kernel"] = _np(f"{base}.self_attn.grep_linear.weight").T
            sa["grep_bias"] = _np(f"{base}.self_attn.grep_linear.bias")
            sa["grep_a"] = _np(f"{base}.self_attn.grep_a")
        if cfg.relative_position_embedding and i == 0:
            sa["rel_attn_bias"] = _np(f"{base}.self_attn.relative_attention_bias.weight")
        enc[f"layer_{i}"] = layer
    return cfg, {"params": p}
