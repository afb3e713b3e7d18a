"""Typed configuration with reference-YAML compatibility.

The reference drives everything from multi-document YAML files loaded into a
dot-accessible dict (reference: util/hparams.py:17-68, config/*.yaml).  The six
shipped stage configs must load unchanged.  This module keeps that surface but
adds what the reference lacks (SURVEY.md §5.6): a declared schema with
defaults, type coercion, and validation — so a stale/partial YAML degrades to
documented defaults instead of a KeyError mid-training.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml


# ---------------------------------------------------------------------------
# Schema. Defaults replicate config/wavlm-stage2_2.yaml, the flagship config.
# ---------------------------------------------------------------------------


@dataclass
class NormConfig:
    encoder: str | None = None
    decoder: str | None = None
    bottleneck: str | None = None


@dataclass
class CondConfig:
    encoder: str | None = None
    decoder: str | None = "target"
    bottleneck: str | None = "target"


@dataclass
class GeneratorConfig:
    decoder_ratios: list[int] = field(default_factory=lambda: [10, 8, 2, 2])
    decoder_channels: list[int] = field(default_factory=lambda: [256, 128, 64, 32, 16])
    num_bottleneck_layers: int = 0
    content_dim: int = 128
    conditional_dim: int = 128
    num_res_blocks: int = 3
    encoder_model: str = "conv"  # 'conv' | 'wavlm'
    num_enc_layers: int = 16
    mrf_kernel_sizes: list[int] = field(default_factory=lambda: [3, 7, 11])
    mrf_dilations: list[int] = field(default_factory=lambda: [1, 3, 5])
    norm_layer: NormConfig = field(default_factory=NormConfig)
    weight_norm: NormConfig = field(
        default_factory=lambda: NormConfig("weight_norm", "weight_norm", "weight_norm")
    )
    conditioning: CondConfig = field(default_factory=CondConfig)

    @property
    def total_ratio(self) -> int:
        r = 1
        for x in self.decoder_ratios:
            r *= x
        return r


@dataclass
class DiscriminatorConfig:
    num_disc: int = 3
    num_layers: int = 4
    num_channels_base: int = 16
    num_channel_mult: int = 4
    downsampling_factor: int = 4
    conditional_dim: int = 128
    conditional_spks: str = "target"


@dataclass
class ModelConfig:
    sample_rate: int = 16000
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)


@dataclass
class TrainConfig:
    no_conv: bool = False
    num_workers: int = 8
    batch_size: int = 16
    optimizer: str = "adam"
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    D_step_interval: int = 1
    G_step_interval: int = 1
    adam_beta: list[float] = field(default_factory=lambda: [0.8, 0.99])
    start_epoch: int = 0
    num_epoch: int = 40
    gan_loss: str = "lsgan"
    rec_loss: str = "feat"
    lambda_cls: float = 1.0
    lambda_rec: float = 10.0
    lambda_idt: float = 1.0
    lambda_feat: float = 2.0
    lambda_spec: float = 5.0
    lambda_wave: float = 0.0
    lambda_latcls: float = 0.0
    lambda_cont_emb: float = 10.0
    lambda_corrupted: float = 1.0
    lambda_converted: float = 0.0
    lambda_f0: float = 1000.0
    grad_max_norm_D: float | None = None
    grad_max_norm_G: float | None = None
    max_segment: int = 8960
    freeze_subnets: list[str] | None = field(default_factory=list)
    normalization_db: float | None = -30.0
    jitter_amp: int = 0
    # TPU-native additions (absent in the reference):
    seed: int = 1234
    param_dtype: str = "float32"
    # 'bfloat16' = mixed precision: bf16 conv/matmul inputs and inter-layer
    # activations (incl. the frozen WavLM backbone), f32 accumulation,
    # params, optimizer and losses (training/step.py, models/layers.py).
    # Measured on a single v5e (honest sync timing): bf16 is ~1.5x faster
    # than f32 on the fused stage-2 step; GAN training is numerically touchy
    # so it stays opt-in per config.
    compute_dtype: str = "float32"
    # Rematerialization of the G/D sub-network applies inside the G gradient
    # (training/step.py). True trades ~25% extra FLOPs for the HBM that the
    # un-rematerialized backward needs; set False when the batch fits (it
    # does at batch<=16 on a 16GB v5e) for a measurably faster step.
    remat: bool = True
    mel_fft_sizes: list[int] = field(default_factory=lambda: [2048])
    # NOTE: the reference's multiscale_spec_loss early-returns inside its loop
    # (util/losses.py:51-53), so only fft=2048 is ever applied. We default to
    # the same effective behavior; pass [2048,1024,512] for the full loss.
    #
    # Perf flags (round-4): program-shaping optimizations, formerly ambient
    # TDVC_* env vars. They change the traced step HLO, so they must agree
    # on every host of a multi-host run — living here (in the config every
    # host loads) guarantees that, and config dumps/checkpoint sidecars now
    # record them. The TDVC_* env vars remain explicit per-process A/B
    # overrides (td_vc_gan_tpu/perf.py). Defaults = the measured-fastest
    # single-v5e configuration; see PerfFlags for the per-flag rationale.
    shared_enc: bool = True
    split_cond: bool = True
    cond_ckpt: bool = True
    reuse_rec_emb: bool = True
    fused_cond: bool = False
    packed_conv: bool = False


@dataclass
class TestConfig:
    batch_size: int = 1
    num_tests: int = 10
    max_segment: int = 71680


@dataclass
class LogConfig:
    log_interval: int = 1000
    gen_interval: int = 5
    gen_num: int = 5
    save_interval: int = 5
    val_interval: int = 1
    val_lat_cls: bool = False


@dataclass
class DataConfig:
    train: str = ""
    validation: str = ""


@dataclass
class ParallelConfig:
    """Device-mesh layout (no analogue in the single-GPU reference)."""

    data_axis: str = "data"
    mesh_shape: list[int] | None = None  # None => all local devices on 'data'


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    log: LogConfig = field(default_factory=LogConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path: str | Path) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------


def _coerce(value: Any, target_type: Any, path: str):
    """Best-effort coercion of YAML scalars onto the schema's declared type."""
    if value is None:
        return None
    origin = getattr(target_type, "__origin__", None)
    # Unions (e.g. float | None): try each member type.
    import types as _types
    import typing as _typing

    if isinstance(target_type, (_types.UnionType,)) or origin is _typing.Union:
        for t in _typing.get_args(target_type):
            if t is type(None):
                continue
            try:
                return _coerce(value, t, path)
            except (TypeError, ValueError):
                continue
        return value
    if origin in (list, tuple):
        return list(value)
    if target_type is bool:
        return bool(value)
    if target_type is int:
        return int(value)
    if target_type is float:
        return float(value)
    if target_type is str:
        return str(value)
    return value


def _merge_into(dc: Any, src: dict, path: str = "") -> Any:
    """Recursively overlay a raw dict onto a dataclass instance."""
    fields = {f.name: f for f in dataclasses.fields(dc)}
    for key, value in src.items():
        if key not in fields:
            # Unknown keys are kept silently ignorable — mirrors the permissive
            # Dotdict behavior of util/hparams.py while keeping the schema.
            continue
        current = getattr(dc, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _merge_into(current, value, f"{path}{key}.")
        else:
            setattr(dc, key, _coerce(value, fields[key].type, f"{path}{key}"))
    return dc


def load_yaml_documents(path: str | Path) -> dict:
    """Load a reference-style multi-document YAML into one flat dict.

    Mirrors util/hparams.py:17-25: every document's top-level keys are merged
    into a single namespace (later documents win on collision).
    """
    with open(path, "r") as f:
        docs = yaml.safe_load_all(f.read())
        merged: dict = {}
        for doc in docs:
            if doc:
                merged.update(doc)
    return merged


def load_config_str(yaml_text: str, overrides: dict | None = None) -> Config:
    """Build a Config from a YAML string (reference load_hparam_str,
    util/hparams.py:9-15 — without its temp-file round trip)."""
    cfg = Config()
    merged: dict = {}
    for doc in yaml.safe_load_all(yaml_text):
        if doc:
            merged.update(doc)
    _merge_into(cfg, merged)
    if overrides:
        _merge_into(cfg, overrides)
    validate(cfg)
    return cfg


def load_config(path: str | Path | None = None, overrides: dict | None = None) -> Config:
    """Build a validated Config from a reference-compatible YAML file."""
    cfg = Config()
    if path is not None:
        _merge_into(cfg, load_yaml_documents(path))
    if overrides:
        _merge_into(cfg, overrides)
    validate(cfg)
    return cfg


def validate(cfg: Config) -> None:
    g = cfg.model.generator
    if len(g.decoder_channels) != len(g.decoder_ratios) + 1:
        raise ValueError(
            "decoder_channels must have len(decoder_ratios)+1 entries, got "
            f"{len(g.decoder_channels)} vs {len(g.decoder_ratios)} ratios"
        )
    if cfg.train.max_segment % g.total_ratio:
        raise ValueError(
            f"train.max_segment={cfg.train.max_segment} must be a multiple of "
            f"the total decoder ratio {g.total_ratio}"
        )
    if g.encoder_model not in ("conv", "wavlm"):
        raise ValueError(f"unknown encoder_model {g.encoder_model!r}")
    for sub in ("encoder", "decoder", "bottleneck"):
        nl = getattr(g.norm_layer, sub)
        if nl not in (None, "instance_norm", "conditional_instance_norm"):
            raise ValueError(f"unknown norm_layer.{sub}={nl!r}")
        wn = getattr(g.weight_norm, sub)
        if wn not in (None, "weight_norm"):
            raise ValueError(f"unknown weight_norm.{sub}={wn!r}")


class HParams(dict):
    """Dot-accessible view for code that expects the reference's HParam API
    (util/hparams.py:37-68)."""

    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__

    @classmethod
    def from_config(cls, cfg: Config) -> "HParams":
        def wrap(x):
            if isinstance(x, dict):
                return cls({k: wrap(v) for k, v in x.items()})
            return x

        return wrap(cfg.to_dict())
