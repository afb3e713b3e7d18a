"""End-to-end train smoke: CLI args -> reference YAML + overrides -> dataset
-> fused loop -> validation -> Orbax + torch checkpoints -> sample dumps ->
resume. The SURVEY test plan (§4) calls for exactly this tiny-config smoke;
the reference has no equivalent (its only integration test is the perceptual
eval harness)."""

from pathlib import Path

import numpy as np
import pytest

from td_vc_gan_tpu.data import audio_io

SR = 16000


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    entries = []
    for spk in range(2):
        d = root / f"spk{spk}"
        d.mkdir()
        for j in range(4):
            t = np.arange(6400) / SR
            f = 120 + 60 * spk + 15 * j
            sig = 0.25 * np.sin(2 * np.pi * f * t) * (
                1 + 0.05 * rng.standard_normal(t.size))
            path = d / f"utt{j}.wav"
            audio_io.write_audio(path, sig, SR)
            entries.append(f"{path}|spk{spk}")
    (root / "train_files").write_text("\n".join(entries) + "\n")
    (root / "test_files").write_text("\n".join(entries[:2]) + "\n")
    import pickle

    with open(root / "speakers", "wb") as f:
        pickle.dump([("spk0", 0), ("spk1", 1)], f)
    return root


OVERRIDES = [
    "model.generator.decoder_ratios=[10,4,2,2]",
    "model.generator.decoder_channels=[16,16,8,8,4]",
    "model.generator.content_dim=8",
    "model.generator.conditional_dim=8",
    "model.generator.num_enc_layers=2",
    "model.generator.mrf_kernel_sizes=[3]",
    "model.generator.mrf_dilations=[1,3]",
    "model.discriminator.num_channels_base=4",
    "train.batch_size=8",  # conftest pins an 8-device CPU mesh; DP batch must divide
    "train.num_epoch=1",
    "train.max_segment=5120",
    "train.mel_fft_sizes=[512]",
    "test.max_segment=5120",
    "test.num_tests=1",
    "log.save_interval=1",
    "log.gen_interval=1",
    "log.val_interval=1",
]


def _run_cli(tiny_corpus, save_path, extra=()):
    from td_vc_gan_tpu.cli import train as train_cli

    argv = [
        "--save_path", str(save_path),
        "--data_path", str(tiny_corpus),
        "--config_file", "/root/reference/config/conv_enc-stage2_2.yaml",
    ]
    for o in OVERRIDES:
        argv += ["--override", o]
    argv += list(extra)
    train_cli.main(argv)


def test_train_cli_one_epoch_then_resume(tiny_corpus, tmp_path):
    run = tmp_path / "run"
    _run_cli(tiny_corpus, run)

    # one epoch at batch 8 over 8 files = 1 step; epoch 1 saves + dumps
    orbax = list(run.glob("orbax/*")) + list(run.glob("checkpoints/*"))
    torch_ckpts = list(run.glob("*.pt")) + list(run.glob("**/*.pt"))
    wavs = list(run.glob("**/*.wav"))
    assert torch_ckpts, f"no torch-format checkpoints under {run}"
    assert wavs, "no sample dumps written"
    assert (run / "config.yaml").exists() or list(run.glob("*.yaml")), \
        "no provenance config written"
    # the saved config must be the EFFECTIVE one (overrides applied) — a
    # copied original drops every --override and anything reading the run
    # dir later (run_test generation, flagless resume) rebuilds the wrong
    # architecture and fails checkpoint import (round-4 regression)
    from td_vc_gan_tpu.config import load_config

    saved = load_config(run / "config.yaml")
    assert saved.model.generator.mrf_kernel_sizes == [3]
    assert saved.model.generator.decoder_channels == [16, 16, 8, 8, 4]

    # resume from the saved epoch and take one more epoch
    run2 = tmp_path / "run2"
    _run_cli(tiny_corpus, run2, extra=["--load_path", str(run), "--max_steps", "1"])


def test_train_cli_with_wavlm_checkpoint(tiny_corpus, tmp_path):
    """--wavlm_checkpoint end to end: the loaded backbone config must be
    APPLIED to the generator (flax Modules have .clone, not .replace — a
    hasattr('replace') guard used to skip this silently) and inherit the
    training compute_dtype."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from wavlm.WavLM import WavLM as TorchWavLM
    from wavlm.WavLM import WavLMConfig as TorchWavLMConfig

    # tiny backbone with WavLM-Large's stride geometry (total stride 320)
    small = dict(
        extractor_mode="layer_norm", encoder_layers=1, encoder_embed_dim=32,
        encoder_ffn_embed_dim=64, encoder_attention_heads=4,
        layer_norm_first=True,
        conv_feature_layers="[(16,10,5)] + [(16,3,2)]*4 + [(16,2,2)]*2",
        conv_pos=16, conv_pos_groups=4, relative_position_embedding=True,
        num_buckets=32, max_distance=80, gru_rel_pos=True, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, dropout_input=0.0,
        dropout_features=0.0, encoder_layerdrop=0.0, mask_prob=0.0,
    )
    small["conv_feature_layers"] = str(eval(small["conv_feature_layers"]))
    torch.manual_seed(0)
    m = TorchWavLM(TorchWavLMConfig(small))
    ckpt_path = tmp_path / "wavlm_small.pt"
    torch.save({"cfg": small, "model": m.state_dict()}, ckpt_path)

    overrides = [o for o in OVERRIDES
                 if not o.startswith("model.generator.decoder_ratios")]
    overrides += ["model.generator.decoder_ratios=[10,8,2,2]",  # wavlm /320
                  "model.generator.encoder_model=wavlm"]
    from td_vc_gan_tpu.cli import train as train_cli

    run = tmp_path / "run_wavlm"
    argv = ["--save_path", str(run), "--data_path", str(tiny_corpus),
            "--config_file", "/root/reference/config/conv_enc-stage2_2.yaml",
            "--wavlm_checkpoint", str(ckpt_path), "--max_steps", "1"]
    for o in overrides:
        argv += ["--override", o]
    train_cli.main(argv)
    assert (run / "config.yaml").exists()
