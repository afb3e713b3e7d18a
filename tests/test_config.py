"""Config schema tests, incl. loading the reference's shipped YAMLs unchanged."""

from pathlib import Path

import pytest

from td_vc_gan_tpu import config as cfg_mod

REF_CONFIGS = sorted(Path("/root/reference/config").glob("*.yaml"))


def test_defaults_are_stage2_2():
    cfg = cfg_mod.Config()
    assert cfg.model.generator.decoder_ratios == [10, 8, 2, 2]
    assert cfg.model.generator.total_ratio == 320
    assert cfg.train.max_segment == 8960
    assert cfg.model.discriminator.num_disc == 3


@pytest.mark.parametrize("path", [p for p in REF_CONFIGS if p.name != "default.yaml"], ids=lambda p: p.name)
def test_loads_reference_configs(path):
    cfg = cfg_mod.load_config(path)
    assert cfg.model.sample_rate == 16000
    assert cfg.model.generator.encoder_model in ("conv", "wavlm")
    assert cfg.train.batch_size == 16
    if path.name == "wavlm-stage1.yaml":
        assert cfg.train.no_conv is True
        assert cfg.train.lambda_rec == 0
    if "stage2_2" in path.name:
        assert cfg.train.lambda_rec == 10
        assert cfg.train.no_conv is False
    # empty YAML scalars parse to None
    assert cfg.model.generator.norm_layer.encoder is None
    assert cfg.model.generator.weight_norm.encoder == "weight_norm"


def test_overrides_and_validation():
    cfg = cfg_mod.load_config(None, {"train": {"batch_size": 4}})
    assert cfg.train.batch_size == 4
    with pytest.raises(ValueError):
        cfg_mod.load_config(None, {"train": {"max_segment": 1000}})
    with pytest.raises(ValueError):
        cfg_mod.load_config(None, {"model": {"generator": {"encoder_model": "nope"}}})


def test_hparams_view_roundtrip():
    cfg = cfg_mod.Config()
    hp = cfg_mod.HParams.from_config(cfg)
    assert hp.model.generator.conditional_dim == 128
    assert hp.train.lambda_f0 == 1000.0


def test_save_reload(tmp_path):
    cfg = cfg_mod.Config()
    cfg.train.batch_size = 2
    p = tmp_path / "cfg.yaml"
    cfg.save(p)
    cfg2 = cfg_mod.load_config(p)
    assert cfg2.train.batch_size == 2
