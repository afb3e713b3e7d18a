"""Conversion over explicit (source, target) pairs — reference
generate_from_list.py:39-115 (argmax pitch decoder)."""

from __future__ import annotations

import argparse
from pathlib import Path

from td_vc_gan_tpu.config import load_config
from td_vc_gan_tpu.data.audio_io import write_audio
from td_vc_gan_tpu.data.pairs import PairsDataset
from td_vc_gan_tpu.inference import Converter
from td_vc_gan_tpu.models import crepe as crepe_mod


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--save_path", required=True)
    p.add_argument("--load_path", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--pairs_file", default="pairs")
    p.add_argument("--data_file", default="test_files")
    p.add_argument("--config_file", default=None)
    p.add_argument("--epoch", default=None)
    p.add_argument("--crepe_weights", default=None)
    return p.parse_args(argv)


def main(argv=None):
    from td_vc_gan_tpu.cli.generate_with_target import load_generator

    a = parse_args(argv)
    save_path, data_path, load_path = Path(a.save_path), Path(a.data_path), Path(a.load_path)
    cfg = load_config(a.config_file if a.config_file else load_path / "config.yaml")
    save_path.mkdir(parents=True, exist_ok=True)

    ds = PairsDataset(
        data_path / a.pairs_file, data_path / a.data_file, data_path / "speakers",
        sample_rate=cfg.model.sample_rate,
        normalization_db=cfg.train.normalization_db, add_new_spks=True,
    )
    G, pg = load_generator(cfg, load_path, a.epoch, ds.num_spk)
    if a.crepe_weights:
        from td_vc_gan_tpu.training.torch_import import load_torchcrepe

        crepe_params = load_torchcrepe(a.crepe_weights)
    else:
        import jax

        crepe_params = crepe_mod.init_crepe(jax.random.PRNGKey(0))
    conv = Converter(cfg, G, pg, crepe_params, decoder="argmax")

    for i in range(len(ds)):
        item = ds.__getitem__(i)
        f0_src, mu_src = conv.pitch(item["source"])
        _, mu_tgt = conv.pitch(item["target"])
        wav = conv.convert(
            item["source"], int(item["target_label"]), f0_src, mu_src, mu_tgt, seed=i
        )
        write_audio(save_path / f"{item['conv_name']}.wav", wav, cfg.model.sample_rate)


if __name__ == "__main__":
    main()
