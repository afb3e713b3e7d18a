"""Label-only conversion of a test manifest to every speaker — reference
generate_from_dataset.py:48-128 (no target-F0 matching; the reference passes
no excitation, which its decoder cannot actually run — ours substitutes a
zero excitation; we additionally offer --use_source_pitch)."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from td_vc_gan_tpu.config import load_config
from td_vc_gan_tpu.data.audio_io import write_audio
from td_vc_gan_tpu.data.dataset import WaveDataset
from td_vc_gan_tpu.inference import Converter
from td_vc_gan_tpu.models import crepe as crepe_mod


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--save_path", required=True)
    p.add_argument("--load_path", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--data_file", default="test_files")
    p.add_argument("--config_file", default=None)
    p.add_argument("--epoch", default=None)
    p.add_argument("--crepe_weights", default=None)
    p.add_argument("--use_source_pitch", action="store_true",
                   help="drive the excitation with the source F0 (ratio 1)")
    return p.parse_args(argv)


def main(argv=None):
    from td_vc_gan_tpu.cli.generate_with_target import load_generator

    a = parse_args(argv)
    save_path, data_path, load_path = Path(a.save_path), Path(a.data_path), Path(a.load_path)
    cfg = load_config(a.config_file if a.config_file else load_path / "config.yaml")
    save_path.mkdir(parents=True, exist_ok=True)

    ds = WaveDataset(
        data_path / a.data_file, data_path / "speakers",
        sample_rate=cfg.model.sample_rate, add_new_spks=True,
        normalization_db=cfg.train.normalization_db,
    )
    ds_spks = sorted({ds.spk_dict[label] for _, label in ds.entries})
    G, pg = load_generator(cfg, load_path, a.epoch, ds.num_spk)
    if a.crepe_weights:
        from td_vc_gan_tpu.training.torch_import import load_torchcrepe

        crepe_params = load_torchcrepe(a.crepe_weights)
    else:
        import jax

        crepe_params = crepe_mod.init_crepe(jax.random.PRNGKey(0))
    conv = Converter(cfg, G, pg, crepe_params)

    for i in range(len(ds)):
        item = ds.__getitem__(i)
        signal = item["signal"]
        label_src = int(item["label"])
        for tgt in ds_spks:
            if a.use_source_pitch:
                wav = conv.convert_with_ratio(signal, tgt, 1.0, seed=i)
            else:
                # frame count must match the PADDED length the Converter
                # synthesizes at (T//64 + 1 CREPE frames) — deriving it from
                # the raw length crashed on non-×320 utterances
                padded_len = -(-len(signal) // conv.bucket) * conv.bucket
                f0 = np.zeros((1, padded_len // 64 + 1), np.float32)
                wav = conv.convert(signal, tgt, f0, np.zeros((1, 1)), np.zeros((1, 1)), seed=i)
            write_audio(save_path / f"sig{i:02d}_{label_src}-{tgt}_conv.wav",
                        wav, cfg.model.sample_rate)
        write_audio(save_path / f"sig{i:02d}_{label_src}-X_orig.wav", signal,
                    cfg.model.sample_rate)


if __name__ == "__main__":
    main()
