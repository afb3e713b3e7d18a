"""Offline RMS normalization of a per-speaker wav tree, dropping NaN signals
(reference: scripts/preprocess_dataset.py)."""

from __future__ import annotations

import argparse
from glob import glob
from pathlib import Path

import numpy as np

from td_vc_gan_tpu.data.audio_io import read_audio, write_audio
from td_vc_gan_tpu.ops.dsp import eq_rms


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dataset_folder")
    p.add_argument("--save_folder", default="")
    p.add_argument("--normalization_db", type=float)
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)
    root = Path(opt.dataset_folder)
    save = Path(opt.save_folder) if opt.save_folder else root
    save.mkdir(parents=True, exist_ok=True)

    dirs = sorted(
        d.name for d in root.iterdir()
        if d.is_dir() and glob(str(d / "**" / "*.wav"), recursive=True)
    )
    print("Speakers:", dirs)
    for d in dirs:
        out_dir = save / d
        out_dir.mkdir(parents=True, exist_ok=True)
        for file in sorted(glob(str(root / d / "**" / "*.wav"), recursive=True)):
            signal, sr = read_audio(file)
            if opt.normalization_db is not None:
                signal = eq_rms(signal, opt.normalization_db)
            if np.isnan(signal).any():
                continue
            write_audio(str(file).replace(str(root / d), str(out_dir)), signal, sr)


if __name__ == "__main__":
    main()
