"""Render corruption variants offline so training is not host-bound.

The corruption branch (TD-PSOLA formant/pitch warp + random EQ — see
data/corruption.py) runs on the host for every training example. bench.py's
``input_feed_margin_8chip_dp`` shows a few-core host cannot feed 8 data-
parallel chips at the measured step rate, so this tool (no reference
equivalent — the reference corrupts inline, util/contentvec dataset.py:68-86)
pre-renders K corrupted variants per utterance; ``WaveDataset`` then replays
the per-item gain/flip/crop on a randomly chosen stored variant instead of
corrupting online.

Note the distributional difference, by design: variants are rendered from the
full normalized utterance, so a training epoch samples K fixed corruptions x
random crops rather than a fresh corruption per crop. With K >= 4 this is the
standard data-augmentation cache trade; pass --variants to taste.

Usage:
  python -m td_vc_gan_tpu.cli.precorrupt_dataset DATASET_FILE \
      --save_folder OUT [--variants 4] [--normalization_db -27] \
      [--sample_rate 16000] [--workers 8] [--seed 1234]

Writes OUT/{item_idx:06d}_<stem>__c{k}.wav for every manifest entry (the
index prefix keeps variants unique when stems repeat across speaker dirs)
plus OUT/precorrupt_index.pkl mapping original path -> variant paths; point
training at it with --precorrupted_index OUT/precorrupt_index.pkl.
"""
from __future__ import annotations

import argparse
import pickle
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dataset_file", help="path|speaker manifest")
    p.add_argument("--save_folder", required=True)
    p.add_argument("--variants", type=int, default=4)
    p.add_argument("--normalization_db", type=float, default=None,
                   help="must match the training config's normalization_db")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=1234)
    return p.parse_args(argv)


def _render(path: str, out_dir: Path, k: int, sr: int,
            norm_db: float | None, seed: int, item_idx: int) -> list[str]:
    from td_vc_gan_tpu.data import corruption
    from td_vc_gan_tpu.data.audio_io import read_audio, write_audio
    from td_vc_gan_tpu.ops.dsp import eq_rms

    signal, _ = read_audio(path, sr)
    if norm_db:
        signal = eq_rms(signal, norm_db)
    outs = []
    for v in range(k):
        rng = np.random.default_rng(np.random.SeedSequence([seed, item_idx, v]))
        cor = corruption.corrupt(signal, sr, rng)
        # item_idx prefix keeps variants unique when stems repeat across
        # speaker directories (spk1/utt.wav vs spk2/utt.wav)
        out = out_dir / f"{item_idx:06d}_{Path(path).stem}__c{v}.wav"
        write_audio(out, cor, sr)
        outs.append(str(out))
    return outs


def main(argv=None) -> Path:
    args = parse_args(argv)
    out_dir = Path(args.save_folder)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(args.dataset_file) as f:
        entries = [line.strip().split("|") for line in f if line.strip()]

    index: dict[str, list[str]] = {}
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        futs = {
            path: pool.submit(_render, path, out_dir, args.variants,
                              args.sample_rate, args.normalization_db,
                              args.seed, i)
            for i, (path, _label) in enumerate(entries)
        }
        for path, fut in futs.items():
            index[path] = fut.result()

    index_path = out_dir / "precorrupt_index.pkl"
    with open(index_path, "wb") as f:
        pickle.dump(index, f)
    print(f"precorrupted {len(index)} utterances x {args.variants} variants "
          f"-> {index_path}")
    return index_path


if __name__ == "__main__":
    main()
