"""F0-contour inspection for pitch-control verification
(reference: test_scripts/sample_f0.py:41-114): plots F0 contours of
original/converted pairs and histograms of achieved F0 ratios."""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("conv_dir", help="directory of *-conv.wav / *-X-orig.wav files")
    p.add_argument("--out", default=None, help="output plot path (png); json always written")
    p.add_argument("--crepe_weights", default=None)
    return p.parse_args(argv)


def main(argv=None):
    import jax

    from td_vc_gan_tpu.data.audio_io import read_audio
    from td_vc_gan_tpu.models import crepe as crepe_mod

    a = parse_args(argv)
    conv_dir = Path(a.conv_dir)
    if a.crepe_weights:
        from td_vc_gan_tpu.training.torch_import import load_torchcrepe

        params = load_torchcrepe(a.crepe_weights)
    else:
        params = crepe_mod.init_crepe(jax.random.PRNGKey(0))

    def pitch(path):
        import jax.numpy as jnp

        wav, _ = read_audio(path, 16000)
        n = len(wav) // 320 * 320
        f0, _ = crepe_mod.filtered_pitch(params, jnp.asarray(wav[:n])[None], "viterbi")
        return np.asarray(f0)[0]

    conv_re = re.compile(r"(.+)-(.+)-(.+)-conv\.wav")
    results = {}
    for f in sorted(conv_dir.glob("*-conv.wav")):
        m = conv_re.match(f.name)
        if not m:
            continue
        phrase, src, tgt = m.groups()
        orig = conv_dir / f"{phrase}-{src}-X-orig.wav"
        if not orig.exists():
            continue
        f0_conv, f0_orig = pitch(f), pitch(orig)
        vc, vo = f0_conv[f0_conv > 0], f0_orig[f0_orig > 0]
        if vc.size and vo.size:
            ratio = float(np.exp(np.mean(np.log(vc)) - np.mean(np.log(vo))))
            results[f.name] = {"f0_ratio": ratio,
                               "conv_median": float(np.median(vc)),
                               "orig_median": float(np.median(vo))}
    out_json = conv_dir / "f0_ratios.json"
    out_json.write_text(json.dumps(results, indent=1))
    ratios = [r["f0_ratio"] for r in results.values()]
    print(f"{len(ratios)} pairs; ratio mean {np.mean(ratios):.3f} "
          f"median {np.median(ratios):.3f}" if ratios else "no pairs found")

    if a.out and ratios:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(6, 4))
            plt.hist(ratios, bins=30)
            plt.xlabel("achieved F0 ratio (conv/orig)")
            plt.ylabel("count")
            plt.savefig(a.out, dpi=120, bbox_inches="tight")
            print(f"plot: {a.out}")
        except ImportError:
            print("matplotlib unavailable; json written only")


if __name__ == "__main__":
    main()
