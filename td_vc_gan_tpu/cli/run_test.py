"""Full evaluation orchestrator (reference: test_scripts/*/run_test.sh).

Chain: generate conversions -> MCD -> speaker similarity -> (optional) ASR ->
HTML + JSON report.
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--save_path", required=True, help="output dir for conversions + report")
    p.add_argument("--load_path", required=True, help="checkpoint dir")
    p.add_argument("--data_path", required=True)
    p.add_argument("--data_file", default="test_files")
    p.add_argument("--config_file", default=None)
    p.add_argument("--epoch", default=None)
    p.add_argument("--data_format", default="vctk")
    p.add_argument("--asr_model", default=None, help="local whisper checkpoint dir")
    p.add_argument("--mosnet_cmd", default=None,
                   help="external MOS predictor command with {dir} placeholder")
    p.add_argument("--crepe_weights", default=None)
    p.add_argument("--skip_generate", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    from td_vc_gan_tpu.cli import generate_with_target as gwt
    from td_vc_gan_tpu.data.audio_io import read_audio
    from td_vc_gan_tpu.eval import asr as asr_mod
    from td_vc_gan_tpu.eval import mcd as mcd_mod
    from td_vc_gan_tpu.eval import report as report_mod
    from td_vc_gan_tpu.eval import speaker_rec

    a = parse_args(argv)
    save = Path(a.save_path)

    if not a.skip_generate:
        gwt.generate_signals(a.save_path, a.data_path, a.load_path, a.config_file,
                             a.data_file, a.epoch, a.data_format, a.crepe_weights)

    conv_re = re.compile(r"(.+)-(.+)-(.+)-conv\.wav")
    orig_re = re.compile(r"(.+)-(.+)-X-orig\.wav")

    origs = {}
    for f in save.glob("*-X-orig.wav"):
        m = orig_re.match(f.name)
        if m:
            origs[(m.group(1), m.group(2))] = f

    def parse_conv(name):
        m = conv_re.match(name)
        return (m.group(1), m.group(2), m.group(3)) if m else None

    def ref_lookup(phrase, tgt):
        # any original utterance by the target speaker (different phrase ok —
        # DTW + voiced-only as in the reference's conv-vs-target comparisons)
        for (ph, spk), f in origs.items():
            if spk == tgt:
                return f
        return None

    print("Computing MCD ...")
    mcd_results = mcd_mod.evaluate_directory(save, parse_conv, ref_lookup)

    print("Computing speaker similarity ...")
    conv_items, tgt_items = [], []
    for f in save.glob("*-conv.wav"):
        parsed = parse_conv(f.name)
        if parsed:
            wav, _ = read_audio(f, 16000)
            conv_items.append((wav, parsed[2]))
    for (ph, spk), f in origs.items():
        wav, _ = read_audio(f, 16000)
        tgt_items.append((wav, spk))
    spk_results = speaker_rec.evaluate(conv_items, tgt_items) if tgt_items else None

    asr_results = None
    if a.asr_model:
        print("Computing ASR metrics ...")
        pairs = []
        for f in save.glob("*-conv.wav"):
            parsed = parse_conv(f.name)
            if parsed and (parsed[0], parsed[1]) in origs:
                conv, _ = read_audio(f, 16000)
                orig, _ = read_audio(origs[(parsed[0], parsed[1])], 16000)
                pairs.append((conv, orig))
        asr_results = asr_mod.evaluate(pairs, a.asr_model)

    mos_results = None
    if a.mosnet_cmd:
        from td_vc_gan_tpu.eval import mosnet

        print("Computing MOS ...")
        mos_results = mosnet.predict_mos(save, a.mosnet_cmd)
        print(f"MOS: {mos_results.get('mean_mos')}")

    out = report_mod.build_report(save / "index.html", save, mcd_results,
                                  spk_results, asr_results, mos_results)
    print(f"Report: {out}")
    if mcd_results:
        vals = [r["mcd"] for r in mcd_results.values() if np.isfinite(r.get("mcd", np.nan))]
        if vals:
            print(f"MCD mean: {np.mean(vals):.3f} dB over {len(vals)} conversions")


if __name__ == "__main__":
    main()
