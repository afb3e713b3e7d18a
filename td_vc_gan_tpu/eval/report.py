"""HTML evaluation report: audio grids + metric tables.

Compact re-design of test_scripts/common/build_html_parallel.py:595-660 —
per-phrase audio grids (original / conversions per target speaker) and
summary tables of the MCD / speaker-similarity / ASR metrics.
"""

from __future__ import annotations

import html
import json
from pathlib import Path

import numpy as np

_STYLE = """
body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}
td,th{border:1px solid #999;padding:4px 8px;text-align:left}
h2{margin-top:1.5em}audio{width:220px}
"""


def _metric_table(title: str, rows: dict) -> str:
    out = [f"<h2>{html.escape(title)}</h2><table><tr><th>metric</th><th>value</th></tr>"]
    for k, v in rows.items():
        if isinstance(v, float):
            v = f"{v:.4f}"
        out.append(f"<tr><td>{html.escape(str(k))}</td><td>{html.escape(str(v))}</td></tr>")
    out.append("</table>")
    return "".join(out)


def build_report(
    out_path: str | Path,
    conv_dir: str | Path,
    mcd_results: dict | None = None,
    spk_results: dict | None = None,
    asr_results: dict | None = None,
    mos_results: dict | None = None,
    title: str = "TD-VC-GAN-TPU evaluation",
) -> Path:
    conv_dir = Path(conv_dir)
    out_path = Path(out_path)
    parts = [f"<html><head><meta charset='utf-8'><style>{_STYLE}</style>"
             f"<title>{html.escape(title)}</title></head><body><h1>{html.escape(title)}</h1>"]

    if mcd_results:
        vals = [r["mcd"] for r in mcd_results.values() if np.isfinite(r.get("mcd", np.nan))]
        f0errs = [r.get("logf0_mean_err", np.nan) for r in mcd_results.values()]
        parts.append(_metric_table("Mel-cepstral distortion", {
            "MCD mean (dB)": float(np.mean(vals)) if vals else float("nan"),
            "MCD median (dB)": float(np.median(vals)) if vals else float("nan"),
            "log-F0 mean err": float(np.nanmean(f0errs)) if f0errs else float("nan"),
            "n": len(vals),
        }))
    if spk_results:
        parts.append(_metric_table("Speaker similarity", {
            "backend": spk_results.get("backend"),
            "mean cosine similarity": spk_results.get("mean_similarity"),
            "nearest-mean accuracy": spk_results.get("accuracy"),
        }))
    if asr_results:
        parts.append(_metric_table("ASR intelligibility", asr_results))
    if mos_results:
        parts.append(_metric_table("Predicted MOS", {
            k: v for k, v in mos_results.items() if k != "scores"
        }))

    # audio grid grouped by phrase
    groups: dict = {}
    for f in sorted(conv_dir.glob("*.wav")):
        phrase = f.name.split("-")[0]
        groups.setdefault(phrase, []).append(f)
    parts.append("<h2>Audio</h2><table>")
    for phrase, files in sorted(groups.items()):
        cells = "".join(
            f"<td>{html.escape(f.stem)}<br><audio controls src='{f.name}'></audio></td>"
            for f in files
        )
        parts.append(f"<tr><th>{html.escape(phrase)}</th>{cells}</tr>")
    parts.append("</table></body></html>")

    out_path.write_text("".join(parts))
    # machine-readable sidecar
    sidecar = {
        "mcd": {k: {m: v for m, v in r.items()} for k, r in (mcd_results or {}).items()},
        "speaker": {k: v for k, v in (spk_results or {}).items() if k != "items"},
        "asr": asr_results,
        "mos": {k: v for k, v in (mos_results or {}).items() if k != "scores"} or None,
    }
    out_path.with_suffix(".json").write_text(json.dumps(sidecar, default=float, indent=1))
    return out_path
