"""Training-time estimation from checkpoint mtimes with z-score outlier
rejection (reference: test_scripts/get_model_info.py:18-38)."""

from __future__ import annotations

import argparse
import datetime
import os
import re
from pathlib import Path

import numpy as np


def estimate_train_time(ckpt_dir: str | Path, z_thresh: float = 2.0) -> dict:
    ckpt_dir = Path(ckpt_dir)
    steps = []
    for f in ckpt_dir.glob("step*-G.pt"):
        m = re.match(r"step(\d+)-G\.pt", f.name)
        if m:
            steps.append((int(m.group(1)), os.path.getmtime(f)))
    for d in (ckpt_dir / "orbax").glob("epoch_*") if (ckpt_dir / "orbax").exists() else []:
        steps.append((int(d.name.split("_")[1]), os.path.getmtime(d)))
    steps.sort()
    if len(steps) < 2:
        return {"checkpoints": len(steps), "estimated_hours": None}

    epochs = np.array([s for s, _ in steps], dtype=float)
    times = np.array([t for _, t in steps])
    rates = np.diff(times) / np.maximum(np.diff(epochs), 1e-9)  # s/epoch
    if len(rates) > 2:
        z = (rates - rates.mean()) / (rates.std() + 1e-9)
        rates = rates[np.abs(z) < z_thresh]
    per_epoch = float(np.mean(rates)) if len(rates) else float("nan")
    total = per_epoch * (epochs[-1] - epochs[0])
    return {
        "checkpoints": len(steps),
        "epoch_range": (int(epochs[0]), int(epochs[-1])),
        "seconds_per_epoch": per_epoch,
        "estimated_hours": total / 3600.0,
        "last_checkpoint": datetime.datetime.fromtimestamp(times[-1]).isoformat(),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir")
    args = p.parse_args(argv)
    info = estimate_train_time(args.ckpt_dir)
    for k, v in info.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
