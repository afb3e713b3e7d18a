"""200-step on-TPU convergence smoke at the benched batch size.

The bench's headline number must be a *training configuration*, not a
benchmark special: this script runs the exact bench-built step (same config,
dtype, batch, remat flag — bench.build) for 200 optimizer steps on synthetic
voiced data and asserts the G total and reconstruction losses descend.

Usage:  python tools/smoke_convergence.py [batch] [steps] [config_yaml]
Writes one JSON line with the loss trajectory to stdout.
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def synth_batch(batch: int, seg: int, num_spk: int, rng: np.random.Generator):
    """Voiced-ish synthetic corpus: per-speaker F0 + formant-ish harmonics.

    Deterministic per (speaker, draw) so the task is learnable — the model
    can associate speaker labels with spectral envelopes, and the rec loss
    has consistent structure to descend on.
    """
    t = np.arange(seg) / 16000.0
    labels = rng.integers(0, num_spk, batch)
    sigs = np.zeros((batch, seg), np.float32)
    for i, lab in enumerate(labels):
        f0 = 110.0 * 2 ** ((lab % 24) / 12.0)
        phase = rng.uniform(0, 2 * np.pi)
        sig = np.zeros(seg)
        for h, amp in ((1, 1.0), (2, 0.5), (3, 0.33), (4, 0.2)):
            sig += amp * np.sin(2 * np.pi * f0 * h * t + phase * h)
        sig *= 0.2 / max(1e-6, np.abs(sig).max())
        sigs[i] = sig
    corrupted = sigs + 0.02 * rng.standard_normal((batch, seg)).astype(np.float32)
    return sigs, corrupted, labels.astype(np.int32)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    config = sys.argv[3] if len(sys.argv) > 3 else \
        "/root/reference/config/wavlm-stage2_2.yaml"

    import jax
    import jax.numpy as jnp

    import bench

    cfg, G, state, step = bench.build(config, "bfloat16", batch, remat=False)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(42)
    traj = []
    for i in range(steps):
        sigs, corr, labels = synth_batch(batch, bench.SEG, bench.NUM_SPK, rng)
        data = {
            "signal": jnp.asarray(sigs),
            "corrupted": jnp.asarray(corr),
            "label": jnp.asarray(labels),
        }
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k)
        if i % 25 == 0 or i == steps - 1:
            # real device->host fetch (block_until_ready lies on axon)
            snap = {m: round(float(metrics[m]), 3)
                    for m in ("G_loss", "G_loss_rec", "D_loss")
                    if m in metrics}
            snap["step"] = i
            traj.append(snap)
            print(json.dumps(snap), flush=True)

    first = traj[0]
    # Threshold calibrated on the measured b64 trajectories (wavlm: G
    # 210.7->129.9 = 0.62x, rec 14.2->10.5 = 0.74x; conv_enc: G 0.68x, rec
    # 0.79-0.81x over 200 steps): the harmonic corpus is easy, so rec
    # starts low and descends slowly; 0.8x still rejects a flat or
    # diverging run. The endpoint is the min of the last three snapshots —
    # a single GAN step's loss is noisy and the gate tests descent, not
    # one sample.
    g_last = min(s["G_loss"] for s in traj[-3:])
    rec_last = min(s["G_loss_rec"] for s in traj[-3:])
    ok = (g_last < 0.8 * first["G_loss"]
          and rec_last < 0.8 * first["G_loss_rec"]
          and all(np.isfinite(list(s.values())).all() for s in traj))
    print(json.dumps({
        "batch": batch, "steps": steps, "converged": bool(ok),
        "G_loss_first": first["G_loss"], "G_loss_last": g_last,
        "rec_first": first["G_loss_rec"], "rec_last": rec_last,
    }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
