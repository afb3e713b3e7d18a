"""Training CLI — argument surface matches the reference (train.py:48-56).

Usage:
    python -m td_vc_gan_tpu.cli.train --save_path runs/exp --data_path data/vctk \
        --config_file config/conv_enc-stage1.yaml [--load_path ...] [--epoch N]
"""

from __future__ import annotations

import argparse

from td_vc_gan_tpu.config import load_config
from td_vc_gan_tpu.training.loop import train


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--load_path", default=None)
    parser.add_argument("--config_file", default=None)
    parser.add_argument("--epoch", default=None)
    # TPU-native extras (absent in the reference)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after N optimizer steps (smoke tests)")
    parser.add_argument("--crepe_weights", default=None,
                        help="torchcrepe .pth to import for the pitch net")
    parser.add_argument("--precorrupted_index", default=None,
                        help="precorrupt_index.pkl from cli/precorrupt_dataset"
                             " — serve stored corruption variants instead of"
                             " corrupting on the fly (host-bound pipelines)")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of steps 10-15 here")
    parser.add_argument("--wavlm_checkpoint", default=None,
                        help="Microsoft WavLM-Large.pt for the SSL encoder")
    parser.add_argument("--override", action="append", default=[],
                        help="dotted config override, e.g. train.batch_size=4")
    # multi-host pod launch (one process per host; SURVEY §2.10): every
    # process runs this same CLI with its own --process_id
    parser.add_argument("--coordinator_address", default=None,
                        help="host:port of process 0 for jax.distributed")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="total processes in the pod (enables DCN init)")
    parser.add_argument("--process_id", type=int, default=None,
                        help="this host's process index (0-based)")
    args = parser.parse_args(argv)
    if args.num_processes and args.num_processes > 1 and (
            args.coordinator_address is None or args.process_id is None):
        parser.error("--num_processes > 1 requires --coordinator_address "
                     "and --process_id (jax.distributed would otherwise "
                     "fall back to cluster auto-detection)")
    return args


def _parse_overrides(pairs: list[str]) -> dict:
    import yaml

    out: dict = {}
    for pair in pairs:
        key, _, value = pair.partition("=")
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(value)
    return out


def main(argv=None):
    args = parse_args(argv)
    if args.num_processes and args.num_processes > 1:
        # must run before any jax device use on this host
        from td_vc_gan_tpu import parallel

        parallel.initialize_multihost(
            args.coordinator_address, args.num_processes, args.process_id)
    cfg = load_config(args.config_file, _parse_overrides(args.override))
    train(
        cfg,
        save_path=args.save_path,
        data_path=args.data_path,
        load_path=args.load_path,
        epoch=args.epoch,
        config_file=args.config_file,
        max_steps=args.max_steps,
        crepe_weights=args.crepe_weights,
        wavlm_checkpoint=args.wavlm_checkpoint,
        profile_dir=args.profile_dir,
        precorrupted_index=args.precorrupted_index,
    )


if __name__ == "__main__":
    main()
