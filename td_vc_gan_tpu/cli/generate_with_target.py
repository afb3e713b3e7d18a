"""Many-to-many conversion over a test manifest — every utterance × every
in-dataset target speaker, with target F0 statistics taken from an actual
target-speaker utterance (reference: generate_with_target.py:54-184).

Outputs ``{phrase}-{src}-{tgt}-conv.wav``, ``{phrase}-{src}-X-orig.wav`` and
``conv_log.txt`` in ``--save_path``.
"""

from __future__ import annotations

import argparse
import itertools
import os
import re
from pathlib import Path

import numpy as np

from td_vc_gan_tpu.config import load_config
from td_vc_gan_tpu.data.audio_io import write_audio
from td_vc_gan_tpu.data.dataset import WaveDataset
from td_vc_gan_tpu.inference import Converter
from td_vc_gan_tpu.models import crepe as crepe_mod
from td_vc_gan_tpu.models.generator import generator_from_config
from td_vc_gan_tpu.training import checkpoint as ckpt


def parse_fn(filename: str, dataset_format: str) -> str:
    """Phrase-id extraction per dataset (generate_with_target.py:41-51)."""
    base = os.path.basename(filename)
    if dataset_format == "vctk":
        return re.match(r"(\S+)_(\d+).wav", base).group(2)
    if dataset_format == "alcaim":
        return re.match(r"(\S+)-(\d+).wav", base).group(2)
    if dataset_format == "smt":
        return re.match(r"list(\S+).wav", base).group(1)
    return os.path.splitext(base)[0]


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--save_path", required=True)
    p.add_argument("--load_path", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--data_file", default="test_files")
    p.add_argument("--config_file", default=None)
    p.add_argument("--epoch", default=None)
    p.add_argument("--data_format", default="vctk")
    p.add_argument("--crepe_weights", default=None)
    return p.parse_args(argv)


def load_generator(cfg, load_path: Path, epoch, num_spk: int):
    """Build G and load params from orbax or reference torch checkpoints."""
    import jax
    import jax.numpy as jnp

    G = generator_from_config(cfg.model.generator, num_spk)
    seg = cfg.model.generator.total_ratio * 4
    pg = G.init(
        jax.random.PRNGKey(0), jnp.zeros((1, seg, 1)),
        jax.nn.one_hot(jnp.zeros((1,), jnp.int32), num_spk), None,
        jnp.zeros((1, seg, 1)),
    )
    g_file = load_path / (f"step{epoch}-G.pt" if epoch is not None else "latest-G.pt")
    if g_file.exists():
        pg, msg = ckpt.import_torch_generator(cfg, g_file, pg)
        print(f"Loaded {g_file} ({len(msg['matched'])} tensors)")
    else:
        oe = ckpt.latest_epoch(load_path)
        if oe is not None:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                restored = ckptr.restore(
                    (load_path / "orbax" / f"epoch_{oe}").resolve(),
                )
            pg = restored["params_g"]
            print(f"Loaded orbax epoch {oe}")
        else:
            print(f"WARNING: no checkpoint at {load_path}; using random init")
    return G, pg


def generate_signals(save_path, data_path, load_path, config_file=None,
                     data_file="test_files", epoch=None, dataset_format="vctk",
                     crepe_weights=None):
    save_path, data_path, load_path = Path(save_path), Path(data_path), Path(load_path)
    cfg = load_config(config_file if config_file else load_path / "config.yaml")
    save_path.mkdir(parents=True, exist_ok=True)

    test_ds = WaveDataset(
        data_path / data_file, data_path / "speakers",
        sample_rate=cfg.model.sample_rate, add_new_spks=True,
        normalization_db=cfg.train.normalization_db,
    )

    # speakers actually present in the manifest (generate_with_target.py:80-83)
    ds_spks = sorted({test_ds.spk_dict[label] for _, label in test_ds.entries})

    # per-speaker utterance cycles for target F0 statistics (:89-100,143-148)
    by_spk = {
        spk: [i for i, (_, label) in enumerate(test_ds.entries)
              if test_ds.spk_dict[label] == spk]
        for spk in ds_spks
    }
    spk_iters = {
        spk: itertools.cycle(np.random.default_rng(spk).permutation(idxs).tolist())
        for spk, idxs in by_spk.items()
    }

    G, pg = load_generator(cfg, load_path, epoch, test_ds.num_spk)
    if crepe_weights:
        from td_vc_gan_tpu.training.torch_import import load_torchcrepe

        crepe_params = load_torchcrepe(crepe_weights)
    else:
        import jax

        crepe_params = crepe_mod.init_crepe(jax.random.PRNGKey(0))
    conv = Converter(cfg, G, pg, crepe_params, decoder="viterbi")

    conv_log = []
    for i in range(len(test_ds)):
        item = test_ds.__getitem__(i)
        signal = item["signal"]
        label_src = int(item["label"])
        file_name = test_ds.get_filename(i)
        spk_src = test_ds.spk_reverse_dict[label_src]
        phrase_id = parse_fn(file_name, dataset_format)

        f0_src, mu_src = conv.pitch(signal)

        # gather per-target pitch statistics, then convert the whole target
        # grid for this utterance in ONE batched device call (the dispatch
        # latency of per-target calls dominates on networked TPU runtimes)
        mu_tgts, tgt_files = [], []
        for tgt in ds_spks:
            tgt_idx = next(spk_iters[tgt])
            tgt_item = test_ds.__getitem__(tgt_idx)
            _, mu_tgt = conv.pitch(tgt_item["signal"])
            mu_tgts.append(mu_tgt[0])
            tgt_files.append(test_ds.get_filename(tgt_idx))

        padded, n = conv.pad_to_bucket(signal)
        b = len(ds_spks)
        wavs = conv.convert_batch(
            np.repeat(padded[None], b, axis=0),
            np.asarray(ds_spks, dtype=np.int32),
            np.repeat(f0_src, b, axis=0),
            np.repeat(mu_src, b, axis=0),
            np.stack(mu_tgts),
            seed=i,
        )[:, :n]

        for j, tgt in enumerate(ds_spks):
            spk_tgt = test_ds.spk_reverse_dict[tgt]
            name = f"{phrase_id}-{spk_src}-{spk_tgt}-conv"
            write_audio(save_path / f"{name}.wav", wavs[j], cfg.model.sample_rate)
            conv_log.append(f"{name}|{file_name}|{tgt_files[j]}")

        write_audio(save_path / f"{phrase_id}-{spk_src}-X-orig.wav", signal,
                    cfg.model.sample_rate)
    (save_path / "conv_log.txt").write_text("\n".join(conv_log) + "\n")


def main(argv=None):
    a = parse_args(argv)
    generate_signals(a.save_path, a.data_path, a.load_path, a.config_file,
                     a.data_file, a.epoch, a.data_format, a.crepe_weights)


if __name__ == "__main__":
    main()
