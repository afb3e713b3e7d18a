"""Checkpointing: Orbax for native state, torch ``step{E}-*.pt`` interop.

The reference writes ``step{E}-{G,D,C}.pt`` + ``latest-*`` aliases every
``save_interval`` epochs and drops optimizer state entirely (train.py:596-608;
SURVEY.md §5.4). Here the full TrainState (params + Adam moments + step) is
checkpointed with Orbax, and reference-format torch files are exported
alongside for drop-in compatibility with the reference's generate/eval
tooling. Restore accepts either format, with ``load_possible``-style
permissive partial loading for cross-stage transfer (util/__init__.py:64-89).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from td_vc_gan_tpu.training import torch_interop as ti
from td_vc_gan_tpu.training.state import TrainState


def save_orbax(state: TrainState, path: str | Path, epoch: int) -> None:
    path = Path(path).resolve() / "orbax"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / f"epoch_{epoch}", jax.tree.map(np.asarray, state), force=True)


def restore_orbax(template: TrainState, path: str | Path, epoch: int | None = None) -> TrainState:
    path = Path(path).resolve() / "orbax"
    if epoch is None:
        epochs = sorted(int(p.name.split("_")[1]) for p in path.glob("epoch_*"))
        if not epochs:
            raise FileNotFoundError(f"no orbax checkpoints under {path}")
        epoch = epochs[-1]
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path / f"epoch_{epoch}", template)


def latest_epoch(path: str | Path) -> int | None:
    p = Path(path) / "orbax"
    epochs = sorted(int(q.name.split("_")[1]) for q in p.glob("epoch_*")) if p.exists() else []
    return epochs[-1] if epochs else None


# ---------------------------------------------------------------------------
# torch-format export/import (reference step{E}-G.pt naming, train.py:596-608)
# ---------------------------------------------------------------------------


def export_torch(state: TrainState, cfg, save_path: str | Path, epoch: int,
                 with_latest: bool = True) -> None:
    save_path = Path(save_path)
    gen_entries = ti.generator_entries_from_config(cfg.model.generator)
    d_cfg = cfg.model.discriminator
    disc_entries = ti.discriminator_entries(d_cfg.num_disc, d_cfg.num_layers)

    sd_g = ti.flax_to_torch(state.params_g, gen_entries)
    sd_d = ti.flax_to_torch(state.params_d, disc_entries)
    ti.save_torch_file(sd_g, save_path / f"step{epoch}-G.pt")
    ti.save_torch_file(sd_d, save_path / f"step{epoch}-D.pt")
    if with_latest:
        ti.save_torch_file(sd_g, save_path / "latest-G.pt")
        ti.save_torch_file(sd_d, save_path / "latest-D.pt")
    if state.params_c is not None:
        sd_c = ti.flax_to_torch(state.params_c, ti.latent_classifier_entries())
        ti.save_torch_file(sd_c, save_path / f"step{epoch}-C.pt")
        if with_latest:
            ti.save_torch_file(sd_c, save_path / "latest-C.pt")
    (save_path / "latest_epoch").write_text(str(epoch))


def load_possible(params: Any, new_params: Any) -> tuple[Any, dict]:
    """Permissive partial load (util/__init__.py:64-89): copy matching leaves;
    min-shape-slice mismatched ones; report categories."""
    import flax.traverse_util as tu

    flat_old = tu.flatten_dict(params)
    flat_new = tu.flatten_dict(new_params)
    messages = {"matched": [], "mismatched_size": [], "unmatched_keys": [], "missing_keys": []}
    out = dict(flat_old)
    for k, v in flat_new.items():
        name = "/".join(map(str, k))
        if k not in flat_old:
            messages["unmatched_keys"].append(name)
            continue
        old = np.asarray(flat_old[k])
        new = np.asarray(v)
        if old.shape == new.shape:
            out[k] = new
            messages["matched"].append(name)
        else:
            sl = tuple(slice(0, min(o, n)) for o, n in zip(old.shape, new.shape))
            merged = old.copy()
            merged[sl] = new[sl]
            out[k] = merged
            messages["mismatched_size"].append(name)
    for k in flat_old:
        if k not in flat_new:
            messages["missing_keys"].append("/".join(map(str, k)))
    return tu.unflatten_dict(out), messages


def import_torch_generator(cfg, path: str | Path, template_params=None):
    """Load a reference ``*-G.pt`` into a flax param tree; if a template is
    given, merge permissively (cross-stage resume semantics)."""
    sd = ti.load_torch_file(path)
    params = ti.torch_to_flax(sd, ti.generator_entries_from_config(cfg.model.generator))
    if template_params is not None:
        params, messages = load_possible(template_params, params)
        return params, messages
    return params, {"matched": ["<all>"]}


def import_torch_discriminator(cfg, path: str | Path, template_params=None):
    d_cfg = cfg.model.discriminator
    sd = ti.load_torch_file(path)
    params = ti.torch_to_flax(sd, ti.discriminator_entries(d_cfg.num_disc, d_cfg.num_layers))
    if template_params is not None:
        return load_possible(template_params, params)
    return params, {"matched": ["<all>"]}


def import_torch_classifier(path: str | Path, template_params=None):
    sd = ti.load_torch_file(path)
    params = ti.torch_to_flax(sd, ti.latent_classifier_entries())
    if template_params is not None:
        return load_possible(template_params, params)
    return params, {"matched": ["<all>"]}
