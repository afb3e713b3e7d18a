"""Train state: three parameter trees + optimizers in one pytree.

The reference keeps G/D/C as separate torch modules with three optimizers
(train.py:188-193). Here the whole thing is a single pytree so one jitted
step updates everything without host round-trips; optimizer state IS part of
the checkpoint (the reference drops Adam moments on every resume —
SURVEY.md §5.4 — which we fix).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from td_vc_gan_tpu.config import Config


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params_g: Any
    params_d: Any
    params_c: Any | None
    opt_g: Any
    opt_d: Any
    opt_c: Any | None
    crepe_params: Any | None  # frozen CREPE weights (no optimizer)


def _trainable_mask(params, frozen_prefixes: tuple[str, ...]):
    """Pytree mask: False for params under any frozen top-level path prefix.

    Paths are '/'-joined module names, e.g. 'encoder/wavlm/...'. Used to
    freeze the WavLM backbone and config-frozen subnets
    (hp.train.freeze_subnets, train.py:195-197).
    """
    flat = flax.traverse_util.flatten_dict(params)
    mask = {
        k: not any("/".join(map(str, k)).startswith(p) for p in frozen_prefixes)
        for k in flat
    }
    return flax.traverse_util.unflatten_dict(mask)


def make_optimizers(cfg: Config, params_g, params_d, params_c=None):
    """AdamW(lr, betas, wd=0.01) for G/D, Adam for C — torch-default parity
    (train.py:188-193). Optional global-norm clipping mirrors
    clip_grad_norm_ (train.py:289-290,489-490)."""
    b1, b2 = cfg.train.adam_beta

    frozen: list[str] = ["params/encoder/wavlm"]
    for sub in cfg.train.freeze_subnets or []:
        frozen.append(f"params/{sub}")

    def with_clip(opt, max_norm):
        if max_norm is None:
            return opt
        return optax.chain(optax.clip_by_global_norm(max_norm), opt)

    g_opt = with_clip(
        optax.adamw(cfg.train.lr_g, b1=b1, b2=b2, weight_decay=0.01),
        cfg.train.grad_max_norm_G,
    )
    g_opt = optax.masked(g_opt, _trainable_mask(params_g, tuple(frozen)))
    d_opt = with_clip(
        optax.adamw(cfg.train.lr_d, b1=b1, b2=b2, weight_decay=0.01),
        cfg.train.grad_max_norm_D,
    )
    c_opt = optax.adam(cfg.train.lr_d, b1=b1, b2=b2) if params_c is not None else None
    return g_opt, d_opt, c_opt


def create_train_state(cfg: Config, params_g, params_d, params_c=None, crepe_params=None):
    import jax.numpy as jnp

    g_opt, d_opt, c_opt = make_optimizers(cfg, params_g, params_d, params_c)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params_g=params_g,
            params_d=params_d,
            params_c=params_c,
            opt_g=jax.jit(g_opt.init)(params_g),
            opt_d=jax.jit(d_opt.init)(params_d),
            opt_c=jax.jit(c_opt.init)(params_c) if c_opt is not None else None,
            crepe_params=crepe_params,
        ),
        (g_opt, d_opt, c_opt),
    )
