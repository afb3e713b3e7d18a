"""Honest A/B of the fused FiLM cond-chain kernel vs the XLA formulation.

Times fwd+bwd (value_and_grad of a sum) on real-TPU flagship shapes with a
device->host fetch inside the timed region (block_until_ready lies on this
runtime).  Usage:  python tools/bench_cond_chain.py [batch]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from td_vc_gan_tpu.ops.pallas import cond_chain


def xla_chain(c, w0, b0, w1, b1, n):
    cc = c.shape[2]
    two_c = w1.shape[2] // n
    h = jax.lax.conv_general_dilated(
        c, w0, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")) + b0
    a = jnp.where(h >= 0, h, 0.2 * h)
    outs = []
    for i in range(n):
        gb = jax.lax.conv_general_dilated(
            a[..., i * cc:(i + 1) * cc], w1[..., i * two_c:(i + 1) * two_c],
            (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b1[i * two_c:(i + 1) * two_c]
        outs.append(gb)
    return jnp.stack(outs, axis=0)


def xla_split_chain(exc, spk, w0, b0, w1, b1, n, ckpt=True):
    """The PRODUCTION formulation (layers.py _split_film, TDVC_SPLIT_COND
    default): spk half of cond_0 collapses to one matmul + edge fixes, the
    wide activation is jax.checkpoint'ed. This is the real bar any fused
    kernel must beat — the concat xla_chain above costs ~17x more cond_0
    FLOPs and is only kept as the historical A/B baseline."""
    cc = spk.shape[-1] + exc.shape[-1]
    two_c = w1.shape[2] // n
    s = spk.shape[-1]
    w0_spk, w0_exc = w0[:, :s, :], w0[:, s:, :]
    spk_all = spk @ (w0_spk[0] + w0_spk[1] + w0_spk[2]) + b0
    edge0 = spk @ w0_spk[0]
    edge_t = spk @ w0_spk[2]

    def chain(exc, spk_all, edge0, edge_t, w0_exc, w1, b1):
        h = jax.lax.conv_general_dilated(
            exc, w0_exc, (1,), [(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC")) + spk_all[:, None, :]
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, h.shape[1], 1), 1)
        h = h - jnp.where(t_idx == 0, edge0[:, None, :], 0)
        h = h - jnp.where(t_idx == h.shape[1] - 1, edge_t[:, None, :], 0)
        a = jnp.where(h >= 0, h, 0.2 * h)
        outs = []
        for i in range(n):
            gb = jax.lax.conv_general_dilated(
                a[..., i * cc:(i + 1) * cc], w1[..., i * two_c:(i + 1) * two_c],
                (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
            ) + b1[i * two_c:(i + 1) * two_c]
            outs.append(gb)
        return jnp.stack(outs, axis=0)

    if ckpt:
        chain = jax.checkpoint(
            chain, policy=jax.checkpoint_policies.nothing_saveable)
    return chain(exc, spk_all, edge0, edge_t, w0_exc, w1, b1)


def split_baseline(batch=128, iters=20):
    """Time the production split chain (fwd+bwd) at the real stage shapes —
    the bar for any fused-kernel attempt."""
    n, s, e = 9, 128, 8
    cc = s + e
    rng = np.random.default_rng(0)
    for t, c_ch in ((8960, 16), (4480, 32), (2240, 64)):
        two_c = 2 * c_ch
        dt = jnp.bfloat16
        exc = jnp.asarray(rng.standard_normal((batch, t, e)), dt) * 0.3
        spk = jnp.asarray(rng.standard_normal((batch, s)), dt) * 0.3
        w0 = jnp.asarray(rng.standard_normal((3, cc, n * cc)), dt) * 0.05
        b0 = jnp.asarray(rng.standard_normal((n * cc,)), dt)
        w1 = jnp.asarray(rng.standard_normal((3, cc, n * two_c)), dt) * 0.05
        b1 = jnp.asarray(rng.standard_normal((n * two_c,)), dt)

        def loss(exc, spk, w0, b0, w1, b1):
            o = xla_split_chain(exc, spk, w0, b0, w1, b1, n)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
        args = (exc, spk, w0, b0, w1, b1)
        tb = timed(f, args, iters)
        f_fwd = jax.jit(lambda *a: jnp.sum(
            xla_split_chain(*a, n).astype(jnp.float32)))
        v = f_fwd(*args)
        float(v)
        t0 = time.perf_counter()
        for _ in range(iters):
            v = f_fwd(*args)
        float(v)
        tf = (time.perf_counter() - t0) / iters
        print(f"T={t} C={c_ch}: split-xla fwd+bwd {tb*1e3:7.2f} ms  "
              f"fwd-only {tf*1e3:7.2f} ms", flush=True)


def timed(fn, args, iters=20):
    v, g = fn(*args)
    float(jnp.sum(g[0].astype(jnp.float32)))  # drain queue
    t0 = time.perf_counter()
    for _ in range(iters):
        v, g = fn(*args)
    float(jnp.sum(g[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n, cc = 9, 136
    rng = np.random.default_rng(0)

    for t, c_ch in ((8960, 16), (4480, 32), (2240, 64)):
        two_c = 2 * c_ch
        dt = jnp.bfloat16
        c = jnp.asarray(rng.standard_normal((batch, t, cc)), dt) * 0.3
        w0 = jnp.asarray(rng.standard_normal((3, cc, n * cc)), dt) * 0.05
        b0 = jnp.asarray(rng.standard_normal((n * cc,)), dt)
        w1 = jnp.asarray(rng.standard_normal((3, cc, n * two_c)), dt) * 0.05
        b1 = jnp.asarray(rng.standard_normal((n * two_c,)), dt)

        def loss_fused(c, w0, b0, w1, b1):
            o = cond_chain.film_cond_chain(c, w0, b0, w1, b1)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_xla(c, w0, b0, w1, b1):
            o = xla_chain(c, w0, b0, w1, b1, n)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        f_fused = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4)))
        f_xla = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3, 4)))
        args = (c, w0, b0, w1, b1)

        # numerics cross-check on-device (bf16 tolerance)
        vf, gf = f_fused(*args)
        vx, gx = f_xla(*args)
        rel = abs(float(vf) - float(vx)) / max(abs(float(vx)), 1e-9)
        gerr = float(jnp.max(jnp.abs(gf[0].astype(jnp.float32)
                                     - gx[0].astype(jnp.float32))))

        tf = timed(f_fused, args)
        tx = timed(f_xla, args)
        print(f"T={t} C={c_ch}: fused {tf*1e3:7.2f} ms  xla {tx*1e3:7.2f} ms  "
              f"speedup {tx/tf:5.2f}x  |  loss rel err {rel:.2e}  "
              f"max dc err {gerr:.2e}", flush=True)


if __name__ == "__main__":
    main()


def fwd_only(batch=128):
    """Forward-only timing to localize fused-vs-XLA gap."""
    n, cc = 9, 136
    rng = np.random.default_rng(0)
    for t, c_ch in ((8960, 16), (4480, 32)):
        two_c = 2 * c_ch
        dt = jnp.bfloat16
        c = jnp.asarray(rng.standard_normal((batch, t, cc)), dt) * 0.3
        w0 = jnp.asarray(rng.standard_normal((3, cc, n * cc)), dt) * 0.05
        b0 = jnp.asarray(rng.standard_normal((n * cc,)), dt)
        w1 = jnp.asarray(rng.standard_normal((3, cc, n * two_c)), dt) * 0.05
        b1 = jnp.asarray(rng.standard_normal((n * two_c,)), dt)
        f_fused = jax.jit(lambda *a: jnp.sum(
            cond_chain.film_cond_chain(*a).astype(jnp.float32)))
        f_xla = jax.jit(lambda *a: jnp.sum(
            xla_chain(*a, n).astype(jnp.float32)))
        args = (c, w0, b0, w1, b1)

        def tm(fn):
            float(fn(*args))
            t0 = time.perf_counter()
            for _ in range(20):
                v = fn(*args)
            float(v)
            return (time.perf_counter() - t0) / 20

        print(f"T={t} C={c_ch} FWD-ONLY: fused {tm(f_fused)*1e3:7.2f} ms  "
              f"xla {tm(f_xla)*1e3:7.2f} ms", flush=True)
