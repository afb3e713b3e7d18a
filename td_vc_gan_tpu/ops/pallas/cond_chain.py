"""Fused FiLM conditioning chain as a Pallas TPU kernel.

Every FiLM block in an MRF stage conditions on the SAME per-stage tensor
``c`` (B, T, Cc) through a private 2-layer conv net (reference
model/generator.py:96-105: ``cond_0`` k=3 -> leaky_relu -> ``cond_1`` k=3 ->
(gamma, beta)).  The stage-batched XLA formulation (models/layers.py
``MRFBlock._batched_film``) runs cond_0 as ONE wide conv, which is fast but
materializes the (B, T, n*Cc) intermediate ``h`` in HBM — at batch 64 the
round-3 profile shows ~36 GB/step of traffic on that one tensor family
(layers.py:607), ~11 GB more on the per-block cond_1 convs, and the step
runs at ~90% of v5e HBM bandwidth: bytes ARE the step time.

This kernel keeps ``h`` entirely in VMEM:

- forward: DMA a (T_tile + 16)-row window of the zero-padded ``c``, compute
  ``h`` for the tile as k shifted (T, Cc) @ (Cc, n*Cc) MXU matmuls, mask the
  rows that fall outside [0, T) (zero-'same'-padding semantics of the second
  conv's input), apply leaky_relu, then per-block (Cc -> 2C) matmuls produce
  the (gamma, beta) pairs.  HBM traffic: read ``c`` once, write the films
  once — h never leaves the chip.
- backward (custom_vjp): recompute ``h``'s activation in-kernel from ``c``
  (no stored residual but the inputs), accumulate dW0/db0/dW1/db1 in f32
  VMEM scratch across the sequential grid, and emit dc tile-by-tile.  The
  leaky_relu mask is derived from the OUTPUT sign (slope > 0 preserves
  sign), so the pre-activation is never needed.

Numerics: matmuls accumulate in f32 (``preferred_element_type``); ``h`` is
rounded to the compute dtype between the two convs exactly where the XLA
path materializes it.  Tests run the interpret path on CPU against the
_reference_impl jnp formulation (tests/test_pallas_cond_chain.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.2
PAD = 8  # zero rows added to each end of T so DMA windows stay x8-aligned


def _lrelu(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _row_mask(t0, t_rows: int, t_total: int, dtype):
    """(t_rows, 1) mask: 1 where the absolute h-row t0-1+r is a real conv
    output in [0, t_total).  Zero-padding 'same' semantics: the second conv
    reads a zero-padded *activation*, not the activation of a padded input."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (t_rows, 1), 0) + (t0 - 1)
    return ((rows >= 0) & (rows < t_total)).astype(dtype)


def _pick_tile(t: int) -> int:
    """Largest time tile dividing t; multiples of 8 (Mosaic sublanes)."""
    for cand in (560, 512, 448, 384, 320, 280, 256, 224, 160, 128, 112, 64, 56, 32, 16, 8):
        if t % cand == 0:
            return cand
    return 0


def supports(t: int, n: int, cc: int, two_c: int) -> bool:
    """Shapes the compiled kernel handles: an x8 time tiling must exist and
    the per-tile VMEM working set (h tile + weights + grad accumulators)
    must stay well under the ~16 MB VMEM budget."""
    tile = _pick_tile(t)
    if tile == 0:
        return False
    ncc = n * cc
    # f32 h tile + bwd accumulators (dW0: 3*cc*ncc, dW1: n*3*cc*two_c)
    vmem = 4 * ((tile + 16) * ncc + 3 * cc * ncc + n * 3 * cc * two_c)
    return vmem < 10 * 1024 * 1024


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(c_hbm, w0_ref, b0_ref, w1_ref, b1_ref, out_ref, cbuf, sem,
                *, t_tile: int, t_total: int, n: int, cc: int, two_c: int,
                cdt):
    b = pl.program_id(0)
    i = pl.program_id(1)
    t0 = i * t_tile

    cp = pltpu.make_async_copy(
        c_hbm.at[b, pl.ds(pl.multiple_of(t0, 8), t_tile + 2 * PAD), :],
        cbuf, sem)
    cp.start()
    cp.wait()

    # h over rows [t0-1, t0+t_tile+1): padded-window coords 6+j+r
    rows = t_tile + 2
    h = b0_ref[0:1, :].astype(jnp.float32)
    for j in range(3):
        h = h + jnp.dot(cbuf[6 + j:6 + j + rows, :], w0_ref[j],
                        preferred_element_type=jnp.float32)
    a = _lrelu(h) * _row_mask(t0, rows, t_total, jnp.float32)
    a = a.astype(cdt)

    for blk in range(n):
        a_blk = a[:, blk * cc:(blk + 1) * cc]
        acc = b1_ref[blk].astype(jnp.float32)
        for j in range(3):
            acc = acc + jnp.dot(a_blk[j:j + t_tile, :], w1_ref[blk, j],
                                preferred_element_type=jnp.float32)
        out_ref[blk, 0] = acc.astype(out_ref.dtype)


def _pallas_fwd(cp, w0, b0, w1r, b1r, *, t_total, t_tile, interpret):
    bsz = cp.shape[0]
    cc = cp.shape[2]
    n = w1r.shape[0]
    two_c = w1r.shape[3]
    cdt = cp.dtype
    grid = (bsz, t_total // t_tile)
    vmem_bytes = 4 * (t_tile + 16) * (n * cc + 2 * cc) * 4 + (8 << 20)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_tile=t_tile, t_total=t_total, n=n,
                          cc=cc, two_c=two_c, cdt=cdt),
        out_shape=jax.ShapeDtypeStruct((n, bsz, t_total, two_c), cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # padded c: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0 (3, cc, n*cc)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0 (1, n*cc)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1r (n, 3, cc, two_c)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1r (n, 1, two_c)
        ],
        out_specs=pl.BlockSpec((n, 1, t_tile, two_c),
                               lambda b, i: (0, b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t_tile + 2 * PAD, cc), cdt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(vmem_bytes)),
        interpret=interpret,
    )(cp, w0, b0, w1r, b1r)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(c_hbm, g_hbm, w0_ref, b0_ref, w0t_ref, w1_ref, w1t_ref,
                dc_ref, dw0_ref, db0_ref, dw1_ref, db1_ref,
                cbuf, gbuf, dw0_acc, db0_acc, dw1_acc, db1_acc, sems,
                *, t_tile: int, t_total: int, n: int, cc: int, two_c: int,
                cdt):
    b = pl.program_id(0)
    i = pl.program_id(1)
    t0 = i * t_tile
    first = jnp.logical_and(b == 0, i == 0)
    last = jnp.logical_and(b == pl.num_programs(0) - 1,
                           i == pl.num_programs(1) - 1)

    start = pl.multiple_of(t0, 8)
    cp_c = pltpu.make_async_copy(
        c_hbm.at[b, pl.ds(start, t_tile + 2 * PAD), :], cbuf, sems.at[0])
    cp_g = pltpu.make_async_copy(
        g_hbm.at[:, b, pl.ds(start, t_tile + 2 * PAD), :], gbuf, sems.at[1])
    cp_c.start()
    cp_g.start()

    @pl.when(first)
    def _():
        dw0_acc[...] = jnp.zeros_like(dw0_acc)
        db0_acc[...] = jnp.zeros_like(db0_acc)
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)

    cp_c.wait()
    cp_g.wait()

    rows = t_tile + 2
    # recompute the masked activation (f32 -> compute dtype, like fwd)
    h = b0_ref[0:1, :].astype(jnp.float32)
    for j in range(3):
        h = h + jnp.dot(cbuf[6 + j:6 + j + rows, :], w0_ref[j],
                        preferred_element_type=jnp.float32)
    mask = _row_mask(t0, rows, t_total, jnp.float32)
    a = _lrelu(h) * mask
    a = a.astype(cdt)

    dc = jnp.zeros((t_tile, cc), jnp.float32)
    dh_all = []
    for blk in range(n):
        g_blk = gbuf[blk]                       # (t_tile + 16, two_c)
        # da rows [t0-1, t0+t_tile+1): g local slice 8-j .. 8-j+rows
        da = jnp.zeros((rows, cc), jnp.float32)
        for j in range(3):
            da = da + jnp.dot(g_blk[8 - j:8 - j + rows, :], w1t_ref[blk, j],
                              preferred_element_type=jnp.float32)
        a_blk = a[:, blk * cc:(blk + 1) * cc]
        # lrelu' from the OUTPUT sign (exact: slope > 0 preserves sign);
        # the row mask kills rows outside [0, T)
        dh = (jnp.where(a_blk >= 0, da, LEAKY_SLOPE * da) * mask).astype(cdt)
        dh_all.append(dh)

        # dc[u] += sum_d dh[u - d + 1] w0_blk_d^T : dh slice starts 2,1,0
        for j in range(3):
            dc = dc + jnp.dot(dh[2 - j:2 - j + t_tile, :], w0t_ref[blk, j],
                              preferred_element_type=jnp.float32)

        # owned rows for weight grads: absolute [t0, t0+t_tile) = local [1, 1+t_tile)
        g_own = g_blk[8:8 + t_tile, :]
        for j in range(3):
            dw1_acc[blk, j] = dw1_acc[blk, j] + jax.lax.dot_general(
                a_blk[j:j + t_tile, :], g_own,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        db1_acc[blk] = db1_acc[blk] + jnp.sum(
            g_own.astype(jnp.float32), axis=0, keepdims=True)

    dc_ref[0] = dc.astype(dc_ref.dtype)

    dh_cat = jnp.concatenate(dh_all, axis=-1)   # (rows, n*cc)
    dh_own = dh_cat[1:1 + t_tile, :]
    for j in range(3):
        dw0_acc[j] = dw0_acc[j] + jax.lax.dot_general(
            cbuf[7 + j:7 + j + t_tile, :], dh_own,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    db0_acc[...] = db0_acc[...] + jnp.sum(
        dh_own.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(last)
    def _():
        dw0_ref[...] = dw0_acc[...].astype(dw0_ref.dtype)
        db0_ref[...] = db0_acc[...].astype(db0_ref.dtype)
        dw1_ref[...] = dw1_acc[...].astype(dw1_ref.dtype)
        db1_ref[...] = db1_acc[...].astype(db1_ref.dtype)


def _pallas_bwd(cp, gp, w0, b0, w0t, w1r, w1t, *, t_total, t_tile, interpret):
    bsz = cp.shape[0]
    cc = cp.shape[2]
    n = w1r.shape[0]
    two_c = w1r.shape[3]
    cdt = cp.dtype
    grid = (bsz, t_total // t_tile)
    vmem_bytes = (
        4 * (t_tile + 16) * (2 * n * cc + n * two_c + 2 * cc)
        + 4 * (3 * cc * n * cc + n * 3 * cc * two_c)
        + (8 << 20)
    )
    zero_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, t_tile=t_tile, t_total=t_total, n=n,
                          cc=cc, two_c=two_c, cdt=cdt),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, t_total, cc), cdt),       # dc
            jax.ShapeDtypeStruct((3, cc, n * cc), jnp.float32),  # dW0
            jax.ShapeDtypeStruct((1, n * cc), jnp.float32),      # db0
            jax.ShapeDtypeStruct((n, 3, cc, two_c), jnp.float32),  # dW1r
            jax.ShapeDtypeStruct((n, 1, two_c), jnp.float32),    # db1r
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # padded c
            pl.BlockSpec(memory_space=pl.ANY),   # padded film cotangent
            zero_spec, zero_spec, zero_spec, zero_spec, zero_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, t_tile, cc), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cc, n * cc), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n * cc), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 3, cc, two_c), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1, two_c), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_tile + 2 * PAD, cc), cdt),          # c window
            pltpu.VMEM((n, t_tile + 2 * PAD, two_c), cdt),    # g window
            pltpu.VMEM((3, cc, n * cc), jnp.float32),         # dW0 acc
            pltpu.VMEM((1, n * cc), jnp.float32),             # db0 acc
            pltpu.VMEM((n, 3, cc, two_c), jnp.float32),       # dW1 acc
            pltpu.VMEM((n, 1, two_c), jnp.float32),           # db1 acc
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(vmem_bytes)),
        interpret=interpret,
    )(cp, gp, w0, b0.reshape(1, -1), w0t, w1r, w1t)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _chain(c, w0, b0, w1r, b1r, interpret):
    cp = jnp.pad(c, ((0, 0), (PAD, PAD), (0, 0)))
    t_tile = _pick_tile(c.shape[1])
    return _pallas_fwd(cp, w0, b0.reshape(1, -1), w1r,
                       b1r.reshape(w1r.shape[0], 1, -1),
                       t_total=c.shape[1], t_tile=t_tile, interpret=interpret)


def _chain_fwd(c, w0, b0, w1r, b1r, interpret):
    out = _chain(c, w0, b0, w1r, b1r, interpret)
    return out, (c, w0, b0, w1r)


def _chain_bwd(interpret, res, g):
    c, w0, b0, w1r = res
    t_total = c.shape[1]
    t_tile = _pick_tile(t_total)
    n, _, cc, two_c = w1r.shape
    cp = jnp.pad(c, ((0, 0), (PAD, PAD), (0, 0)))
    gp = jnp.pad(g.astype(c.dtype), ((0, 0), (0, 0), (PAD, PAD), (0, 0)))
    # per-block transposed weights: w0 block i = w0[:, :, i*cc:(i+1)*cc]
    w0t = jnp.transpose(
        w0.reshape(3, cc, n, cc), (2, 0, 3, 1))          # (n, 3, cc_out, cc_in)
    w1t = jnp.transpose(w1r, (0, 1, 3, 2))               # (n, 3, two_c, cc)
    dc, dw0, db0, dw1, db1 = _pallas_bwd(
        cp, gp, w0, b0, w0t, w1r, w1t,
        t_total=t_total, t_tile=t_tile, interpret=interpret)
    return (dc.astype(c.dtype), dw0.astype(w0.dtype),
            db0.reshape(-1).astype(w0.dtype),
            dw1.astype(w1r.dtype), db1.reshape(n, two_c).astype(w1r.dtype))


_chain.defvjp(_chain_fwd, _chain_bwd)


def film_cond_chain(c, w0, b0, w1, b1, *, interpret: bool = False):
    """Fused cond_0 -> leaky_relu -> cond_1 for all n FiLM blocks of a stage.

    c:  (B, T, Cc) conditioning (already broadcast over time)
    w0: (3, Cc, n*Cc), b0: (n*Cc,)   — concatenated cond_0 kernels
    w1: (3, Cc, n*two_c), b1: (n*two_c,) — concatenated cond_1 kernels
    returns (n, B, T, two_c): per-block (gamma, beta) stacked, where
    block i's gamma = out[i, ..., :C], beta = out[i, ..., C:].

    Identical math to MRFBlock._batched_film's XLA formulation (zero-'same'
    convs, h rounded to the compute dtype between the convs); h never
    touches HBM.  Reference: model/generator.py:96-105.
    """
    n = w0.shape[2] // c.shape[2]
    cc = c.shape[2]
    two_c = w1.shape[2] // n
    # (3, cc, n*two_c) -> (n, 3, cc, two_c): static lane slices move to the
    # leading (cheap) axis so the kernel never lane-slices at odd offsets
    w1r = jnp.transpose(w1.reshape(3, cc, n, two_c), (2, 0, 1, 3))
    b1r = b1.reshape(n, two_c)
    return _chain(c, w0, b0, w1r, b1r, interpret)
