"""Fused FiLM conditioning chain as a Pallas TPU kernel.

VERDICT (round 3, measured on a v5e, default OFF — TDVC_FUSED_COND=1 to
enable): XLA wins.  Honest fwd+bwd A/B at the real stage shapes
(tools/bench_cond_chain.py, batch 128 = the step's batched G applies):

    T=8960 C=16: fused 110.0 ms   xla 56.6 ms   (0.51x)
    T=4480 C=32: fused  70.0 ms   xla 32.0 ms   (0.46x)
    T=2240 C=64: fused  50.2 ms   xla 19.4 ms   (0.39x)
    forward-only T=8960: fused 38.9 ms vs xla 16.6 ms

Why: the kernel must pad Cc=136 lanes to 256 and decompose each k=3 conv
into 3 shifted matmuls, so its MXU time is ~3x the dense-conv floor, and
that exceeds the HBM time of the bytes it saves even on a step running at
~90% of HBM bandwidth.  The byte problem it targeted is solved more cheaply
in pure XLA: wrapping the chain in jax.checkpoint (layers.py
_cond_ckpt_enabled) collapses XLA's 6-9 per-consumer rematerializations of
the wide activation into one shared recompute.  The kernel remains as the
documented measured alternative and regression-tested reference for future
TPU generations where the MXU:HBM ratio may flip the trade.

The v3 rejection was re-validated against the PRODUCTION formulation
(2026-08-19): tools/bench_cond_chain.py split_baseline() measures the real
in-step split chain (spk matmul + edge fixes + checkpoint) standalone on a
v5e at B=128 — T=8960/C=16: fwd 11.61 ms, fwd+bwd 44.92; T=4480/C=32:
7.88 / 26.30; T=2240/C=64: 5.73 / 17.03.  The best group-packed kernel
formulation found (3 groups x 3 blocks, contiguous 408->512-lane slices,
im2col K=24->128 cond_0 — 2.4x fewer padded MACs than the block-diagonal
v3 costing below) still floors at ~787k padded MACs/t fwd / ~2.36M bwd =
~13 ms fwd / ~39 ms bwd per (128, 8960) instance at the measured 70% MXU
utilization — it LOSES to XLA's 11.61 / 33.3 before counting risk.  The
136-in/32-out per-block geometry cannot be packed onto a 128x128 MXU
cheaply enough to beat a byte-floor-bound XLA schedule.  Closed.

A redesigned v3 was COSTED AND REJECTED before building (round 3): even
exploiting the split-cond structure (layers.py _split_cond_enabled — the
conv_0 input is 128 time-constant + 8 time-varying channels, so the
in-kernel recompute becomes a K=24 im2col matmul) and 128-aligned block
grouping, the per-block cond_1 geometry (136 in -> 2C=32 out) is
intrinsically adversarial to a 128x128 systolic array: any matmul writing
32 useful output lanes wastes >=4x, block-diagonal N-packing just moves the
zeros into K, and Mosaic's lane granularity forces K 136 -> 256 on every
formulation that keeps blocks separable.  First-principles MAC accounting
at the profiled v2 efficiency (70% MXU util measured): v3 forward ~t*950k
padded MAC vs the XLA split chain's ~13-15 ms equivalent — a wash; backward
~t*1.9M vs XLA's ~35-40 ms — saves only ~7 ms per (128, 8960) instance,
~20 ms/step, for weeks-grade kernel risk.  The chain's remaining cost is
the HBM residency of the (B, T, n*Cc) activation, whose byte-minimal
schedule XLA already emits (one fused recompute producing lh + d_h + bias
grad per instance — verified in the round-3 HLO dump).

Every FiLM block in an MRF stage conditions on the SAME per-stage tensor
``c`` (B, T, Cc) through a private 2-layer conv net (reference
model/generator.py:96-105: ``cond_0`` k=3 -> leaky_relu -> ``cond_1`` k=3 ->
(gamma, beta)).  The stage-batched XLA formulation (models/layers.py
``MRFBlock._batched_film``) runs cond_0 as ONE wide conv, which is fast but
materializes the (B, T, n*Cc) intermediate ``h`` in HBM — at batch 64 the
round-3 profile initially showed ~47 GB/step of traffic on the chain on a
step running at ~90% of v5e HBM bandwidth: bytes ARE the step time.
(Post-scriptum: most of that traffic turned out to be the two ``.at[].add``
edge-fix dynamic-update-slices, each materializing a full (B, T, n*Cc)
copy in fwd AND the checkpointed bwd recompute; rewriting them as
iota-masked elementwise subtracts — layers.py ``_split_film`` — cut the
chain to ~21 GB written/step and the whole step by 9.8%, widening XLA's
win over this kernel further.)

This kernel keeps ``h`` entirely in VMEM.  Formulation notes (v2 — the v1
per-block formulation measured 2x SLOWER than XLA: 27 small matmuls over
lane-misaligned slices of the 1224-wide activation do not pipeline):

- Both convs are k shifted (T, K) @ (K, N) MXU matmuls over a DMA'd window
  of the zero-padded ``c``.  The per-block cond_1 kernels are packed into
  ONE block-diagonal (n*Cc, n*2C) matrix outside the kernel, so cond_1 is
  3 large dense matmuls — ~9x logical FLOP waste on zeros, but dense MXU
  shapes beat 27 tiny lane-shuffled products.
- 'same'-conv edge semantics are kept exact by masking activation rows that
  fall outside [0, T) (the second conv reads a zero-padded *activation*).
- backward (custom_vjp) recomputes the activation in-kernel from ``c`` (no
  stored residuals), derives the leaky_relu mask from the OUTPUT sign
  (exact for slope > 0), emits dc tile-by-tile, and accumulates
  dW0/db0/dW1/db1 in f32 VMEM scratch across the sequential grid — dW1 via
  one batched dot_general over a (T, n, Cc) lane-split reshape.

Mosaic alignment: manually-DMA'd HBM arrays need x128-aligned minor dims
(measured: a 136-lane DMA slice is rejected), so the wrapper zero-pads the
channel axes at the kernel boundary — ``c`` to ccp = roundup(Cc, 128) and
the packed film output to ncp = roundup(n*2C, 128); consumers slice their
(gamma, beta) at the true n*2C strides and the padding never flows
anywhere (zero weights produce it, and its cotangent is discarded).

Numerics: matmuls accumulate in f32 (``preferred_element_type``); ``h`` is
rounded to the compute dtype between the two convs exactly where the XLA
path materializes it.  Tests run the interpret path on CPU against the
XLA formulation (tests/test_pallas_cond_chain.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.2
PAD = 8  # zero rows added to each end of T so DMA windows stay x8-aligned


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def _lrelu(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _row_mask(t0, t_rows: int, t_total: int, dtype):
    """(t_rows, 1) mask: 1 where the absolute h-row t0-1+r is a real conv
    output in [0, t_total)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (t_rows, 1), 0) + (t0 - 1)
    return ((rows >= 0) & (rows < t_total)).astype(dtype)


def _pick_tile(t: int, cap: int = 560) -> int:
    """Largest time tile <= cap dividing t; multiples of 8 (Mosaic)."""
    for cand in (560, 512, 448, 384, 320, 280, 256, 224, 160, 128, 112, 64, 56, 32, 16, 8):
        if cand <= cap and t % cand == 0:
            return cand
    return 0


def supports(t: int, n: int, cc: int, two_c: int) -> bool:
    """Shapes the compiled kernel handles: an x8 time tiling must exist and
    the backward working set (weights + f32 accumulators + value buffers at
    the backward tile) must stay under the ~16 MB VMEM budget."""
    tile = _pick_tile(t)
    if tile == 0:
        return False
    ncc = n * cc
    ncp = _rup(n * two_c, 128)
    ccp = _rup(cc, 128)
    bt = _pick_tile(t, cap=280)
    weights = 2 * (2 * 3 * ccp * ncc + 3 * ncc * ncp)       # bf16 w0p/w0t/w1bdT
    accs = 4 * (3 * cc * ncc + 3 * n * cc * two_c + 2 * ncp)
    values = 4 * (bt + 16) * (3 * ncc + ccp + ncp)
    # covers the generator's full- and half-rate stages (C=16/32 — ~78% of
    # the chain's HBM bytes); the wider stages fall back to the XLA path
    return (weights + accs + values) < 17 * 1024 * 1024


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(c_hbm, w0_ref, b0_ref, w1bd_ref, b1p_ref, out_ref, cbuf, sem,
                *, t_tile: int, t_total: int, cdt):
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
    a = (_lrelu(h) * _row_mask(t0, rows, t_total, jnp.float32)).astype(cdt)

    gb = b1p_ref[0:1, :].astype(jnp.float32)
    for j in range(3):
        gb = gb + jnp.dot(a[j:j + t_tile, :], w1bd_ref[j],
                          preferred_element_type=jnp.float32)
    out_ref[0] = gb.astype(out_ref.dtype)


def _pallas_fwd(cp, w0p, b0, w1bd, b1p, *, t_total, t_tile, interpret):
    bsz = cp.shape[0]
    ccp = cp.shape[2]
    ncc = w0p.shape[2]
    ncp = w1bd.shape[2]
    cdt = cp.dtype
    grid = (bsz, t_total // t_tile)
    vmem_bytes = (4 * (t_tile + 16) * (2 * ncc + ccp + 2 * ncp)
                  + 2 * (3 * ccp * ncc + 3 * ncc * ncp) + (4 << 20))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_tile=t_tile, t_total=t_total,
                          cdt=cdt),
        out_shape=jax.ShapeDtypeStruct((bsz, t_total, ncp), cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # padded c: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0p (3, ccp, n*cc)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0 (1, n*cc)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1bd (3, n*cc, ncp)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1p (1, ncp)
        ],
        out_specs=pl.BlockSpec((1, t_tile, ncp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t_tile + 2 * PAD, ccp), cdt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(vmem_bytes)),
        interpret=interpret,
    )(cp, w0p, b0, w1bd, b1p)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(c_hbm, g_hbm, w0_ref, b0_ref, w0t_ref, w1bdt_ref,
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
        g_hbm.at[b, pl.ds(start, t_tile + 2 * PAD), :], gbuf, sems.at[1])
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
    a32 = _lrelu(h) * mask   # f32: the target has no bf16 vector compare
    a = a32.astype(cdt)

    # da rows [t0-1, t0+t_tile+1): g local slice 8-j .. 8-j+rows
    da = jnp.zeros((rows, n * cc), jnp.float32)
    for j in range(3):
        da = da + jnp.dot(gbuf[8 - j:8 - j + rows, :], w1bdt_ref[j],
                          preferred_element_type=jnp.float32)
    # lrelu' from the OUTPUT sign (exact: slope > 0 preserves sign)
    dh = (jnp.where(a32 >= 0, da, LEAKY_SLOPE * da) * mask).astype(cdt)

    # dc[u] = sum_d dh[u - d + 1] w0_d^T : dh slice starts 2,1,0
    dc = jnp.zeros((t_tile, cbuf.shape[1]), jnp.float32)
    for j in range(3):
        dc = dc + jnp.dot(dh[2 - j:2 - j + t_tile, :], w0t_ref[j],
                          preferred_element_type=jnp.float32)
    dc_ref[0] = dc.astype(dc_ref.dtype)

    # owned rows for weight grads: absolute [t0, t0+t_tile) = local shifts
    dh_own = dh[1:1 + t_tile, :]
    for j in range(3):
        dw0_acc[j] = dw0_acc[j] + jax.lax.dot_general(
            cbuf[7 + j:7 + j + t_tile, :cc], dh_own,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # per-block (lane-split reshapes and mid-position batch dims are
        # both unsupported by Mosaic; static lane slices relayout fine)
        for blk in range(n):
            dw1_acc[j, blk] = dw1_acc[j, blk] + jax.lax.dot_general(
                a[j:j + t_tile, blk * cc:(blk + 1) * cc],
                gbuf[8:8 + t_tile, blk * two_c:(blk + 1) * two_c],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    db0_acc[...] = db0_acc[...] + jnp.sum(
        dh_own.astype(jnp.float32), axis=0, keepdims=True)
    db1_acc[...] = db1_acc[...] + jnp.sum(
        gbuf[8:8 + t_tile, :].astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(last)
    def _():
        dw0_ref[...] = dw0_acc[...].astype(dw0_ref.dtype)
        db0_ref[...] = db0_acc[...].astype(db0_ref.dtype)
        dw1_ref[...] = dw1_acc[...].astype(dw1_ref.dtype)
        db1_ref[...] = db1_acc[...].astype(db1_ref.dtype)


def _pallas_bwd(cp, gp, w0p, b0, w0t, w1bdt, *, t_total, t_tile, n, cc,
                two_c, interpret):
    bsz = cp.shape[0]
    ccp = cp.shape[2]
    ncc = w0p.shape[2]
    ncp = gp.shape[2]
    cdt = cp.dtype
    grid = (bsz, t_total // t_tile)
    vmem_bytes = (
        4 * (t_tile + 16) * (4 * ncc + 2 * ccp + ncp)
        + 2 * (2 * 3 * ccp * ncc + 3 * ncc * ncp)
        + 4 * (3 * cc * ncc + 3 * n * cc * two_c)
        + (4 << 20)
    )
    zero_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, t_tile=t_tile, t_total=t_total, n=n,
                          cc=cc, two_c=two_c, cdt=cdt),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, t_total, ccp), cdt),       # dc (padded)
            jax.ShapeDtypeStruct((3, cc, ncc), jnp.float32),      # dW0
            jax.ShapeDtypeStruct((1, ncc), jnp.float32),          # db0
            jax.ShapeDtypeStruct((3, n, cc, two_c), jnp.float32),  # dW1 blocks
            jax.ShapeDtypeStruct((1, ncp), jnp.float32),          # db1 packed
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # padded c
            pl.BlockSpec(memory_space=pl.ANY),   # padded film cotangent
            zero_spec, zero_spec, zero_spec, zero_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, t_tile, ccp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cc, ncc), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncc), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n, cc, two_c), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_tile + 2 * PAD, ccp), cdt),         # c window
            pltpu.VMEM((t_tile + 2 * PAD, ncp), cdt),         # g window
            pltpu.VMEM((3, cc, ncc), jnp.float32),            # dW0 acc
            pltpu.VMEM((1, ncc), jnp.float32),                # db0 acc
            pltpu.VMEM((3, n, cc, two_c), jnp.float32),       # dW1 acc
            pltpu.VMEM((1, ncp), jnp.float32),                # db1 acc
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(vmem_bytes)),
        interpret=interpret,
    )(cp, gp, w0p, b0, w0t, w1bdt)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _block_diag(w1, n: int, cc: int, two_c: int, ncp: int):
    """(3, cc, n*two_c) concat layout -> (3, n*cc, ncp) block-diagonal."""
    out = jnp.zeros((3, n * cc, ncp), w1.dtype)
    for i in range(n):
        out = out.at[:, i * cc:(i + 1) * cc,
                     i * two_c:(i + 1) * two_c].set(
            w1[:, :, i * two_c:(i + 1) * two_c])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _chain(c, w0, b0, w1, b1, interpret):
    cc = c.shape[2]
    n = w0.shape[2] // cc
    two_c = w1.shape[2] // n
    ccp = _rup(cc, 128)
    ncp = _rup(n * two_c, 128)
    t_tile = _pick_tile(c.shape[1])
    cp = jnp.pad(c, ((0, 0), (PAD, PAD), (0, ccp - cc)))
    w0p = jnp.pad(w0, ((0, 0), (0, ccp - cc), (0, 0)))
    w1bd = _block_diag(w1, n, cc, two_c, ncp)
    b1p = jnp.pad(b1, (0, ncp - n * two_c)).reshape(1, ncp)
    return _pallas_fwd(cp, w0p, b0.reshape(1, -1), w1bd, b1p,
                       t_total=c.shape[1], t_tile=t_tile, interpret=interpret)


def _chain_fwd(c, w0, b0, w1, b1, interpret):
    out = _chain(c, w0, b0, w1, b1, interpret)
    return out, (c, w0, b0, w1)


def _chain_bwd(interpret, res, g):
    c, w0, b0, w1 = res
    t_total = c.shape[1]
    cc = c.shape[2]
    n = w0.shape[2] // cc
    two_c = w1.shape[2] // n
    ccp = _rup(cc, 128)
    ncp = _rup(n * two_c, 128)
    t_tile = _pick_tile(t_total, cap=280)
    cp = jnp.pad(c, ((0, 0), (PAD, PAD), (0, ccp - cc)))
    gp = jnp.pad(g.astype(c.dtype), ((0, 0), (PAD, PAD), (0, 0)))
    w0p = jnp.pad(w0, ((0, 0), (0, ccp - cc), (0, 0)))
    # transposing the PADDED w0 makes dc's padding columns exactly zero
    w0t = jnp.transpose(w0p, (0, 2, 1))                   # (3, n*cc, ccp)
    w1bdt = jnp.transpose(
        _block_diag(w1, n, cc, two_c, ncp), (0, 2, 1))    # (3, ncp, n*cc)
    dc, dw0, db0, dw1b, db1p = _pallas_bwd(
        cp, gp, w0p, b0.reshape(1, -1), w0t, w1bdt,
        t_total=t_total, t_tile=t_tile, n=n, cc=cc, two_c=two_c,
        interpret=interpret)
    # (3, n, cc, two_c) blocks -> (3, cc, n*two_c) concat layout
    dw1 = jnp.transpose(dw1b, (0, 2, 1, 3)).reshape(3, cc, n * two_c)
    return (dc[:, :, :cc].astype(c.dtype),
            dw0.astype(w0.dtype),
            db0.reshape(-1).astype(w0.dtype),
            dw1.astype(w1.dtype),
            db1p.reshape(-1)[:n * two_c].astype(w1.dtype))


_chain.defvjp(_chain_fwd, _chain_bwd)


def film_cond_chain(c, w0, b0, w1, b1, *, interpret: bool = False):
    """Fused cond_0 -> leaky_relu -> cond_1 for all n FiLM blocks of a stage.

    c:  (B, T, Cc) conditioning (already broadcast over time)
    w0: (3, Cc, n*Cc), b0: (n*Cc,)   — concatenated cond_0 kernels
    w1: (3, Cc, n*two_c), b1: (n*two_c,) — concatenated cond_1 kernels
    returns (B, T, ncp) with ncp = roundup(n*two_c, 128): block i's
    (gamma, beta) live at [..., i*two_c : (i+1)*two_c] (gamma first);
    columns beyond n*two_c are zero padding.

    Identical math to MRFBlock._batched_film's XLA formulation (zero-'same'
    convs, h rounded to the compute dtype between the convs); h never
    touches HBM.  Reference: model/generator.py:96-105.
    """
    return _chain(c, w0, b0, w1, b1, interpret)
