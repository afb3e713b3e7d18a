"""Fused FiLM residual block as a Pallas TPU kernel.

The generator/discriminator hot loop is the MRF grid: 9 FiLM residual blocks
per scale (generator.py:175-194), each ``lrelu → dilated conv k → FiLM →
lrelu → 1×1 conv → +residual``. XLA runs these as separate conv+elementwise
fusions with HBM round-trips between them; this kernel computes a whole
block per batch row in VMEM:

- the dilated conv is expressed as k shifted (T, C) @ (C, C) matmuls on the
  MXU over a reflect-padded row,
- FiLM (γ, β), both leaky-relus, the 1×1 conv and the residual add stay in
  VMEM — one HBM read of x and one write of y per block.

VMEM budget: the generator's (T, C) products are bounded by
max(T·C) = 8960·16 at the full-rate stage (≈0.6 MB f32 per row incl. halo),
so a whole row per program fits comfortably; grid = (batch,).

Training still differentiates through the block: a custom_vjp recomputes the
backward from the jnp formulation (rematerialization — the same policy the
train step uses). Numerics match the XLA path to float32 tolerance
(tests/test_pallas.py runs the kernel in interpret mode on CPU).

MEASURED (round-2, honest device-synced timing — the round-1 sub-ms numbers
were a dispatch-rate artifact of the broken block_until_ready): full fused
conv_enc-stage2_2 train step, batch 16 × 8960, bf16, v5e: XLA 200.8 ms/step
vs Pallas-on-aligned-stages 210.2 ms — XLA wins on this model, so the
kernel ships default OFF (config model.generator.use_pallas_mrf). The
kernel is f32-tiled; under a bf16 compute scope the call boundary casts up
and back (models/layers.py), part of why it loses there. Mosaic constraints
bound where it can run at all: channels must be lane-aligned (×128) and the
time axis ×8-tileable; narrower stages fall back to XLA (models/layers.py
gating). It remains the right tool for wider-channel f32 variants of this
architecture where the FiLM chain becomes HBM-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.2


def _lrelu(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _kernel(x_hbm, gamma_ref, beta_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            scratch, sem, *, k: int, dilation: int, t_tile: int):
    """One (batch, time-tile) program.

    x_hbm: (B, T + 2·halo, C) reflect-padded input left in HBM/ANY; the tile
    plus halo is DMA'd into ``scratch`` (tile starts are t_tile-aligned, so
    Mosaic's alignment constraints hold). gamma/beta/out are (1, t_tile, C)
    VMEM blocks; w1: (k, C, C); w2: (C, C).
    """
    halo = dilation * (k - 1) // 2
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma_len = scratch.shape[0]  # t_tile + 2·halo rounded up to a sublane ×8
    start = pl.multiple_of(i * t_tile, 8)  # t_tile is always a multiple of 8
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(start, dma_len), :], scratch, sem
    )
    cp.start()
    cp.wait()

    # static unroll over taps (static slice starts; Mosaic-friendly)
    acc = jnp.zeros((t_tile, w1_ref.shape[2]), jnp.float32)
    for j in range(k):
        sl = _lrelu(scratch[j * dilation : j * dilation + t_tile, :])
        acc += jnp.dot(sl, w1_ref[j], preferred_element_type=jnp.float32)
    acc += b1_ref[:]

    acc = acc * (1.0 + gamma_ref[0]) + beta_ref[0]
    acc = _lrelu(acc)
    out = jnp.dot(acc, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    out_ref[0] = out + scratch[halo : halo + t_tile, :]


def _reference_impl(x, gamma, beta, w1, b1, w2, b2, *, dilation):
    """jnp formulation (identical math; backward pass + numerics tests)."""
    k = w1.shape[0]
    pad = dilation * (k - 1) // 2
    h = _lrelu(x)
    hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        hp, w1, (1,), [(0, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ) + b1
    y = y * (1.0 + gamma) + beta
    y = _lrelu(y)
    return y @ w2 + b2 + x


def _pick_tile(t: int) -> int:
    """Largest supported time tile; always a multiple of 8 (Mosaic sublane
    alignment). Returns 0 if t has no ×8 tiling (caller falls back to XLA)."""
    for cand in (1024, 896, 768, 512, 448, 384, 256, 128, 64, 32, 16, 8):
        if t % cand == 0:
            return cand
    return 0


def supports(t: int, c: int) -> bool:
    """Whether the fused kernel can run these shapes on real TPUs."""
    return c % 128 == 0 and _pick_tile(t) > 0


def _pallas_forward(x, gamma, beta, w1, b1, w2, b2, *, dilation, interpret=False):
    b, t, c = x.shape
    k = w1.shape[0]
    halo = dilation * (k - 1) // 2
    t_tile = _pick_tile(t)
    # DMA spans must be sublane-aligned (×8): round the halo'd span up and
    # over-pad the source on the right so every tile's span is in bounds
    dma_len = -(-(t_tile + 2 * halo) // 8) * 8
    extra = dma_len - (t_tile + 2 * halo)
    xp = jnp.pad(x, ((0, 0), (halo, halo + extra), (0, 0)), mode="reflect")

    vmem_bytes = (
        # lanes pad C up to 128; budget with the padded width, 2x buffering
        8 * ((t_tile + 2 * halo) * max(c, 128) * (k + 3))
        + (8 << 20)
    )
    return pl.pallas_call(
        functools.partial(_kernel, k=k, dilation=dilation, t_tile=t_tile),
        out_shape=jax.ShapeDtypeStruct((b, t, c), jnp.float32),
        grid=(b, t // t_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays off-chip; manual DMA
            pl.BlockSpec((1, t_tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((dma_len, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(vmem_bytes)),
        interpret=interpret,
    )(xp, gamma, beta, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_film_block(x, gamma, beta, w1, b1, w2, b2, dilation=1, interpret=False):
    """y = posconv(lrelu(FiLM(dilated_conv(lrelu(x))))) + x, fused on TPU.

    x: (B, T, C); gamma/beta: (B, T, C); w1: (k, C, C); w2: (C, C).
    ``interpret=True`` runs in the Pallas interpreter (CPU tests).
    """
    return _pallas_forward(x, gamma, beta, w1, b1, w2, b2,
                           dilation=dilation, interpret=interpret)


def _fwd(x, gamma, beta, w1, b1, w2, b2, dilation, interpret):
    y = _pallas_forward(x, gamma, beta, w1, b1, w2, b2,
                        dilation=dilation, interpret=interpret)
    return y, (x, gamma, beta, w1, b1, w2, b2)


def _bwd(dilation, interpret, res, g):
    # rematerialized backward through the jnp formulation
    _, vjp = jax.vjp(functools.partial(_reference_impl, dilation=dilation), *res)
    return vjp(g)


fused_film_block.defvjp(_fwd, _bwd)
