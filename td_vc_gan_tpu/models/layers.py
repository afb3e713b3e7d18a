"""Core conv/norm building blocks, TPU-native.

Design notes (vs the torch reference):

- Layout is channels-last (B, T, C). On TPU the channel axis maps to the
  128-wide lane dimension, and XLA lowers 1-D convs to MXU matmuls.
- Weight normalization is an explicit reparameterization (g · v/||v||)
  evaluated at apply time — there is no hook mechanism to mimic. Parameter
  split (v, g) matches torch's ``weight_norm`` (dim=0 per-output-channel for
  Conv1d, per-*input*-channel for ConvTranspose1d), so reference checkpoints
  map 1:1.
- Transposed convolution is expressed as an input-dilated regular convolution
  (lhs_dilation), which XLA:TPU compiles to the same efficient grad-conv it
  uses for backprop, with padding arithmetic reproducing torch
  ``ConvTranspose1d(kernel, stride, padding, output_padding)`` exactly.
- Initializers reproduce torch's Conv1d/Linear defaults (Kaiming-uniform with
  a=√5 ⇒ U(±1/√fan_in)) so training dynamics are comparable.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


LEAKY_RELU_SLOPE = 0.2


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _leaky_relu_from_output(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _leaky_relu_fwd(x, slope):
    y = _leaky_relu_from_output(x, slope)
    return y, y


def _leaky_relu_bwd(slope, y, g):
    # slope > 0 preserves sign, so the output alone decides the branch —
    # exact same gradient as differentiating through where(x >= 0, ...)
    return (jnp.where(y >= 0, g, slope * g),)


_leaky_relu_from_output.defvjp(_leaky_relu_fwd, _leaky_relu_bwd)


def leaky_relu(x: jnp.ndarray, slope: float = LEAKY_RELU_SLOPE) -> jnp.ndarray:
    """leaky_relu whose VJP reads the OUTPUT, not the input.

    Byte-traffic optimization (round-3 profile): with the standard
    formulation XLA keeps both the pre-activation and the activation alive
    for the backward pass (observed as (pre, act) tuple fusions of 2×2.8 GB
    at the full-rate FiLM cond chains, batch 64). Deriving the gradient mask
    from the output sign lets the pre-activation die at the fusion boundary.
    Gradient is bit-identical (slope > 0 preserves sign).
    """
    return _leaky_relu_from_output(x, slope)


@jax.custom_vjp
def relu_from_output(x):
    """relu with an output-reading VJP (same rationale as leaky_relu; at
    y == 0 the gradient is 0, matching jax.nn.relu's subgradient choice)."""
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = relu_from_output(x)
    return y, y


def _relu_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


relu_from_output.defvjp(_relu_fwd, _relu_bwd)


# ---------------------------------------------------------------------------
# mixed-precision compute scope
# ---------------------------------------------------------------------------
#
# The cfg.train.compute_dtype policy: inside the scope every WNConv1d /
# WNConvTranspose1d casts its input and (f32-master) kernel to the compute
# dtype, so the MXU runs bf16 and inter-layer activations stay bf16 (the
# models are HBM-bound); parameters, optimizer state and losses remain f32 —
# the top-level modules cast their outputs back via ``finalize_dtype``. The
# scope is read at TRACE time, so entering it inside a jitted function body
# specializes that compilation.

_COMPUTE_DTYPE: list = [None]


def get_compute_dtype():
    return _COMPUTE_DTYPE[0]


class compute_dtype_scope:
    """``with compute_dtype_scope(jnp.bfloat16): ...`` — None is a no-op."""

    def __init__(self, dtype):
        if isinstance(dtype, str):
            dtype = {"bfloat16": jnp.bfloat16, "float32": None,
                     "none": None}[dtype.lower()]
        self.dtype = dtype

    def __enter__(self):
        self._prev = _COMPUTE_DTYPE[0]
        _COMPUTE_DTYPE[0] = self.dtype
        return self

    def __exit__(self, *exc):
        _COMPUTE_DTYPE[0] = self._prev
        return False


def finalize_dtype(x):
    """Cast a model output back to f32 when a compute scope is active."""
    if _COMPUTE_DTYPE[0] is not None and x is not None and x.dtype != jnp.float32:
        return x.astype(jnp.float32)
    return x


def torch_conv_kernel_init(fan_in: int) -> Callable:
    """U(±1/√fan_in): torch Conv/Linear default (kaiming_uniform, a=√5)."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _norm_except(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    """L2 norm over all axes except ``axis`` (torch weight_norm semantics)."""
    axes = tuple(i for i in range(v.ndim) if i != axis)
    return jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))


# ---------------------------------------------------------------------------
# packed ("space-to-depth") execution of narrow-channel convolutions
# ---------------------------------------------------------------------------
#
# TPU MXU tiles are 128 lanes wide: a stride-1 conv with C<128 channels runs
# at C/128 lane utilization (the full-rate 16/32/64-channel MRF stages of the
# generator are the worst offenders — measured ~50 us for a [16,8960,16]
# conv that is ~1 us of peak-MXU work). We fold r = 128//max(Cin,Cout) time
# steps into the channel axis and run ONE packed conv with an exactly
# equivalent block-scattered kernel: out and grads are bit-compatible
# reassociations of the same sums. Pure XLA — no Pallas needed.
#
# MEASURED OFF by default: on a v5e the fused train step regressed 212->228
# ms/step with packing on (even gated to FLOP-ratio<=1.5 cases) — XLA's own
# space-to-depth handling of narrow convs wins in context, though isolated
# microbenches favor packing for C=64. Kept behind TDVC_PACKED_CONV=1 for
# future runtimes; correctness is covered by tests/test_layers.py.

# --------------------------------------------------------------------------
# SPMD mesh scope (round-4). GSPMD cannot batch-partition feature-grouped
# convolutions: with a batch-sharded input it ALL-GATHERS the batch, runs
# the grouped conv on the full global batch on EVERY device, and slices the
# local shard back out — and sharding propagation drags the neighboring
# groups=1 convs into the replicated region too. Measured on the fused
# train step over a virtual mesh (weak sweep, fixed per-device batch):
# +7% per-device FLOPs at n=2 growing to +20% at n=8, all of it the
# discriminator (its MelGAN-style downsample convs are grouped,
# discriminator.py:56; reference mel_gan_modules.py uses the same groups).
# Fix: when a mesh is in scope, grouped convs run UNDER shard_map — each
# device convolves only its batch shard, which is exact math (a grouped
# conv is per-batch-element) and needs zero collectives in the forward
# (the kernel cotangent gets one psum, inserted by shard_map's transpose).
# --------------------------------------------------------------------------

_SPMD_MESH: list = [None]


def get_spmd_mesh():
    return _SPMD_MESH[0]


class spmd_mesh_scope:
    """``with spmd_mesh_scope(mesh): ...`` — None is a no-op."""

    def __init__(self, mesh):
        self.mesh = mesh
        self._prev = None

    def __enter__(self):
        self._prev = _SPMD_MESH[0]
        _SPMD_MESH[0] = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        _SPMD_MESH[0] = self._prev
        return False


def _packing_enabled() -> bool:
    """cfg.train.packed_conv via the active perf scope; TDVC_PACKED_CONV
    overrides per process (read lazily at trace time, not at import, so
    tests and late env changes take effect)."""
    from td_vc_gan_tpu import perf

    return perf.enabled("packed_conv")


def _fused_cond_enabled() -> bool:
    """TDVC_FUSED_COND gates the fused Pallas FiLM cond chain (default OFF
    after honest A/B on a v5e: fwd+bwd at the real stage shapes measured
    0.39-0.51x of the XLA formulation — the 136->128-lane padding and 3-tap
    shifted-matmul decomposition cost more MXU time than the ~37 GB/step of
    HBM traffic they avoid, and the checkpointed XLA chain (_cond_ckpt)
    removes most of those bytes for free; see ops/pallas/cond_chain.py).
    cfg.train.fused_cond via the active perf scope; TDVC_FUSED_COND
    overrides per process, read lazily at trace time for A/B benches."""
    from td_vc_gan_tpu import perf

    return perf.enabled("fused_cond")


def _split_cond_enabled() -> bool:
    """TDVC_SPLIT_COND gates the split formulation of the FiLM cond chain
    (default on). The per-stage conditioning is concat(broadcast(spk_emb),
    excitation) — 128 of the 136 channels are CONSTANT over time (reference
    model/generator.py:396-399 repeats the speaker embedding every frame),
    so the wide cond_0 conv re-multiplies the same vector at every t. The
    split path computes the speaker contribution as ONE (B, S) @ (S, n*Cc)
    matmul (with exact conv-edge corrections for the 'same' zero pad) and
    convolves only the E=8 excitation channels: identical math, ~17x fewer
    chain FLOPs, and the (B, T, 136) concat + per-stage jnp.repeat of the
    embedding (measured ~4 GB/step of writes at batch 64) never materialize.
    cfg.train.split_cond via the active perf scope; TDVC_SPLIT_COND
    overrides per process."""
    from td_vc_gan_tpu import perf

    return perf.enabled("split_cond")


def _cond_ckpt_enabled() -> bool:
    """TDVC_COND_CKPT gates jax.checkpoint around the XLA FiLM cond chain
    (default on). Without it, XLA's memory-pressure remat recomputes and
    REWRITES the (B, T, n·Cc) wide activation once per consuming block's
    backward (~6-9 instances of a 1.4-2.8 GB tensor in the round-3 b64
    profile); an explicit checkpoint shares ONE recompute across all n
    cond_1 backwards. cfg.train.cond_ckpt via the active perf scope;
    TDVC_COND_CKPT overrides per process."""
    from td_vc_gan_tpu import perf

    return perf.enabled("cond_ckpt")


def _packing_factor(cin: int, cout: int, t: int, stride: int, groups: int,
                    k: int = 3, dilation: int = 1) -> int:
    if not _packing_enabled() or stride != 1 or groups != 1:
        return 1
    c = max(cin, cout)
    if c >= 128 or 128 % c:
        return 1
    r = 128 // c
    while r > 1 and t % r:
        r //= 2
    # measured on v5e: packing only pays when the block-scattered kernel's
    # FLOP overhead kpp*r/k stays small — dilated k=3 at r>=4 regresses
    while r > 1:
        kpp = ((r - 1) + (k - 1) * dilation) // r + 1
        if kpp * r <= 1.5 * k:
            break
        r //= 2
    return r


@functools.lru_cache(maxsize=None)
def _pack_scatter_map(k: int, dilation: int, r: int) -> np.ndarray:
    """M[q, s, sp, j] = 1 where input tap j of packed output slot sp lands in
    packed input row offset q, slot s: sp + j*dilation == q*r + s."""
    span = (r - 1) + (k - 1) * dilation
    kpp = span // r + 1
    m = np.zeros((kpp, r, r, k), np.float32)
    for j in range(k):
        for sp in range(r):
            q, s = divmod(sp + j * dilation, r)
            m[q, s, sp, j] = 1.0
    return m


def _packed_conv1d(x_pad: jnp.ndarray, kernel: jnp.ndarray, dilation: int,
                   r: int, t_out: int, preferred=None) -> jnp.ndarray:
    """Valid conv of reflect/zero-padded ``x_pad`` (B, T+((k-1)d), Cin) with
    ``kernel`` (k, Cin, Cout), executed as a packed conv at r*C channels."""
    b, _, cin = x_pad.shape
    k, _, cout = kernel.shape
    m = jnp.asarray(_pack_scatter_map(k, dilation, r), kernel.dtype)
    kpp = m.shape[0]
    # packed kernel (kpp, r*Cin, r*Cout): block (s, sp) = sum_j M * W[j].
    # HIGHEST precision: the default TPU dot would round f32 weights through
    # bf16 and break the exact-reassociation guarantee (M is 0/1 so HIGHEST
    # makes the scatter exact)
    wp = jnp.einsum("qspj,jio->qsipo", m, kernel,
                    precision=jax.lax.Precision.HIGHEST
                    ).reshape(kpp, r * cin, r * cout)
    rows = t_out // r + kpp - 1
    need = rows * r
    if need > x_pad.shape[1]:
        x_pad = jnp.pad(x_pad, ((0, 0), (0, need - x_pad.shape[1]), (0, 0)))
    xp = x_pad[:, :need].reshape(b, rows, r * cin)
    y = jax.lax.conv_general_dilated(
        xp, wp, (1,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=preferred,
    )
    return y.reshape(b, t_out, cout)


def _reflect_conv(x, kernel, pads, dilation, preferred):
    """Stride-1 groups-1 reflect-padded conv WITHOUT materializing the padded
    input.

    Byte-traffic optimization (round-3 profile): the explicit
    ``jnp.pad(mode='reflect')`` shows up as ~3 GB/step of standalone copy
    kernels at batch 64 (every dilated MRF conv re-copies its input), plus
    the mirrored cost in the backward.  A zero-padded conv differs from the
    reflect conv only in the first/last ``pads`` output rows; the exact
    difference is a tiny dilated conv over the FLIPPED edge region per side
    (reflect index math: xr[-i] = x[i], xr[T-1+i] = x[T-1-i]), added with
    ``.at[].add`` on a static edge slice.  Identical math, no full-tensor
    copy; AD flows through slice/flip/conv transposes.

    The per-side correction is ONE conv (round-3 session-3 dispatch cut):
    the per-tap form (one flip + matmul + pad PER kernel tap j with
    p - j*d > 0) issued 2,123 standalone `reverse` kernels per b64 step
    (k=7 convs flip 3x per side, k=11 flip 5x, doubled by AD and the MRF
    checkpoint recompute).  Derivation, left side: the missing reflect
    taps at output row i < p_l are sum_j x[p_l - i - j*d] @ k[j] over
    j*d < p_l - i; with xl[t] = x[p_l - t] (one flip of x[:, 1:p_l+1])
    that is sum_j xl_rpad[i + j*d] @ k[j] — a VALID dilated conv of the
    right-zero-padded xl.  Right side mirrors with xr[t] = x[T-2-t] and a
    LEFT zero pad (the tap order reversal folds into the pad side).
    """
    k, _, _ = kernel.shape
    t_in = x.shape[1]
    p_l, p_r = pads
    y = jax.lax.conv_general_dilated(
        x, kernel, (1,), [pads], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=preferred,
    )
    t_out = y.shape[1]
    span = (k - 1) * dilation

    def edge_conv(z):
        return jax.lax.conv_general_dilated(
            z, kernel, (1,), [(0, 0)], rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=preferred,
        )

    if p_l > 0:
        xl = jnp.flip(x[:, 1:p_l + 1, :], axis=1)          # xl[t] = x[p_l - t]
        corr = edge_conv(jnp.pad(xl, ((0, 0), (0, span), (0, 0))))
        y = y.at[:, :p_l, :].add(corr)

    if p_r > 0:
        xr = jnp.flip(x[:, t_in - 1 - p_r:t_in - 1, :], axis=1)  # xr[t] = x[T-2-t]
        corr = edge_conv(jnp.pad(xr, ((0, 0), (span, 0), (0, 0))))
        y = y.at[:, t_out - p_r:, :].add(corr)
    return y


class WNConv1d(nn.Module):
    """1-D convolution with optional weight norm, NWC layout.

    padding: int (symmetric), tuple (left, right), or 'same'.
    pad_mode: 'zeros' | 'reflect' (reflect padding is folded into the conv as
    edge corrections where possible — see _reflect_conv — and applied to the
    input explicitly otherwise).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: int | tuple[int, int] | str = 0
    pad_mode: str = "zeros"
    use_bias: bool = True
    use_weight_norm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_kernel: bool = False):
        in_features = x.shape[-1]
        k = self.kernel_size
        fan_in = (in_features // self.groups) * k
        kernel_shape = (k, in_features // self.groups, self.features)
        init = torch_conv_kernel_init(fan_in)

        if self.use_weight_norm:
            v = self.param("v", init, kernel_shape)
            g = self.param("g", lambda key, s: _norm_except(v, 2).reshape(s), (self.features,))
            kernel = v * (g / jnp.maximum(_norm_except(v, 2).reshape(-1), 1e-12))
        else:
            kernel = self.param("kernel", init, kernel_shape)

        if return_kernel:
            bias = (
                self.param("bias", torch_conv_kernel_init(fan_in), (self.features,))
                if self.use_bias
                else jnp.zeros((self.features,), kernel.dtype)
            )
            return kernel, bias

        if self.padding == "same":
            total = self.dilation * (k - 1)
            pads = (total // 2, total - total // 2)
        elif isinstance(self.padding, int):
            pads = (self.padding, self.padding)
        else:
            pads = tuple(self.padding)

        reflect_fix = (
            self.pad_mode == "reflect"
            and (pads[0] or pads[1])
            and self.stride == 1
            and self.groups == 1
            and max(pads) < x.shape[1]
            and not _packing_enabled()
        )
        if (self.pad_mode == "reflect" and (pads[0] or pads[1])
                and not reflect_fix):
            x = jnp.pad(x, ((0, 0), pads, (0, 0)), mode="reflect")
            pads = (0, 0)

        dt = self.dtype if self.dtype is not None else get_compute_dtype()
        if dt is not None:
            x = x.astype(dt)
            kernel = kernel.astype(dt)

        # NOTE under bf16 the conv emits bf16 (the MXU still accumulates in
        # f32 internally); requesting preferred_element_type=f32 with bf16
        # operands breaks the AD transpose (f32 cotangent vs bf16 kernel).
        preferred = jnp.float32 if dt is None else None
        t_out = (x.shape[1] + pads[0] + pads[1] - self.dilation * (k - 1) - 1) \
            // self.stride + 1
        r = _packing_factor(in_features, self.features, t_out, self.stride,
                            self.groups, k, self.dilation)
        if reflect_fix:
            y = _reflect_conv(x, kernel, pads, self.dilation, preferred)
        elif r > 1:
            x_pad = jnp.pad(x, ((0, 0), pads, (0, 0))) if (pads[0] or pads[1]) else x
            y = _packed_conv1d(x_pad, kernel, self.dilation, r, t_out, preferred)
        else:
            def _conv(xl, kl):
                return jax.lax.conv_general_dilated(
                    xl,
                    kl,
                    window_strides=(self.stride,),
                    padding=[pads],
                    rhs_dilation=(self.dilation,),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    feature_group_count=self.groups,
                    preferred_element_type=preferred,
                )

            mesh = get_spmd_mesh()
            # divisibility is against the MAPPED axis size, not mesh.size:
            # on a multi-axis mesh (e.g. data x model) only axis 0 shards
            # the batch here (ADVICE r4 #4)
            if (self.groups > 1 and mesh is not None
                    and x.shape[0] % mesh.shape[mesh.axis_names[0]] == 0):
                # (batch-1 shape probes — the step's weight-norm eval_shape
                # passes — and any non-divisible batch fall through to the
                # plain conv)
                # GSPMD replicates grouped convs (see spmd_mesh_scope note);
                # shard_map keeps each device on its own batch shard
                from jax.sharding import PartitionSpec as _P

                axis = mesh.axis_names[0]
                y = jax.shard_map(
                    _conv, mesh=mesh,
                    in_specs=(_P(axis), _P()), out_specs=_P(axis),
                )(x, kernel)
            else:
                y = _conv(x, kernel)
        if self.use_bias:
            bias = self.param("bias", torch_conv_kernel_init(fan_in), (self.features,))
            y = y + (bias.astype(dt) if dt is not None else bias)
        return y


class WNConvTranspose1d(nn.Module):
    """Transposed 1-D convolution matching torch ConvTranspose1d semantics.

    Implemented as conv_general_dilated with lhs_dilation=stride over the
    spatially-flipped kernel; output length is exactly
    (L-1)·stride - 2·padding + kernel + output_padding.

    Weight-norm parity: torch stores ConvTranspose1d weights as (in, out, k)
    and weight_norm(dim=0) normalizes per *input* channel; ``v`` here uses the
    same (in, out, k) layout so checkpoints convert without reshuffling.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    use_weight_norm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_kernel: bool = False):
        in_features = x.shape[-1]
        k = self.kernel_size
        fan_in = in_features * k  # torch convT fan_in = in_ch * k (groups=1)
        init = torch_conv_kernel_init(fan_in)
        v_shape = (in_features, self.features, k)

        if self.use_weight_norm:
            v = self.param("v", init, v_shape)
            g = self.param("g", lambda key, s: _norm_except(v, 0).reshape(s), (in_features,))
            w = v * (g.reshape(-1, 1, 1) / jnp.maximum(_norm_except(v, 0), 1e-12))
        else:
            w = self.param("kernel", init, v_shape)

        # (in, out, k) -> flip spatial -> (k, in, out) for WIO
        kernel = jnp.transpose(w[:, :, ::-1], (2, 0, 1))

        dt = self.dtype if self.dtype is not None else get_compute_dtype()
        if dt is not None:
            x = x.astype(dt)
            kernel = kernel.astype(dt)

        pad_l = k - 1 - self.padding
        pad_r = k - 1 - self.padding + self.output_padding
        # see WNConv1d: bf16 output under the compute scope keeps AD sound
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(pad_l, pad_r)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32 if dt is None else None,
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_kernel_init(fan_in), (self.features,))
            y = y + (bias.astype(dt) if dt is not None else bias)
        return y


class Linear(nn.Module):
    """Dense layer with torch nn.Linear default init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        init = torch_conv_kernel_init(fan_in)
        w = self.param("kernel", init, (fan_in, self.features))
        y = x @ w
        if self.use_bias:
            y = y + self.param("bias", init, (self.features,))
        return y


class InstanceNorm(nn.Module):
    """Non-affine InstanceNorm1d over the time axis (torch eps=1e-5).

    x: (B, T, C) — statistics per (batch, channel) over T.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class ConditionalInstanceNorm(nn.Module):
    """(1+γ)·IN(x)+β with (γ, β) predicted from the conditioning.

    Mirrors model/conditional_instance_norm.py:4-19: 2-D cond goes through a
    Linear; 3-D (per-frame) cond through a k=5 'same' Conv1d. The reference
    hardcodes the conv input width to ``n_cond+1`` (:10) which crashes for the
    actual decoder cond width — here the conv infers its input width, which is
    the intended behavior.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        xn = InstanceNorm()(x)
        if c.ndim == 2:
            h = Linear(self.features * 2, use_bias=True)(c)
            h = h[:, None, :]
        else:
            h = WNConv1d(self.features * 2, 5, padding="same", use_weight_norm=False)(c)
        gamma, beta = jnp.split(h, 2, axis=-1)
        return (1 + gamma) * xn + beta


class FiLMResnetBlock(nn.Module):
    """Dilated residual block with FiLM conditioning (generator.py:69-111).

    x -> [lrelu, reflect dilated conv k] -> FiLM(γ,β from cond) ->
    [lrelu, 1×1 conv] + identity shortcut.

    cond (when present) is per-frame (B, T, Cc): a k=3 'same' conv stack maps
    it to (γ, β). The reference's 2-D-cond branch (generator.py:100) calls an
    undefined ``self.cond`` (latent bug, path unused in shipped configs); here
    2-D cond is broadcast over time and shares the conv stack.
    """

    channels: int
    cond_channels: int = 0
    dilation: int = 1
    kernel_size: int = 3
    use_weight_norm: bool = True

    def setup(self):
        # setup (not compact) so MRFBlock can pull ``cond_kernels`` for the
        # stage-batched FiLM computation; attribute names keep the param
        # paths (conv/posconv/cond_0/cond_1) checkpoint-identical.
        self.conv = WNConv1d(
            self.channels,
            self.kernel_size,
            dilation=self.dilation,
            padding=(self.kernel_size * self.dilation - self.dilation) // 2,
            pad_mode="reflect",
            use_weight_norm=self.use_weight_norm,
        )
        self.posconv = WNConv1d(
            self.channels, 1, use_weight_norm=self.use_weight_norm
        )
        if self.cond_channels:
            self.cond_0 = WNConv1d(
                self.cond_channels, 3, padding="same",
                use_weight_norm=self.use_weight_norm,
            )
            self.cond_1 = WNConv1d(
                self.channels * 2, 3, padding="same",
                use_weight_norm=self.use_weight_norm,
            )

    def cond_kernels(self, c: jnp.ndarray):
        """Weight-normalized FiLM conv kernels, for MRFBlock's batched
        cond path (``c`` supplies the input widths)."""
        w0, b0 = self.cond_0(c, return_kernel=True)
        w1, b1 = self.cond_1(c, return_kernel=True)
        return w0, b0, w1, b1

    def __call__(self, x: jnp.ndarray, c: jnp.ndarray | None = None,
                 film: tuple | None = None) -> jnp.ndarray:
        gamma = beta = None
        if film is not None:
            gamma, beta = film
        elif c is not None:
            if c.ndim == 2:
                c = jnp.broadcast_to(c[:, None, :], (c.shape[0], x.shape[1], c.shape[-1]))
            cv = self.cond_0(c)
            cv = self.cond_1(leaky_relu(cv))
            gamma, beta = jnp.split(cv, 2, axis=-1)

        h = self.conv(leaky_relu(x))
        if gamma is not None:
            h = h * (1 + gamma) + beta
        return self.posconv(leaky_relu(h)) + x


class MRFBlock(nn.Module):
    """HiFiGAN Multi-Receptive-Field fusion (generator.py:175-194): for each
    kernel size, a serial chain of FiLM blocks over the dilations; the
    per-kernel outputs are averaged.

    TPU batching: every FiLM block in the stage conditions on the SAME
    per-stage ``c``, so all |kernel_sizes|x|dilations| cond_0 convs run as
    ONE wide conv (outputs concatenated); the per-block cond_1 convs stay
    separate, each on its slice of the wide output — a grouped conv for
    them measured 50 ms/step SLOWER on a v5e (see _batched_film). Identical
    math to the reference's per-block stacks, far fewer kernel launches."""

    channels: int
    cond_channels: int = 0
    dilations: tuple[int, ...] = (1, 3, 5)
    kernel_sizes: tuple[int, ...] = (3, 7, 11)
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray | None = None) -> jnp.ndarray:
        blocks = [
            [
                FiLMResnetBlock(
                    self.channels,
                    self.cond_channels,
                    dilation=d,
                    kernel_size=ks,
                    use_weight_norm=self.use_weight_norm,
                    name=f"block_{k}_{j}",
                )
                for j, d in enumerate(self.dilations)
            ]
            for k, ks in enumerate(self.kernel_sizes)
        ]

        films = None
        if self.cond_channels and c is not None:
            if isinstance(c, tuple):
                # (spk_emb (B, S), excitation (B, T, E)) with S + E ==
                # cond_channels — the split form; see _split_cond_enabled
                probe = jnp.zeros((1, 1, self.cond_channels), x.dtype)
                kers = [blk.cond_kernels(probe)
                        for chain in blocks for blk in chain]
            else:
                if c.ndim == 2:
                    c = jnp.broadcast_to(c[:, None, :], (c.shape[0], x.shape[1], c.shape[-1]))
                kers = [blk.cond_kernels(c)
                        for chain in blocks for blk in chain]
            films = self._batched_film(c, kers)

        nd = len(self.dilations)
        y = 0.0
        for k, chain in enumerate(blocks):
            xs = x
            for j, blk in enumerate(chain):
                if films is not None:
                    xs = blk(xs, film=films[k * nd + j])
                else:
                    xs = blk(xs, c if self.cond_channels else None)
            y = y + xs
        return y / len(self.kernel_sizes)

    def _batched_film(self, c: jnp.ndarray, kers: list) -> list:
        """One wide conv + one grouped conv computing every block's (γ, β)."""
        n = len(kers)
        two_c = 2 * self.channels
        w0 = jnp.concatenate([k[0] for k in kers], axis=-1)  # (3, cc, cc·n)
        b0 = jnp.concatenate([k[1] for k in kers], axis=-1)
        w1 = jnp.concatenate([k[2] for k in kers], axis=-1)  # (3, cc, 2C·n)
        b1 = jnp.concatenate([k[3] for k in kers], axis=-1)

        dt = get_compute_dtype()
        preferred = jnp.float32 if dt is None else None
        # TDVC_FUSED_COND takes precedence over the split path: the fused
        # Pallas kernel consumes the concat form, and its documented A/B
        # ("TDVC_FUSED_COND=1 to enable") must actually run the kernel even
        # though the decoder now passes the (spk, exc) tuple by default.
        # The availability check happens BEFORE the concat: when the kernel
        # cannot run (CPU backend, unsupported stage geometry) the tuple
        # stays split — otherwise the "fused" configuration would silently
        # measure the ~17x-more-FLOPs concat baseline instead.
        from td_vc_gan_tpu.ops.pallas import cond_chain as _cond_chain

        if isinstance(c, tuple):
            fused_ok = (
                _fused_cond_enabled()
                and jax.default_backend() == "tpu"
                and _cond_chain.supports(
                    c[1].shape[1], n, self.cond_channels, two_c))
            if not _split_cond_enabled() or fused_ok:
                spk, exc = c
                c = jnp.concatenate([
                    jnp.broadcast_to(spk[:, None, :],
                                     (exc.shape[0], exc.shape[1], spk.shape[-1])),
                    exc,
                ], axis=-1)
        if dt is not None:
            w0, b0, w1, b1 = (a.astype(dt) for a in (w0, b0, w1, b1))
            if isinstance(c, tuple):
                c = tuple(a.astype(dt) for a in c)
            else:
                c = c.astype(dt)

        if isinstance(c, tuple):
            return self._split_film(c, w0, b0, w1, b1, preferred)

        # Fused Pallas chain: keeps the (B, T, cc·n) intermediate in VMEM
        # (round-3 profile: ~47 GB/step of HBM traffic on this chain at
        # batch 64, on a step running at ~90% of v5e HBM bandwidth).
        from td_vc_gan_tpu.ops.pallas import cond_chain as _cond_chain

        if (_fused_cond_enabled()
                and jax.default_backend() == "tpu"
                and _cond_chain.supports(
                    c.shape[1], n, self.cond_channels, two_c)):
            gb = _cond_chain.film_cond_chain(c, w0, b0, w1, b1)
            return [
                (gb[..., i * two_c:i * two_c + self.channels],
                 gb[..., i * two_c + self.channels:(i + 1) * two_c])
                for i in range(n)
            ]

        cc = self.cond_channels

        def chain(c, w0, b0, w1, b1):
            h = jax.lax.conv_general_dilated(
                c, w0, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=preferred,
            ) + b0
            h = leaky_relu(h)
            films = []
            for i in range(n):
                # per-block cond_1 on its slice of the batched cond_0 output
                # (a grouped conv here measured 50 ms slower on v5e)
                gb = jax.lax.conv_general_dilated(
                    h[..., i * cc:(i + 1) * cc],
                    w1[..., i * two_c:(i + 1) * two_c],
                    (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=preferred,
                ) + b1[i * two_c:(i + 1) * two_c]
                films.append(tuple(jnp.split(gb, 2, axis=-1)))
            return films

        if _cond_ckpt_enabled():
            # share ONE backward recompute of the wide ``h`` across all n
            # cond_1 grads (see _cond_ckpt_enabled docstring for the bytes)
            chain = jax.checkpoint(
                chain, policy=jax.checkpoint_policies.nothing_saveable)
        return chain(c, w0, b0, w1, b1)

    def _split_film(self, c: tuple, w0, b0, w1, b1, preferred) -> list:
        """Split-cond chain (see _split_cond_enabled): h = conv(exc, w0_exc)
        + (spk @ sum_taps(w0_spk) + b0), with the two edge rows corrected for
        the taps whose window crosses the 'same' zero pad. Exactly the math
        of conv(concat(broadcast(spk), exc), w0) + b0 — the k=3 conv at
        interior t sums all three taps of the time-constant channels; at
        t = 0 the tap reading t-1 sees the zero pad (drop w0_spk[0]) and at
        t = T-1 the tap reading t+1 does (drop w0_spk[2])."""
        two_c = 2 * self.channels
        n = w1.shape[-1] // two_c
        cc = self.cond_channels
        spk, exc = c
        s = spk.shape[-1]
        assert w0.shape[0] == 3, "split cond chain assumes k=3 cond_0"
        w0_spk, w0_exc = w0[:, :s, :], w0[:, s:, :]
        # (B, n*cc) time-constant contribution, bias folded in
        spk_all = spk @ (w0_spk[0] + w0_spk[1] + w0_spk[2]) + b0
        edge0 = spk @ w0_spk[0]   # missing at t = 0
        edge_t = spk @ w0_spk[2]  # missing at t = T-1

        def chain(exc, spk_all, edge0, edge_t, w0_exc, w1, b1):
            h = jax.lax.conv_general_dilated(
                exc, w0_exc, (1,), [(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=preferred,
            ) + spk_all[:, None, :]
            # edge corrections as iota-masked elementwise subtracts — NOT
            # .at[].add: each DUS materialized a full (B, T, n*cc) copy
            # (2x 2.8 GB per chain instance in the round-3 b64 HLO, fwd AND
            # backward recompute); the where-form fuses into the conv's
            # output fusion. Same FP order: (conv+spk) - edge at the rows.
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, h.shape[1], 1), 1)
            h = h - jnp.where(t_idx == 0, edge0[:, None, :], 0)
            h = h - jnp.where(t_idx == h.shape[1] - 1, edge_t[:, None, :], 0)
            h = leaky_relu(h)
            films = []
            for i in range(n):
                gb = jax.lax.conv_general_dilated(
                    h[..., i * cc:(i + 1) * cc],
                    w1[..., i * two_c:(i + 1) * two_c],
                    (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=preferred,
                ) + b1[i * two_c:(i + 1) * two_c]
                films.append(tuple(jnp.split(gb, 2, axis=-1)))
            return films

        if _cond_ckpt_enabled():
            # the saved residuals are now tiny: exc (B, T, E) and a handful
            # of (B, n*cc) vectors — the wide h is recomputed from them at
            # ~1/17th of the concat formulation's FLOPs
            chain = jax.checkpoint(
                chain, policy=jax.checkpoint_policies.nothing_saveable)
        return chain(exc, spk_all, edge0, edge_t, w0_exc, w1, b1)


class ResnetBlock(nn.Module):
    """norm → lrelu → dilated reflect conv → norm → lrelu → 1×1 conv, identity
    shortcut (generator.py:48-67). Only reachable through the non-CIN
    bottleneck path; kept for config parity."""

    channels: int
    dilation: int = 1
    kernel_size: int = 3
    norm: str | None = None
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def norm_layer(h):
            return InstanceNorm()(h) if self.norm == "instance_norm" else h

        pad = self.dilation
        h = norm_layer(x)
        h = WNConv1d(
            self.channels,
            self.kernel_size,
            dilation=self.dilation,
            padding=pad,
            pad_mode="reflect",
            use_weight_norm=self.use_weight_norm,
        )(leaky_relu(h))
        h = norm_layer(h)
        h = WNConv1d(self.channels, 1, use_weight_norm=self.use_weight_norm)(leaky_relu(h))
        return h + x


class DecoderResnetBlock(nn.Module):
    """lrelu → WN dilated reflect conv (pad=dilation) → lrelu → WN 1×1 conv,
    plus a WN 1×1-conv shortcut (generator.py:10-25).

    DEAD CODE in the reference — nothing instantiates it (the decoder uses
    MRF/FiLM blocks); rebuilt for inventory completeness. Weight norm is
    hardcoded like the reference (:13)."""

    channels: int
    dilation: int = 1
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = WNConv1d(
            self.channels, self.kernel_size, dilation=self.dilation,
            padding=self.dilation, pad_mode="reflect", name="conv",
        )(leaky_relu(x))
        h = WNConv1d(self.channels, 1, name="posconv")(leaky_relu(h))
        return h + WNConv1d(self.channels, 1, name="shortcut")(x)


class TranformResnetBlock(nn.Module):
    """StarGAN-style relu-conv-norm residual block (generator.py:28-45):
    lrelu → dilated reflect conv → IN → lrelu → 1×1 conv → IN, plus a
    1×1-conv shortcut. Plain (un-normed) convs like the reference.

    DEAD CODE in the reference (spelling included) — nothing instantiates
    it; rebuilt for inventory completeness."""

    channels: int
    dilation: int = 1
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = WNConv1d(
            self.channels, self.kernel_size, dilation=self.dilation,
            padding=self.dilation, pad_mode="reflect",
            use_weight_norm=False, name="conv",
        )(leaky_relu(x))
        h = InstanceNorm()(h)
        h = WNConv1d(self.channels, 1, use_weight_norm=False, name="posconv")(leaky_relu(h))
        h = InstanceNorm()(h)
        return h + WNConv1d(self.channels, 1, use_weight_norm=False, name="shortcut")(x)


class CINResnetBlock(nn.Module):
    """CIN → lrelu → dilated reflect 'same' conv → CIN → lrelu → 1×1 conv,
    plus a 1×1-conv shortcut (generator.py:113-139).

    DEAD CODE in the reference — it appears only in isinstance checks
    (generator.py:267,400), never constructed; rebuilt for inventory
    completeness on top of the live :class:`ConditionalInstanceNorm`."""

    channels: int
    dilation: int = 1
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size * self.dilation - self.dilation) // 2
        h = ConditionalInstanceNorm(self.channels, name="cin0")(x, c)
        h = WNConv1d(
            self.channels, self.kernel_size, dilation=self.dilation,
            padding=pad, pad_mode="reflect", use_weight_norm=False, name="conv",
        )(leaky_relu(h))
        h = ConditionalInstanceNorm(self.channels, name="cin1")(h, c)
        h = WNConv1d(self.channels, 1, use_weight_norm=False, name="posconv")(leaky_relu(h))
        return h + WNConv1d(self.channels, 1, use_weight_norm=False, name="shortcut")(x)


def grad_reverse(x: jnp.ndarray) -> jnp.ndarray:
    """Gradient-reversal: identity forward, -1·grad backward
    (model/grad_rev.py:3-18 — the instance ``lamb`` there is ignored and the
    backward hardcodes 1.0; we match that)."""
    return _grad_reverse(x)


@jax.custom_vjp
def _grad_reverse(x):
    return x


def _grad_reverse_fwd(x):
    return x, None


def _grad_reverse_bwd(_, g):
    return (-g,)


_grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)
