"""On-device DSP and loss ops (pure JAX, jit-safe, static shapes)."""

from td_vc_gan_tpu.ops.dsp import (  # noqa: F401
    add_jitter,
    eq_rms,
    eq_rms_signals,
    f0_to_excitation,
    kaiser_filter,
    kaiser_filter_fc,
    roll_batches,
)
from td_vc_gan_tpu.ops.stft import melspectrogram, mel_filterbank, stft_power  # noqa: F401
