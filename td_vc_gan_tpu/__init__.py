"""TD-VC-GAN-TPU: a TPU-native voice-conversion GAN framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
TD-VC-GAN reference (pitch-controlled, end-to-end waveform-to-waveform
many-to-many voice conversion GAN; see /root/reference/README.md:1-3):

- ``models``    : Generator / multiband Discriminator / latent classifier /
                  CREPE-tiny / WavLM — pure-function flax modules, NWC layout.
- ``ops``       : on-device DSP (excitation synthesis, kaiser filters, STFT/mel,
                  YIN) and the loss suite, plus Pallas TPU kernels for hot ops.
- ``parallel``  : device-mesh construction and sharding rules (pjit data
                  parallelism over ICI; multi-host over DCN).
- ``data``      : host input pipeline (manifest datasets, fixed-shape segment
                  batching, ContentVec-style corruption) with native C++ DSP.
- ``training``  : the fused single-XLA-program GAN train step, curriculum
                  runner, Orbax checkpointing with torch state-dict interop.
- ``cli``       : train / generate_* / dataset-prep entry points mirroring the
                  reference CLIs (train.py:48-56, generate_with_target.py:29-39).
"""

__version__ = "0.1.0"
