"""Host input pipeline: audio IO, manifest datasets, corruption, batching."""

from td_vc_gan_tpu.data.audio_io import read_audio, write_audio  # noqa: F401
from td_vc_gan_tpu.data.dataset import (  # noqa: F401
    WaveDataset,
    SpeakerDataset,
    collate,
    load_speakers,
    make_train_iterator,
)
