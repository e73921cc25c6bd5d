from neurosync_trainer_lite_tpu.inference.chunked import process_audio_features
from neurosync_trainer_lite_tpu.inference.api import (
    generate_facial_data_from_bytes,
    smooth_by_averaging_pairs,
)

__all__ = [
    "process_audio_features",
    "generate_facial_data_from_bytes",
    "smooth_by_averaging_pairs",
]
