from neurosync_trainer_lite_tpu.inference.chunked import process_audio_features
from neurosync_trainer_lite_tpu.inference.api import (
    generate_facial_data_from_bytes,
    smooth_by_averaging_pairs,
)

__all__ = [
    "process_audio_features",
    "generate_facial_data_from_bytes",
    "smooth_by_averaging_pairs",
    "BlendshapeStreamer",
    "MultiStreamer",
]


def __getattr__(name):
    # lazy: the streamers pull in the device frontend; keep `import
    # neurosync_trainer_lite_tpu.inference` light for API-only users
    if name == "BlendshapeStreamer":
        from neurosync_trainer_lite_tpu.inference.streaming import (
            BlendshapeStreamer)
        return BlendshapeStreamer
    if name == "MultiStreamer":
        from neurosync_trainer_lite_tpu.inference.multi_stream import (
            MultiStreamer)
        return MultiStreamer
    raise AttributeError(name)
