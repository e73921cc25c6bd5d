"""neurosync_trainer_lite_tpu — a TPU-native audio→blendshape framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of
NeuroSync Trainer Lite: trains a ~235M-parameter RoPE encoder/decoder
transformer mapping 256-dim audio features (MFCC + autocorrelation at 60 fps)
to 61-dim ARKit facial blendshapes, and serves a streaming wav→blendshape
inference path compatible with the NeuroSync API/Player CSV ecosystem.
"""

from neurosync_trainer_lite_tpu.config import Config, tiny_config, full_config

__version__ = "0.1.0"

__all__ = ["Config", "tiny_config", "full_config", "__version__"]
