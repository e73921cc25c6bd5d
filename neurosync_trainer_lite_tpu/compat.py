"""Reference-style API shims for users migrating from NeuroSync Trainer Lite.

Each function keeps the reference's name and call shape (reference file:line
cited per function) and maps onto the TPU-native implementation, so existing
scripts move over with an import change:

    from neurosync_trainer_lite_tpu import compat as neurosync
    model_params = neurosync.load_model('out/model.pth', neurosync.training_config)
    frames = neurosync.generate_facial_data_from_bytes(wav_bytes, model_params,
                                                       device=None)

`training_config` is a plain dict mirroring the reference's
config.py:26-55 keys; functions accept either that dict or a typed Config.
"""

from __future__ import annotations

from typing import Any

from neurosync_trainer_lite_tpu.config import Config


def _cfg(config) -> Config:
    if isinstance(config, Config):
        return config
    return Config.from_dict(dict(config))


#: reference: config.py:26-55 (same keys, same defaults)
training_config: dict[str, Any] = Config().to_dict()


def build_model(config) -> dict:
    """Fresh parameter pytree at the configured scale
    (reference: utils/model_utils.py:22-26 build_model)."""
    import jax

    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq

    cfg = _cfg(config)
    return init_seq2seq(jax.random.PRNGKey(cfg.seed), cfg)


def load_model(model_path: str, config, device=None) -> dict:
    """Load a reference-format model.pth into a params pytree
    (reference: utils/model_utils.py:29-44). `device` accepted and ignored —
    placement is the mesh's job."""
    from neurosync_trainer_lite_tpu.training.checkpoint import (
        load_model as _load)

    return _load(model_path, _cfg(config))


def save_final_model(params, config, path: str | None = None) -> None:
    """Weights-only model.pth export (reference: model_utils.py:46-49)."""
    from neurosync_trainer_lite_tpu.training.checkpoint import save_final_model

    save_final_model(params, _cfg(config), path)


def prepare_training_components(config, params):
    """(criterion-equivalent loss closure, optimizer, schedule-in-optimizer)
    (reference: utils/model_utils.py:9-20). The LR schedule lives inside the
    optax chain, so only (loss_fn, tx, opt_state) are returned."""
    import functools

    from neurosync_trainer_lite_tpu.models.loss import loss_fn
    from neurosync_trainer_lite_tpu.training.optim import make_optimizer

    cfg = _cfg(config)
    criterion = functools.partial(loss_fn, delta=cfg.delta, w1=cfg.w1,
                                  w2=cfg.w2, w3=cfg.w3)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    return criterion, tx, tx.init(params)


def train_model(config, clips=None, **kw):
    """Full training run (reference: train.py:12-58 train_model +
    __main__:61-104)."""
    from neurosync_trainer_lite_tpu.training.loop import train_model as _train

    return _train(_cfg(config), clips, **kw)


def generate_facial_data_from_bytes(audio_bytes: bytes, model, device=None,
                                    config=None):
    """Bytes → [T, 61] blendshapes (reference: utils/generate_face_shapes.py:8).

    The reference's signature takes (audio_bytes, model, device) and forgets
    to pass its config through (generate_face_shapes.py:15 — a latent bug);
    here config defaults to `training_config` so the call shape still works.
    """
    from neurosync_trainer_lite_tpu.inference.api import (
        generate_facial_data_from_bytes as _gen)

    cfg = _cfg(config if config is not None else training_config)
    return _gen(audio_bytes, model, cfg)


def process_audio_features(audio_features, model, device=None, config=None):
    """Chunked features → blendshapes
    (reference: utils/audio/processing/audio_processing.py:50)."""
    import numpy as np

    from neurosync_trainer_lite_tpu.inference.chunked import (
        process_audio_features as _proc)

    cfg = _cfg(config if config is not None else training_config)
    return _proc(np.asarray(audio_features), model, cfg)


def extract_audio_features(audio_input, sr: int = 88200,
                           from_bytes: bool = False):
    """(features[T,256], waveform) (reference:
    utils/audio/extraction/extract_features.py:6)."""
    from neurosync_trainer_lite_tpu.data.processing import (
        extract_audio_features as _extract)

    return _extract(audio_input, sr, from_bytes)


def save_checkpoint(state, epoch, batch_step, config):
    """(reference: utils/checkpoint_utils.py:10)."""
    from neurosync_trainer_lite_tpu.training.checkpoint import (
        save_checkpoint as _save)

    _save(state, epoch, batch_step, _cfg(config))


def load_checkpoint(checkpoint_path, config, steps_per_epoch=1):
    """(epoch, batch_step, TrainState) (reference: checkpoint_utils.py:40)."""
    from neurosync_trainer_lite_tpu.training.checkpoint import (
        load_checkpoint as _load)

    return _load(checkpoint_path, _cfg(config), steps_per_epoch)
