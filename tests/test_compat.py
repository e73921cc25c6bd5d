"""The reference-style compat API: call shapes and round trips."""

import io
import wave

import numpy as np

from neurosync_trainer_lite_tpu import compat
from neurosync_trainer_lite_tpu.config import Config


def _tiny_dict():
    d = dict(compat.training_config)
    d.update(hidden_dim=64, n_layers=2, num_heads=4, dropout=0.0,
             use_amp=False)
    return d


def test_training_config_mirrors_reference_keys():
    for key in ("mode", "sr", "frame_rate", "input_dim", "output_dim",
                "frame_size", "micro_batch_size", "hidden_dim", "n_layers",
                "num_heads", "dropout", "batch_size", "learning_rate",
                "weight_decay", "n_epochs", "delta", "w1", "w2",
                "use_multi_gpu", "num_gpus", "use_amp", "overlap",
                "root_dir", "model_path", "audio_path", "ground_truth_path",
                "checkpoint_path", "ffmpeg_path"):
        assert key in compat.training_config, key


def test_build_save_load_roundtrip(tmp_path):
    cfg_dict = _tiny_dict()
    params = compat.build_model(cfg_dict)
    path = str(tmp_path / "model.pth")
    compat.save_final_model(params, cfg_dict, path)
    restored = compat.load_model(path, cfg_dict, device="cuda:0")  # device ignored
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_prepare_training_components(tmp_path):
    cfg_dict = _tiny_dict()
    params = compat.build_model(cfg_dict)
    criterion, tx, opt_state = compat.prepare_training_components(cfg_dict, params)
    import jax.numpy as jnp

    loss = criterion(jnp.zeros((1, 4, 61)), jnp.ones((1, 4, 61)))
    assert float(loss) > 0


def test_generate_facial_data_from_bytes_reference_signature():
    cfg_dict = _tiny_dict()
    params = compat.build_model(cfg_dict)
    sr = cfg_dict["sr"]
    y = (0.2 * np.sin(np.arange(sr * 2) * 0.01)).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((y * 32767).astype(np.int16).tobytes())
    # the reference call shape: (audio_bytes, model, device) — no config
    out = compat.generate_facial_data_from_bytes(buf.getvalue(), params,
                                                 device=None, config=cfg_dict)
    assert out.shape[1] == 61
    assert out.shape[0] > 0
