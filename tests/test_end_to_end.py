"""End-to-end tiny training run (BASELINE config #1 shape): synthetic capture
folders → train_model → checkpoints, model.pth, validation artifacts, resume."""

import os

import numpy as np
import pytest

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.training.loop import train_model
from neurosync_trainer_lite_tpu.utils.csv_io import save_generated_data_as_csv
from tests.test_data_pipeline import make_capture_folder, SR


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = root / "data"
    os.makedirs(data_dir)
    rng = np.random.default_rng(0)
    make_capture_folder(str(data_dir), "clip1", seconds=2.2, rng=rng)
    make_capture_folder(str(data_dir), "clip2", seconds=2.0, rng=rng)

    # fixed validation pair (reference: config.py:52-53)
    test_dir = root / "test_set"
    os.makedirs(test_dir)
    _, blend = make_capture_folder(str(root), "test_src", seconds=1.5, rng=rng)
    import shutil

    shutil.move(str(root / "test_src" / "audio.wav"), str(test_dir / "audio.wav"))
    save_generated_data_as_csv(blend, str(test_dir / "testset.csv"))
    return root


def make_cfg(root, **kw):
    base = dict(
        hidden_dim=32, n_layers=1, num_heads=2, dropout=0.0, use_amp=False,
        batch_size=8, micro_batch_size=32, frame_size=32, overlap=8,
        n_epochs=2, learning_rate=1e-4,
        root_dir=str(root / "data"),
        model_path=str(root / "out" / "model.pth"),
        audio_path=str(root / "test_set" / "audio.wav"),
        ground_truth_path=str(root / "test_set" / "testset.csv"),
        checkpoint_path=str(root / "out" / "checkpoints" / "checkpoint"),
        plots_dir=str(root / "plots"),
    )
    base.update(kw)
    return Config(**base)


def test_train_end_to_end_and_resume(workspace):
    cfg = make_cfg(workspace)
    state, batch_step = train_model(cfg, verbose=False)
    assert batch_step > 0

    # artifacts (reference parity: checkpoint_utils.py:53-57, training_utils plots)
    assert os.path.exists(cfg.model_path)
    assert os.path.exists(cfg.checkpoint_path)
    assert os.path.exists(os.path.join(cfg.plots_dir, "loss", "loss_epoch_2.png"))
    assert os.path.exists(os.path.join(cfg.plots_dir, "gradient_norms",
                                       "gradient_norms_epoch_2.png"))
    assert os.path.exists(os.path.join(cfg.plots_dir,
                                       "generated_facial_data_epoch_2.csv"))
    assert os.path.exists(os.path.join(cfg.plots_dir,
                                       "comparison_plot_epoch_2.jpg"))
    stats_path = os.path.join(cfg.plots_dir, "stats",
                              "comparison_stats_epoch_2.txt")
    assert os.path.exists(stats_path)
    content = open(stats_path).read()
    assert "Mean Absolute Error (MAE)" in content
    assert "JawOpen:" in content

    # resume continues to further epochs
    cfg_resume = make_cfg(workspace, mode="resume", n_epochs=3)
    state2, batch_step2 = train_model(cfg_resume, verbose=False)
    assert batch_step2 > batch_step
    assert os.path.exists(os.path.join(cfg.plots_dir, "loss", "loss_epoch_3.png"))


def test_max_steps_per_epoch_bounds_the_epoch(workspace, tmp_path):
    """max_steps_per_epoch caps optimizer steps per epoch (bounded probe
    runs on huge datasets) while epoch-boundary artifacts still land."""
    cfg = make_cfg(workspace, n_epochs=2, max_steps_per_epoch=3,
                   model_path=str(tmp_path / "out" / "model.pth"),
                   checkpoint_path=str(tmp_path / "out" / "ck" / "checkpoint"),
                   plots_dir=str(tmp_path / "plots"))
    state, batch_step = train_model(cfg, verbose=False)
    assert batch_step == 2 * 3  # exactly N steps per epoch
    assert os.path.exists(cfg.checkpoint_path)
    assert os.path.exists(os.path.join(cfg.plots_dir, "stats",
                                       "comparison_stats_epoch_2.txt"))


def test_missing_validation_assets_warn_loudly(workspace, tmp_path, capsys):
    """A typo'd golden-pair path must not silently produce a run with no
    quality artifacts (VERDICT r1 weak #3)."""
    cfg = make_cfg(workspace, n_epochs=1,
                   audio_path=str(tmp_path / "nope" / "audio.wav"),
                   ground_truth_path=str(tmp_path / "nope" / "testset.csv"),
                   model_path=str(tmp_path / "out" / "model.pth"),
                   checkpoint_path=str(tmp_path / "out" / "ckpt" / "checkpoint"),
                   plots_dir=str(tmp_path / "plots"))
    train_model(cfg, verbose=False)
    out = capsys.readouterr().out
    assert "WARNING" in out and "validation is DISABLED" in out
    assert "nope" in out  # names the offending paths


def test_zero_clips_fails_loudly(workspace, tmp_path):
    empty = tmp_path / "empty_data"
    os.makedirs(empty)
    cfg = make_cfg(workspace, root_dir=str(empty))
    with pytest.raises(RuntimeError, match="zero usable clips"):
        train_model(cfg, verbose=False)


def test_batch_larger_than_dataset_fails_loudly(workspace):
    """0 < windows < batch_size with drop_last batching would run ZERO
    optimizer steps per epoch, print a NaN loss, and still export a
    random-weights model.pth — train_model must reject it up front."""
    cfg = make_cfg(workspace, batch_size=100_000)
    with pytest.raises(RuntimeError, match="zero optimizer steps"):
        train_model(cfg, verbose=False)


def test_prng_impl_threefry_shorthand_accepted(workspace, tmp_path):
    """config.py documents prng_impl='threefry' for cross-platform
    reproducibility but jax.random.key only knows 'threefry2x32' — the
    loop must accept the documented shorthand instead of crashing at the
    first epoch."""
    cfg = make_cfg(
        workspace, n_epochs=1, prng_impl="threefry", dropout=0.1,
        model_path=str(tmp_path / "m.pth"),
        checkpoint_path=str(tmp_path / "ckpt" / "checkpoint"),
        plots_dir=str(tmp_path / "plots"))
    state, batch_step = train_model(cfg, verbose=False)
    assert batch_step > 0
