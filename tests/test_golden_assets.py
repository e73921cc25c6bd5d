"""The committed golden dataset: default-config paths work out of the box.

The reference ships dataset/test_set/{audio.wav,testset.csv} as the fixed
per-epoch validation pair (reference: config.py:52-53) plus a sample capture
folder under dataset/data/. Ours are deterministic synthetic equivalents
(tools/make_golden_assets.py); these tests pin that a default Config() finds
them and that the full validation path produces artifacts from them.
"""

import os

import numpy as np
import pandas as pd
import pytest

import jax

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.models.loss import ZERO_INDICES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_default_paths_point_at_committed_assets():
    cfg = Config()
    for p in (cfg.root_dir, cfg.audio_path, cfg.ground_truth_path):
        assert os.path.exists(os.path.join(REPO, p)), p


def test_sample_capture_loads_with_reference_semantics(monkeypatch):
    monkeypatch.chdir(REPO)
    from neurosync_trainer_lite_tpu.data.processing import load_data

    clips = load_data("dataset/data", 88200)
    assert len(clips) >= 1
    audio, facial = clips[0]
    assert audio.shape[0] == facial.shape[0]  # center-trim aligned
    assert audio.shape[1] == 256 and facial.shape[1] == 61
    # x100 training space, zero dims exactly zero (Lite capture semantics)
    assert 1.0 < facial[:, :61].max() <= 100.0
    assert np.all(facial[:, list(ZERO_INDICES)] == 0)
    assert np.isfinite(audio).all() and np.isfinite(facial).all()
    # enough stride-1 windows for real batches at the default window length
    assert audio.shape[0] >= 1500


def test_testset_csv_is_livelink_format(monkeypatch):
    monkeypatch.chdir(REPO)
    df = pd.read_csv("dataset/test_set/testset.csv")
    assert list(df.columns[:2]) == ["Timecode", "BlendshapeCount"]
    assert df.shape[1] == 63  # Timecode + count + 61 dims
    assert "JawOpen" in df.columns
    assert len(df) >= 500
    vals = df.drop(columns=["Timecode", "BlendshapeCount"]).values
    assert vals.min() >= 0.0 and vals.max() <= 1.0


@pytest.mark.slow
def test_validation_artifacts_from_golden_pair(monkeypatch, tmp_path):
    """End-to-end per-epoch validation on the committed pair: frontend on the
    real wav, chunked decode, CSV + comparison plot + stats txt."""
    monkeypatch.chdir(REPO)
    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq
    from neurosync_trainer_lite_tpu.training.validation import (
        generate_and_save_facial_data)

    cfg = Config(hidden_dim=32, n_layers=1, num_heads=2, dropout=0.0,
                 use_amp=False, plots_dir=str(tmp_path))
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    generate_and_save_facial_data(0, cfg.audio_path, params,
                                  cfg.ground_truth_path, cfg)
    assert os.path.exists(tmp_path / "generated_facial_data_epoch_1.csv")
    assert os.path.exists(tmp_path / "comparison_plot_epoch_1.jpg")
    stats = (tmp_path / "stats" / "comparison_stats_epoch_1.txt").read_text()
    assert "Mean Absolute Error (MAE)" in stats and "JawOpen:" in stats
    gen = pd.read_csv(tmp_path / "generated_facial_data_epoch_1.csv")
    # ~600 frames of 10 s at 60 fps, back in LiveLink scale
    assert 550 <= len(gen) <= 650
