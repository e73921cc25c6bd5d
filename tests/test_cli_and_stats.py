"""CLI flag parsing and the offline epoch-stats parser/plotters."""

import io
import os

import numpy as np
import pytest

from neurosync_trainer_lite_tpu.train import parse_config
from neurosync_trainer_lite_tpu.utils.epoch_stats import (
    find_stats_files,
    load_stats_history,
    parse_stats_file,
    plot_dimension_stats,
    plot_overall_stats,
)
from neurosync_trainer_lite_tpu.utils.stats import compute_comparison_stats


def test_cli_defaults_match_config():
    cfg, args = parse_config([])
    assert cfg.hidden_dim == 1024 and cfg.n_layers == 8
    assert args.profile is None


def test_cli_overrides():
    cfg, _ = parse_config(["--hidden_dim", "256", "--use_amp", "false",
                           "--learning_rate", "1e-4", "--mode", "resume"])
    assert cfg.hidden_dim == 256
    assert cfg.use_amp is False
    assert cfg.learning_rate == pytest.approx(1e-4)
    assert cfg.mode == "resume"


def test_cli_tiny_base_with_override():
    cfg, _ = parse_config(["--tiny", "--batch_size", "4"])
    assert cfg.n_layers == 4 and cfg.batch_size == 4 and cfg.use_amp is False


def _write_stats_epoch(tmp_path, epoch, scale):
    """Emit a stats file through the real writer path (stats → txt)."""
    from neurosync_trainer_lite_tpu.utils.stats import save_comparison_stats
    from neurosync_trainer_lite_tpu.utils.csv_io import (
        DIMENSION_LABELS, save_generated_data_as_csv)

    rng = np.random.default_rng(epoch)
    gt = rng.uniform(0, 1, (50, len(DIMENSION_LABELS)))
    gen = gt + scale * rng.standard_normal(gt.shape)
    gen_path = os.path.join(tmp_path, f"gen_{epoch}.csv")
    gt_path = os.path.join(tmp_path, "gt.csv")
    save_generated_data_as_csv(gen, gen_path)
    save_generated_data_as_csv(gt, gt_path)
    save_comparison_stats(gen_path, gt_path, os.path.join(
        tmp_path, f"comparison_stats_epoch_{epoch}.txt"))


def test_stats_roundtrip_and_plots(tmp_path):
    tmp = str(tmp_path)
    for epoch, scale in ((1, 0.3), (2, 0.2), (3, 0.1)):
        _write_stats_epoch(tmp, epoch, scale)

    files = find_stats_files(tmp)
    assert [e for e, _ in files] == [1, 2, 3]

    overall, per_dim = parse_stats_file(files[0][1])
    assert "Mean Absolute Error (MAE)" in overall
    assert len(per_dim) == 61
    assert all(len(v) == 5 for v in per_dim.values())

    epochs, overall_hist, dim_hist = load_stats_history(tmp)
    assert epochs == [1, 2, 3]
    # decreasing noise must yield decreasing MAE across epochs
    mae = overall_hist["Mean Absolute Error (MAE)"]
    assert mae[0] > mae[1] > mae[2]

    p1 = plot_overall_stats(tmp)
    p2 = plot_dimension_stats(tmp, "MAE")
    assert os.path.exists(p1) and os.path.exists(p2)
    with pytest.raises(ValueError):
        plot_dimension_stats(tmp, "NotAMetric")


def test_stats_guards():
    # constant dim → correlation NaN (guarded), zero truth → MAPE guarded
    gen = np.zeros((10, 3))
    gt = np.zeros((10, 3))
    overall, per_dim = compute_comparison_stats(gen, gt)
    assert overall["Mean Absolute Error (MAE)"] == 0.0
    assert np.isnan(overall["Correlation Coefficient (r)"])


def test_split_csv_by_frames(tmp_path):
    """Offline CSV splitter (reference split_csv.py:7-38): equal chunks with
    mirror padding on the short tail."""
    import pandas as pd
    from neurosync_trainer_lite_tpu.utils.csv_io import (
        DIMENSION_LABELS, save_generated_data_as_csv, split_csv_by_frames)

    rng = np.random.default_rng(0)
    data = rng.uniform(0, 1, (10, len(DIMENSION_LABELS)))
    src = str(tmp_path / "capture.csv")
    save_generated_data_as_csv(data, src)

    paths = split_csv_by_frames(src, str(tmp_path / "parts"), num_chunks=4)
    assert len(paths) == 4
    sizes = [len(pd.read_csv(p)) for p in paths]
    # reference semantics: chunk_size = 10//4 = 2; mirror-pad to 12 rows;
    # the last chunk absorbs padding + remainder (split_csv.py:14-33)
    assert sizes == [2, 2, 2, 6]
    last = pd.read_csv(paths[-1])
    full = pd.read_csv(src)
    # last chunk = rows 6..9 then rows 9,8 mirrored
    pd.testing.assert_series_equal(last.iloc[4], full.iloc[9], check_names=False)
    pd.testing.assert_series_equal(last.iloc[5], full.iloc[8], check_names=False)

    # evenly divisible: four equal chunks, no padding
    paths = split_csv_by_frames(src, str(tmp_path / "parts2"), num_chunks=2)
    assert [len(pd.read_csv(p)) for p in paths] == [5, 5]


def test_unused_reference_helper_surface():
    """The reference's unused research helpers exist with preserved semantics
    (audio_processing.py:114-140, load_audio.py:34-43,
    extract_features_utils.py:47-51)."""
    import numpy as np

    from neurosync_trainer_lite_tpu.inference.chunked import (
        add_specified_dimensions_back, zero_columns)
    from neurosync_trainer_lite_tpu.ops.frontend_np import smooth_features
    from neurosync_trainer_lite_tpu.utils.audio_io import (
        audio_to_bytes, load_audio_file_from_memory)

    data = np.ones((4, 61))
    z = zero_columns(data)
    assert z[:, 0].sum() == 0 and z[:, 17].sum() == 4  # JawOpen untouched
    assert data[:, 0].sum() == 4  # original not modified

    reduced = np.ones((3, 48))
    back = add_specified_dimensions_back(reduced)
    assert back.shape == (3, 68)
    assert back.sum() == reduced.sum()  # zeros in removed slots
    assert back[:, 0].sum() == 0  # a removed column stays zero

    x = np.array([[0.0], [2.0], [4.0]])
    np.testing.assert_array_equal(smooth_features(x), [[0], [1], [3]])

    wav = audio_to_bytes(np.sin(np.linspace(0, 100, 22050)).astype(np.float32),
                         22050)
    y, sr = load_audio_file_from_memory(wav, sr=22050)
    assert sr == 22050 and abs(np.abs(y).max() - 1.0) < 1e-6  # normalized


def test_persistent_cache_helper(tmp_path, monkeypatch):
    """enable_persistent_cache points JAX at a durable dir, honors the
    NEUROSYNC_XLA_CACHE override and the off switch."""
    import jax

    from neurosync_trainer_lite_tpu.utils.compilation_cache import (
        enable_persistent_cache)

    before = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "xla")
        assert enable_persistent_cache(d) == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        env_d = str(tmp_path / "from_env")
        monkeypatch.setenv("NEUROSYNC_XLA_CACHE", env_d)
        assert enable_persistent_cache() == env_d

        monkeypatch.setenv("NEUROSYNC_XLA_CACHE", "off")
        assert enable_persistent_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_float_wav_decodes_without_ffmpeg(tmp_path):
    """IEEE-float (format 3) WAVs — which the stdlib wave module rejects —
    must decode through the in-repo RIFF parser, not the ffmpeg fallback."""
    import wave as wave_mod
    from unittest import mock

    import scipy.io.wavfile as wavfile

    from neurosync_trainer_lite_tpu.utils import audio_io

    sr = 22050
    t = np.arange(sr) / sr
    y = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = os.path.join(str(tmp_path), "f32.wav")
    wavfile.write(path, sr, y)  # float32 payload => format tag 3

    with open(path, "rb") as f:
        data = f.read()
    with pytest.raises(wave_mod.Error):  # precondition: stdlib can't read it
        wave_mod.open(io.BytesIO(data))

    with mock.patch.object(audio_io, "_decode_via_ffmpeg",
                           side_effect=AssertionError("ffmpeg used")):
        out, out_sr = audio_io.load_audio(path, sr=sr)
    assert out_sr == sr
    np.testing.assert_allclose(out, y, atol=1e-7)

    # stereo + 64-bit floats mix down / narrow correctly
    y2 = np.stack([y, -y], axis=1).astype(np.float64)
    path2 = os.path.join(str(tmp_path), "f64st.wav")
    wavfile.write(path2, sr, y2)
    with mock.patch.object(audio_io, "_decode_via_ffmpeg",
                           side_effect=AssertionError("ffmpeg used")):
        out2, _ = audio_io.load_audio(path2, sr=sr)
    np.testing.assert_allclose(out2, np.zeros_like(y), atol=1e-7)


def test_corrupt_float_wav_rate_falls_back_to_ffmpeg(tmp_path):
    """A tag-3 WAV whose fmt chunk advertises sample rate 0 must raise
    ValueError from the RIFF parser (not ZeroDivisionError from Fraction in
    resample), so load_audio falls through to the ffmpeg decoder (r3 ADVICE)."""
    from unittest import mock

    import scipy.io.wavfile as wavfile

    from neurosync_trainer_lite_tpu.utils import audio_io

    sr = 22050
    y = (0.1 * np.sin(np.arange(sr) / 30.0)).astype(np.float32)
    path = os.path.join(str(tmp_path), "f32.wav")
    wavfile.write(path, sr, y)  # float32 payload => format tag 3
    with open(path, "rb") as f:
        data = bytearray(f.read())
    fmt_off = data.index(b"fmt ")
    data[fmt_off + 12: fmt_off + 16] = (0).to_bytes(4, "little")  # rate := 0

    with pytest.raises(ValueError, match="invalid WAV sample rate"):
        audio_io._decode_float_wav(bytes(data))

    sentinel = (np.zeros(8, np.float32), sr)
    with mock.patch.object(audio_io, "_decode_via_ffmpeg",
                           return_value=sentinel) as m:
        out, out_sr = audio_io.load_audio(bytes(data), sr=sr)
    assert m.called and out_sr == sr and out.shape == (8,)


def test_stats_tolerate_emotion_columns_in_ground_truth(tmp_path):
    """A ground-truth CSV carrying the 7 optional emotion columns (the
    68-column LiveLink layout csv_io can itself write) must still compare
    against 61-dim generated data."""
    from neurosync_trainer_lite_tpu.utils.csv_io import (
        DIMENSION_LABELS, save_generated_data_as_csv)
    from neurosync_trainer_lite_tpu.utils.stats import save_comparison_stats

    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (40, len(DIMENSION_LABELS) + 7))
    gen = gt[:, :61] + 0.01 * rng.standard_normal((40, 61))
    gt_path = os.path.join(str(tmp_path), "gt.csv")
    gen_path = os.path.join(str(tmp_path), "gen.csv")
    save_generated_data_as_csv(gt, gt_path, include_emotion_dimensions=True)
    save_generated_data_as_csv(gen, gen_path)
    stats_path = os.path.join(str(tmp_path), "comparison_stats_epoch_1.txt")
    save_comparison_stats(gen_path, gt_path, stats_path)
    assert os.path.exists(stats_path)
    text = open(stats_path).read()
    assert "Mean Absolute Error (MAE)" in text


def test_epoch_stats_alignment_with_missing_metric(tmp_path):
    """A metric absent from one epoch's file must leave a NaN gap at that
    epoch, not left-shift the series onto the wrong epochs."""
    tmp = str(tmp_path)
    for epoch, scale in ((1, 0.3), (2, 0.2), (3, 0.1)):
        _write_stats_epoch(tmp, epoch, scale)
    # strip the correlation line from epoch 1's file
    p1 = os.path.join(tmp, "comparison_stats_epoch_1.txt")
    lines = [ln for ln in open(p1)
             if not ln.startswith("Correlation Coefficient (r)")]
    open(p1, "w").writelines(lines)

    epochs, overall_hist, dim_hist = load_stats_history(tmp)
    assert epochs == [1, 2, 3]
    r = overall_hist["Correlation Coefficient (r)"]
    assert len(r) == 3 and np.isnan(r[0]) and not np.isnan(r[1])
    # untouched series stay dense and aligned
    mae = overall_hist["Mean Absolute Error (MAE)"]
    assert len(mae) == 3 and not np.any(np.isnan(mae))
    for stats in dim_hist.values():
        assert all(len(v) == 3 for v in stats.values())
    # plots still render with the gap
    assert os.path.exists(plot_overall_stats(tmp))
