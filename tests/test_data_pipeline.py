"""Data pipeline: folder ingestion, augmentation, caching, lazy windowing."""

import os

import numpy as np
import pandas as pd
import pytest

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.data.processing import (
    collect_features,
    interpolate_slower,
    load_data,
    process_folder,
    smooth_facial_data,
    stack_with_blend,
)
from neurosync_trainer_lite_tpu.data.windowing import WindowedDataset
from neurosync_trainer_lite_tpu.utils.audio_io import save_audio_file
from neurosync_trainer_lite_tpu.utils.csv_io import BASE_COLUMNS

SR = 88200


def make_capture_folder(root, name, seconds=3.0, facial_frames=None, rng=None):
    """Synthesize a capture folder: wav + iPhone_cal facial CSV."""
    rng = rng or np.random.default_rng(0)
    folder = os.path.join(root, name)
    os.makedirs(folder, exist_ok=True)
    t = np.arange(int(seconds * SR)) / SR
    y = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(t.shape)
    save_audio_file(y / np.abs(y).max(), SR, os.path.join(folder, "audio.wav"))

    if facial_frames is None:
        t120 = 1 + len(t) // 735
        facial_frames = t120 // 2 + t120 % 2
    blend = rng.uniform(0, 0.8, size=(facial_frames, 61)).astype(np.float32)
    df = pd.DataFrame(blend, columns=BASE_COLUMNS[2:])
    df.insert(0, "BlendshapeCount", 61)
    df.insert(0, "Timecode", [f"00:00:{i//60:02}:{i%60:02}.000"
                              for i in range(facial_frames)])
    df.to_csv(os.path.join(folder, f"{name}_iPhone_cal.csv"), index=False)
    return folder, blend


def test_interpolate_slower():
    x = np.array([[0.0], [2.0], [4.0]])
    out = interpolate_slower(x)
    np.testing.assert_array_equal(out, [[0], [1], [2], [3], [4]])


def test_stack_with_blend():
    a = np.arange(10, dtype=float).reshape(10, 1)
    b = np.arange(100, 110, dtype=float).reshape(10, 1)
    out = stack_with_blend([a, b], blend_frames=4)
    assert out.shape == (16, 1)
    np.testing.assert_array_equal(out[:6], a[:6])
    w1 = np.linspace(1, 0, 4)
    w2 = np.linspace(0, 1, 4)
    np.testing.assert_allclose(out[6:10, 0], w1 * a[6:, 0] + w2 * b[:4, 0])
    np.testing.assert_array_equal(out[10:], b[4:])


def test_stack_with_blend_matches_serial_oracle_running_caps():
    """Join caps depend on the RUNNING result length, not the previous
    original sequence (regression: r2 review) — exercised with a middle
    sequence shorter than blend_frames."""
    rng = np.random.default_rng(0)

    def oracle(sequences, blend_frames):
        # literal transcription of the reference's serial loop
        # (data_processing.py:179-197)
        result = sequences[0]
        for seq in sequences[1:]:
            n = min(blend_frames, result.shape[0], seq.shape[0])
            if n <= 0:
                result = np.vstack([result, seq])
            else:
                w1 = np.linspace(1, 0, n).reshape(n, 1)
                w2 = np.linspace(0, 1, n).reshape(n, 1)
                blended = w1 * result[-n:] + w2 * seq[:n]
                result = np.vstack([result[:-n], blended, seq[n:]])
        return result

    cases = [
        [rng.random((50, 3)), rng.random((25, 3)), rng.random((99, 3))],
        [rng.random((2, 3)), rng.random((40, 3)), rng.random((5, 3))],
        [rng.random((10, 3)), rng.random((10, 3))],
        [rng.random((7, 2)), rng.random((3, 2)), rng.random((3, 2)),
         rng.random((60, 2))],
    ]
    for seqs in cases:
        expect = oracle(seqs, 30)
        got = stack_with_blend(seqs, 30)
        assert got.shape == expect.shape, [s.shape for s in seqs]
        np.testing.assert_allclose(got, expect, atol=1e-12)


def test_smooth_facial_data():
    x = np.array([[0.0], [2.0], [4.0]])
    np.testing.assert_array_equal(smooth_facial_data(x), [[0], [1], [3]])


def test_process_folder_and_cache(tmp_path):
    folder, blend = make_capture_folder(str(tmp_path), "clipA")
    audio, facial = process_folder(folder, SR)
    assert audio is not None
    # fast version + 30-frame blend: total = T + (T//2 + T%2) - 30
    T = len(blend)
    fastT = (T + 1) // 2
    assert len(audio) == len(facial) == T + fastT - 30
    assert audio.shape[1] == 256 and facial.shape[1] == 61
    # ×100 scaling applied to facial data
    assert facial.max() > 10
    # cache was written and is loadable: second call must give identical audio
    assert os.path.exists(os.path.join(folder, "audio_features.csv"))
    audio2, _ = process_folder(folder, SR)
    np.testing.assert_allclose(audio2, audio, atol=1e-5)


def test_load_data_walks_folders(tmp_path):
    make_capture_folder(str(tmp_path), "c1", seconds=2.5)
    make_capture_folder(str(tmp_path), "c2", seconds=2.5)
    os.makedirs(tmp_path / "empty_dir")
    processed = set()
    clips = load_data(str(tmp_path), SR, processed)
    assert len(clips) == 2
    assert processed == {"c1", "c2"}


def test_windowing_counts_and_gather():
    rng = np.random.default_rng(1)
    T = 300
    a = rng.standard_normal((T, 8)).astype(np.float32)
    f = rng.standard_normal((T, 4)).astype(np.float32)
    ds = WindowedDataset([(a, f)], window=128)
    # stride-1 windows + duplicated tail (300 % 128 != 0)
    assert len(ds) == (T - 128 + 1) + 1
    s0, t0 = ds[0]
    np.testing.assert_array_equal(s0, a[:128])
    s_last, t_last = ds[len(ds) - 1]
    np.testing.assert_array_equal(s_last, a[T - 128: T])
    src, trg = ds.gather(np.array([0, 5, len(ds) - 1]))
    assert src.shape == (3, 128, 8) and trg.shape == (3, 128, 4)
    np.testing.assert_array_equal(src[1], a[5:133])


def test_windowing_exact_multiple_no_tail():
    a = np.zeros((256, 3), np.float32)
    f = np.zeros((256, 2), np.float32)
    ds = WindowedDataset([(a, f)], window=128)
    assert len(ds) == 256 - 128 + 1  # no duplicate tail when T % 128 == 0


def test_split_deterministic_and_disjoint():
    a = np.zeros((400, 3), np.float32)
    f = np.zeros((400, 2), np.float32)
    ds = WindowedDataset([(a, f)], window=128)
    tr1, va1 = ds.split(0.1, seed=7)
    tr2, va2 = ds.split(0.1, seed=7)
    np.testing.assert_array_equal(tr1.idxs, tr2.idxs)
    assert len(set(tr1.idxs) & set(va1.idxs)) == 0
    assert len(tr1) + len(va1) == len(ds)
    assert len(va1) == int(0.1 * len(ds))


def test_batches_shapes_and_drop_last():
    a = np.random.default_rng(0).standard_normal((200, 5)).astype(np.float32)
    f = np.zeros((200, 2), np.float32)
    ds = WindowedDataset([(a, f)], window=64)
    n = len(ds)
    bs = 32
    batches = list(ds.batches(bs, shuffle=True, seed=0, drop_last=True))
    assert len(batches) == n // bs
    assert all(b[0].shape == (bs, 64, 5) for b in batches)
    wrapped = list(ds.batches(bs, wrap=True))
    assert all(b[0].shape[0] == bs for b in wrapped)
    # shuffling is seeded
    b1 = next(iter(ds.batches(bs, shuffle=True, seed=3)))
    b2 = next(iter(ds.batches(bs, shuffle=True, seed=3)))
    np.testing.assert_array_equal(b1[0], b2[0])


def test_extract_audio_features_integer_ndarray_guard():
    """Integer-PCM ndarrays fed straight into extract_audio_features (the
    streaming surface) must be widened + peak-normalized like the loaders —
    a silent float cast would feed ±32767-amplitude garbage (ADVICE r2)."""
    from neurosync_trainer_lite_tpu.data.processing import extract_audio_features

    rng = np.random.default_rng(0)
    t = np.arange(int(1.5 * SR)) / SR
    y = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    y_norm = y / np.abs(y).max()

    ref_feats, _ = extract_audio_features(y_norm, SR)

    y_i16 = np.clip(y_norm * 32767, -32768, 32767).astype(np.int16)
    i16_feats, _ = extract_audio_features(y_i16, SR)
    np.testing.assert_allclose(i16_feats, ref_feats, atol=0.15)

    y_i32 = (y_i16.astype(np.int64) << 16).astype(np.int32)
    i32_feats, _ = extract_audio_features(y_i32, SR)
    np.testing.assert_allclose(i32_feats, i16_feats, atol=1e-3)
