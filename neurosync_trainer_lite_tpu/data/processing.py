"""Per-folder feature collection, length matching, and speed augmentation.

Semantics match the reference (reference: dataset/data_processing.py):
- audio features cached to / loaded from 'audio_features.csv' (:112-120)
- facial CSV loaded with Timecode/BlendshapeCount dropped (:8, :123)
- center-trim so audio/facial lengths match (:126-145)
- blendshape values scaled ×100 before training (:68)
- augmentation: 'fast' = every-2nd-frame (:151-158); 'slow' = 2N-1 midpoint
  interpolation + pairwise smoothing (:84-106, :161-167)
- versions concatenated with a blend_frames-long linear cross-fade
  (stack_with_blend, :179-197)

The feature extractor runs on the TPU by default (ops/frontend.py) with the
numpy twin as fallback — either way values match the reference math.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from neurosync_trainer_lite_tpu.data.ingest import find_files, get_audio
from neurosync_trainer_lite_tpu.utils.audio_io import load_and_preprocess_audio

COLUMNS_TO_DROP = ["Timecode", "BlendshapeCount"]

# blendshapes train in x100 space and serve in LiveLink [0,1] space
# (reference: data_processing.py:68 and audio_processing.py:102)
BLENDSHAPE_SCALE = 100.0

# dims that are pure noise in Lite capture (blinks/neck), for the optional
# zeroing helpers (reference: data_processing.py:208-219)
SPECIFIED_COLUMNS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
                     51, 52, 53, 54, 55, 56, 57, 58, 59, 60)


def extract_audio_features(audio_input, sr: int = 88200, from_bytes: bool = False,
                           use_device: bool = True):
    """Audio path/bytes/array → (features[T,256], waveform) (reference:
    extract_features.py:6-24). Runs the device frontend when available.
    An ndarray input is taken as an already-decoded mono waveform at sr
    (the streaming path feeds raw sample buffers directly)."""
    from neurosync_trainer_lite_tpu.utils.audio_io import load_audio_from_bytes

    if isinstance(audio_input, np.ndarray):
        y = np.asarray(audio_input).reshape(-1)
        if np.issubdtype(y.dtype, np.integer):
            # widen by the dtype's full scale + peak-normalize, matching the
            # loaders' semantics — a silent float32 cast would feed
            # raw-amplitude PCM (e.g. ±32767) into the frontend (ADVICE r2).
            # int16 keeps its raw-upload device fast path (widened +
            # normalized on device, bitwise-identical).
            if y.dtype != np.int16:
                from neurosync_trainer_lite_tpu.ops.frontend import widen_int_pcm

                y = widen_int_pcm(y)
                peak = np.max(np.abs(y)) if y.size else 0.0
                if peak > 0:
                    y = y / peak
        else:
            y = np.asarray(y, np.float32)
    elif from_bytes:
        y, sr = load_audio_from_bytes(audio_input, sr)
    else:
        y, sr = load_and_preprocess_audio(audio_input, sr)
    if use_device:
        try:
            from neurosync_trainer_lite_tpu.ops.frontend import (
                extract_audio_features_jax,
            )

            return extract_audio_features_jax(y, sr)
        except Exception as e:  # pragma: no cover - device fallback
            print(f"device frontend failed ({e}); falling back to host")
    from neurosync_trainer_lite_tpu.ops.frontend_np import extract_audio_features_np

    if y.dtype == np.int16:  # host twin wants float: widen + peak-normalize
        y = y.astype(np.float32) / 32768.0
        peak = np.max(np.abs(y)) if y.size else 0.0
        if peak > 0:
            y = y / peak
    return extract_audio_features_np(y, sr)


def smooth_facial_data(facial_data: np.ndarray) -> np.ndarray:
    """Pairwise smoothing (reference: data_processing.py:201-204)."""
    smoothed = np.copy(facial_data)
    smoothed[1:] = (facial_data[:-1] + facial_data[1:]) / 2
    return smoothed


def interpolate_slower(data: np.ndarray) -> np.ndarray:
    """(N,F) → (2N-1,F) with midpoints inserted (reference:
    data_processing.py:84-106), vectorized."""
    N = data.shape[0]
    out = np.empty((2 * N - 1, data.shape[1]), dtype=data.dtype)
    out[0::2] = data
    out[1::2] = (data[:-1] + data[1:]) / 2.0
    return out


def stack_with_blend(sequences: list[np.ndarray], blend_frames: int) -> np.ndarray | None:
    """Concatenate versions with a linear cross-fade at each boundary.

    Semantic transcription of the reference's boundary blend
    (data_processing.py:179-197): at each join, the last n frames of the
    running result fade out against the first n frames of the next sequence
    (n = blend_frames capped by both lengths, ramp endpoints inclusive), so
    every join consumes n frames of total length. Implemented as a single
    preallocated output with in-place fades rather than repeated vstacks.
    """
    if not sequences:
        return None
    if len(sequences) == 1:
        # copy: returning the caller's array aliased would let downstream
        # in-place edits mutate the original sequence
        return sequences[0].copy()
    # each join fades against the RUNNING result, so its cap depends on the
    # accumulated length so far (matters when a middle sequence is shorter
    # than blend_frames)
    caps, running = [], sequences[0].shape[0]
    for seq in sequences[1:]:
        n = min(blend_frames, running, seq.shape[0])
        caps.append(n)
        running += seq.shape[0] - n
    total = running
    # float64 promotion matches the fp64 linspace ramps the reference blends
    # with (and our previous vstack-based implementation)
    out = np.empty((total, sequences[0].shape[1]),
                   dtype=np.result_type(np.float64, *sequences))
    pos = 0
    out[: len(sequences[0])] = sequences[0]
    pos = len(sequences[0])
    for seq, n in zip(sequences[1:], caps):
        if n > 0:
            fade_in = np.linspace(0.0, 1.0, n)[:, None]
            out[pos - n: pos] *= 1.0 - fade_in
            out[pos - n: pos] += fade_in * seq[:n]
        out[pos: pos + len(seq) - n] = seq[n:]
        pos += len(seq) - n
    return out


def scale_facial_data(facial_data: np.ndarray, scale_factor: float = 1.1) -> np.ndarray:
    """Clip-scaled copy (reference: data_processing.py:28-41), vectorized."""
    return np.clip(facial_data * scale_factor, -1, 1)


def zero_specified_columns(facial_data: np.ndarray) -> np.ndarray:
    facial_data[:, list(SPECIFIED_COLUMNS)] = 0
    return facial_data


def remove_specified_dimensions(facial_data: np.ndarray) -> np.ndarray:
    return np.delete(facial_data, list(SPECIFIED_COLUMNS), axis=1)


def collect_features(audio_path, audio_features_csv_path, facial_csv_path, sr,
                     include_fast: bool = True, include_slow: bool = False,
                     blend_boundaries: bool = True, blend_frames: int = 30):
    """Load-or-extract audio features + facial CSV, match lengths, build
    augmented versions (reference: data_processing.py:108-177)."""
    if os.path.exists(audio_features_csv_path):
        print(f"feature cache hit: {audio_features_csv_path}")
        audio_features = pd.read_csv(audio_features_csv_path).values
    else:
        print(f"feature cache miss — extracting: {audio_path}")
        audio_features, _ = extract_audio_features(audio_path, sr)
        if audio_features is not None:
            pd.DataFrame(np.asarray(audio_features)).to_csv(
                audio_features_csv_path, index=False)
            print(f"feature cache written: {audio_features_csv_path}")

    facial_data = pd.read_csv(facial_csv_path).drop(columns=COLUMNS_TO_DROP).values

    if audio_features is None or facial_data is None:
        return None, None

    # center-trim the longer stream (reference: :126-145)
    len_audio, len_facial = len(audio_features), len(facial_data)
    if len_audio > len_facial:
        diff = len_audio - len_facial
        left = diff // 2
        audio_features = audio_features[left: len_audio - (diff - left)]
    elif len_facial > len_audio:
        diff = len_facial - len_audio
        left = diff // 2
        facial_data = facial_data[left: len_facial - (diff - left)]
    min_length = min(len(audio_features), len(facial_data))
    audio_features = audio_features[:min_length]
    facial_data = facial_data[:min_length]

    audio_versions = [audio_features]
    facial_versions = [facial_data]

    if include_fast:
        audio_versions.append(audio_features[::2].copy())
        facial_versions.append(facial_data[::2].copy())

    if include_slow:
        audio_versions.append(interpolate_slower(audio_features))
        facial_versions.append(smooth_facial_data(interpolate_slower(facial_data)))

    if blend_boundaries:
        return (stack_with_blend(audio_versions, blend_frames),
                stack_with_blend(facial_versions, blend_frames))
    return np.vstack(audio_versions), np.vstack(facial_versions)


def process_folder(folder_path: str, sr: int,
                   apply_smoothing: bool = False, apply_over_scale: bool = False,
                   ffmpeg_path: str = "ffmpeg", **collect_kwargs):
    """One capture folder → (audio_features, facial_data ×100)
    (reference: data_processing.py:44-78)."""
    files = find_files(folder_path)
    if not files.facial_csv_path:
        return None, None
    if not (files.video_path or files.wav_path
            or os.path.exists(files.audio_features_csv_path)):
        return None, None

    audio_path = None
    if files.video_path or files.wav_path:
        audio_path = get_audio(files, folder_path, sr, ffmpeg_path)
    if not audio_path and not os.path.exists(files.audio_features_csv_path):
        return None, None

    audio_features, facial_data = collect_features(
        audio_path, files.audio_features_csv_path, files.facial_csv_path, sr,
        **collect_kwargs)
    if audio_features is None or facial_data is None:
        return None, None

    if apply_over_scale:
        facial_data = scale_facial_data(facial_data)

    facial_data = np.asarray(facial_data, dtype=np.float64)
    facial_data[:, :61] *= BLENDSHAPE_SCALE  # training space (reference: :68)

    if apply_smoothing:
        facial_data = smooth_facial_data(facial_data)

    return audio_features, facial_data


def load_data(root_dir: str, sr: int, processed_folders: set | None = None,
              **kwargs) -> list[tuple[np.ndarray, np.ndarray]]:
    """Walk capture folders → [(audio_features, facial_data), ...]
    (reference: data_processing.py:10-26)."""
    if processed_folders is None:
        processed_folders = set()
    examples = []
    for folder in sorted(os.listdir(root_dir)):
        folder_path = os.path.join(root_dir, folder)
        if os.path.isdir(folder_path) and folder not in processed_folders:
            audio_features, facial_data = process_folder(folder_path, sr, **kwargs)
            if audio_features is not None and facial_data is not None:
                examples.append((audio_features, facial_data))
                processed_folders.add(folder)
    return examples
