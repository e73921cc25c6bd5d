"""Freeze frontend goldens computed on REAL SPEECH (VERDICT r2 item #7).

The frontend's independent-oracle tests (tests/test_librosa_parity.py,
tests/test_frontend.py) previously ran on synthetic tones/noise only — but
the top_db clamp, CMVN statistics, and near-zero-energy edge frames engage
differently on real speech. This script reads the reference's actual capture
audio (/root/reference/dataset/test_set/audio.wav — 20.4 s of real speech,
44.1 kHz; read at GENERATION time only, the wav itself is not copied) through
our production loader (resample → 88.2 kHz, peak-normalize), picks a slice
containing both strong speech and near-silence, and freezes:

- y            — the 8 s real-speech slice (float32, post-loader)
- mfcc         — the INDEPENDENT composite MFCC oracle on that slice
                 (transformers.audio_utils + scipy — see
                 tools/make_frontend_goldens.py for why this reproduces
                 librosa)
- autocorr_raw — the DEFINITIONAL per-frame np.correlate oracle rows
                 [187, T] (reference semantics,
                 utils/audio/extraction/extract_features_utils.py:54-102)
- features256  — our frontend_np full 256-dim output (REGRESSION PIN, not an
                 independent oracle: guards the composed
                 MFCC+deltas+autocorr+CMVN chain against cross-round drift
                 on real speech)

tests/test_realspeech_goldens.py consumes the npz standalone.

Regenerate with:  python tools/make_realspeech_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_WAV = "/root/reference/dataset/test_set/audio.wav"
OUT = os.path.join(REPO, "tests", "fixtures", "realspeech_goldens.npz")

SR = 88200
FRAME = int(0.01667 * SR)   # 1470
HOP = FRAME // 2            # 735
SLICE_SECONDS = 8.0


def literal_autocorr_rows(y: np.ndarray) -> np.ndarray:
    """The definitional per-frame np.correlate oracle (reference:
    extract_features_utils.py:54-102), pre-reduction: [187, T]."""
    from neurosync_trainer_lite_tpu.ops import frontend_np as F

    pad = FRAME // 2
    y_pad = np.pad(y, pad, mode="reflect")
    n = 1 + (len(y_pad) - FRAME) // HOP
    win = F.hann_symmetric(FRAME)
    rows = []
    for i in range(n):
        fr = y_pad[i * HOP: i * HOP + FRAME].astype(np.float64)
        fr = (fr - fr.mean()) * win
        full = np.correlate(fr, fr, mode="full")
        wanted = full[FRAME - 1: FRAME - 1 + 188]
        if wanted[0] != 0:
            wanted = wanted / wanted[0]
        rows.append(wanted[1:])
    oracle = np.array(rows).T
    if np.all(np.abs(oracle[:, 0]) < 1e-7):
        oracle[:, 0] = oracle[:, 1]
    if np.all(np.abs(oracle[:, -1]) < 1e-7):
        oracle[:, -1] = oracle[:, -2]
    return oracle


def main():
    from neurosync_trainer_lite_tpu.ops import frontend_np as F
    from neurosync_trainer_lite_tpu.utils.audio_io import (
        load_and_preprocess_audio)
    from tools.make_frontend_goldens import independent_mfcc

    y_full, sr = load_and_preprocess_audio(REF_WAV, SR)
    assert sr == SR
    print(f"loaded {REF_WAV}: {len(y_full) / SR:.1f} s at {SR} Hz "
          f"(peak {np.abs(y_full).max():.3f})")

    # pick the 8 s slice with the LARGEST frame-energy dynamic range, so the
    # top_db clamp and near-zero-energy frames are genuinely exercised
    n_slice = int(SLICE_SECONDS * SR)
    frame_e = np.array([
        float(np.mean(np.square(y_full[i: i + FRAME])))
        for i in range(0, len(y_full) - FRAME, HOP)])
    best, best_range = 0, -1.0
    for s in range(0, len(y_full) - n_slice, SR):
        f0, f1 = s // HOP, (s + n_slice) // HOP
        e = frame_e[f0:f1]
        rng_db = 10 * np.log10(e.max() / max(e.min(), 1e-30))
        if rng_db > best_range:
            best, best_range = s, rng_db
    y = np.asarray(y_full[best: best + n_slice], np.float64)
    print(f"slice [{best / SR:.1f}s, {(best + n_slice) / SR:.1f}s): "
          f"frame-energy dynamic range {best_range:.1f} dB")

    mfcc = independent_mfcc(y)
    # verify the top_db clamp actually engaged on this slice (the flooring
    # happens inside power_to_db; re-derive from our pipeline pieces)
    S = F.power_spectrogram(y, FRAME, HOP)
    mel = F.mel_filterbank(SR, FRAME, 128) @ S
    db = F.power_to_db(mel, amin=1e-10, top_db=80.0)
    clamped = int((db == db.max() - 80.0).sum())
    assert clamped > 0, "slice does not engage the top_db clamp — pick another"
    print(f"top_db clamp engaged on {clamped} mel-power values")

    autocorr_raw = literal_autocorr_rows(y)
    features256, _ = F.extract_audio_features_np(
        np.asarray(y, np.float32), SR)

    np.savez_compressed(
        OUT, y=np.asarray(y, np.float32), mfcc=mfcc,
        autocorr_raw=autocorr_raw, features256=features256,
        sr=SR, n_fft=FRAME, hop=HOP, topdb_clamped_count=clamped,
        slice_start_seconds=best / SR, dynamic_range_db=best_range)
    print(f"written {OUT}: mfcc {mfcc.shape}, autocorr {autocorr_raw.shape}, "
          f"features {features256.shape}")


if __name__ == "__main__":
    main()
