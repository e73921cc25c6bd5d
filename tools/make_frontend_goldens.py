"""Precompute frontend goldens from an INDEPENDENT third-party implementation.

librosa cannot be installed in this environment (zero egress), so the round-1
gap "validate the MFCC path against actual librosa output" is closed with the
closest available independent implementation: `transformers.audio_utils`,
whose mel_filter_bank / spectrogram / power_to_db were written (by the
HuggingFace team, independently of this repo) to reproduce librosa's numerics
for Whisper feature extraction, plus scipy.fft.dct — the very function
librosa.feature.mfcc delegates its DCT to.

Composing them reproduces librosa.feature.mfcc(y, sr, n_mfcc, n_fft, hop)
with modern-librosa defaults (center=True, pad_mode='constant', hann-periodic
window, 128 Slaney mels with slaney norm to sr/2, power_to_db ref=1 amin=1e-10
top_db=80, orthonormal DCT-II). The composite output is frozen here as
tests/fixtures/frontend_goldens.npz; tests/test_librosa_parity.py asserts our
re-derived frontend against both the live composite and this frozen golden.

Regenerate with:  python tools/make_frontend_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import scipy.fft

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 88200
FRAME_LENGTH = int(0.01667 * SR)   # 1470 — the reference's production geometry
HOP = FRAME_LENGTH // 2            # 735
N_MFCC = 23
N_MELS = 128


def independent_mfcc(y: np.ndarray, sr: int = SR, n_mfcc: int = N_MFCC,
                     n_fft: int = FRAME_LENGTH, hop: int = HOP) -> np.ndarray:
    """librosa.feature.mfcc reproduced from transformers.audio_utils + scipy."""
    from transformers.audio_utils import (
        mel_filter_bank, power_to_db, spectrogram, window_function)

    win = window_function(n_fft, "hann")  # periodic hann, librosa's default
    filters = mel_filter_bank(
        num_frequency_bins=1 + n_fft // 2, num_mel_filters=N_MELS,
        min_frequency=0.0, max_frequency=sr / 2.0, sampling_rate=sr,
        norm="slaney", mel_scale="slaney")
    mel_spec = spectrogram(
        np.asarray(y, np.float64), win, frame_length=n_fft, hop_length=hop,
        fft_length=n_fft, power=2.0, center=True, pad_mode="constant",
        mel_filters=filters, mel_floor=0.0, dtype=np.float64)
    log_mel = power_to_db(mel_spec, reference=1.0, min_value=1e-10,
                          db_range=80.0)
    return scipy.fft.dct(log_mel, axis=0, type=2, norm="ortho")[:n_mfcc]


def main():
    rng = np.random.default_rng(123)
    # ~1.5 s of structured audio: tones + noise, with a silent gap to
    # exercise the top_db clamp and near-zero frames
    n = int(1.5 * SR)
    t = np.arange(n) / SR
    y = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.25 * np.sin(2 * np.pi * 1330 * t)
         + 0.1 * rng.standard_normal(n)).astype(np.float64)
    y[int(0.7 * SR): int(0.9 * SR)] *= 1e-6  # near-silence region

    golden_mfcc = independent_mfcc(y)

    out = os.path.join(REPO, "tests", "fixtures", "frontend_goldens.npz")
    np.savez_compressed(out, y=y.astype(np.float32), mfcc=golden_mfcc,
                        sr=SR, n_fft=FRAME_LENGTH, hop=HOP, n_mfcc=N_MFCC)
    print(f"written {out}: mfcc {golden_mfcc.shape}")


if __name__ == "__main__":
    main()
