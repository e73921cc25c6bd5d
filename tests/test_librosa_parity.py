"""MFCC-path parity against independent third-party implementations.

Round-1 verdict gap #2: the frontend was validated only against oracles
re-derived by this repo's author; a shared misreading of librosa's internals
(mel filterbank construction, stft padding, power_to_db's global-max top_db
clamp, DCT normalization) would have passed every test. librosa itself cannot
be installed here (zero egress), so the gap is closed with implementations
written independently of this repo:

- `transformers.audio_utils` (HuggingFace): mel_filter_bank / spectrogram /
  power_to_db, written to reproduce librosa numerics for Whisper
- `scipy.fft.dct` — the exact function librosa.feature.mfcc delegates to
- `scipy.signal.get_window` — the exact function librosa windows come from

plus the frozen composite golden tests/fixtures/frontend_goldens.npz
(tools/make_frontend_goldens.py) so the guard holds even if transformers'
API moves. The autocorrelation half needs no such oracle: the reference
computes it with raw np.correlate (not librosa), and test_frontend.py already
pins our FFT form against a literal per-frame np.correlate loop.
"""

import os

import numpy as np
import pytest
import scipy.fft
import scipy.signal

from neurosync_trainer_lite_tpu.ops import frontend_np as fnp

SR = 88200
N_FFT = int(0.01667 * SR)  # 1470
HOP = N_FFT // 2
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "frontend_goldens.npz")


def test_mel_filterbank_matches_huggingface_slaney():
    from transformers.audio_utils import mel_filter_bank

    theirs = mel_filter_bank(
        num_frequency_bins=1 + N_FFT // 2, num_mel_filters=128,
        min_frequency=0.0, max_frequency=SR / 2.0, sampling_rate=SR,
        norm="slaney", mel_scale="slaney")  # [freq, mel]
    ours = fnp.mel_filterbank(SR, N_FFT, 128)  # [mel, freq]
    np.testing.assert_allclose(ours, theirs.T, atol=1e-12)


def test_power_to_db_matches_huggingface_including_topdb_clamp():
    from transformers.audio_utils import power_to_db

    rng = np.random.default_rng(0)
    # spans >80 dB so the global-max-relative top_db clamp actually bites
    S = 10.0 ** rng.uniform(-12, 2, size=(64, 50))
    theirs = power_to_db(S, reference=1.0, min_value=1e-10, db_range=80.0)
    ours = fnp.power_to_db(S, amin=1e-10, top_db=80.0)
    assert (ours == ours.max() - 80.0).any()  # clamp engaged
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_dct_matrix_matches_scipy_ortho():
    # librosa.feature.mfcc: scipy.fftpack.dct(S, axis=-2, type=2, norm='ortho')
    eye = np.eye(128)
    theirs = scipy.fft.dct(eye, axis=0, type=2, norm="ortho")[:23]
    ours = fnp.dct_ii_ortho_matrix(23, 128)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_windows_match_scipy():
    # librosa stft: get_window('hann', n, fftbins=True); autocorr: np.hanning
    np.testing.assert_allclose(
        fnp.hann_periodic(N_FFT),
        scipy.signal.get_window("hann", N_FFT, fftbins=True), atol=1e-12)
    np.testing.assert_allclose(
        fnp.hann_symmetric(N_FFT), np.hanning(N_FFT), atol=1e-12)


def test_full_mfcc_matches_independent_composite_live():
    from tools.make_frontend_goldens import independent_mfcc

    rng = np.random.default_rng(1)
    y = (0.4 * np.sin(2 * np.pi * 180 * np.arange(SR) / SR)
         + 0.05 * rng.standard_normal(SR))
    theirs = independent_mfcc(y)
    ours = fnp.mfcc(y, SR, 23, N_FFT, HOP)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_full_mfcc_matches_frozen_golden():
    g = np.load(FIXTURE)
    ours = fnp.mfcc(np.asarray(g["y"], np.float64), int(g["sr"]),
                    int(g["n_mfcc"]), int(g["n_fft"]), int(g["hop"]))
    assert ours.shape == g["mfcc"].shape
    np.testing.assert_allclose(ours, g["mfcc"], atol=1e-5)


def test_device_frontend_matches_host_on_golden_audio():
    """The JAX path agrees with the (now independently-validated) host path
    on the committed golden waveform, end to end through the 256-dim stack."""
    from neurosync_trainer_lite_tpu.ops.frontend import (
        extract_audio_features_jax)

    g = np.load(FIXTURE)
    y = np.asarray(g["y"], np.float32)
    host, _ = fnp.extract_audio_features_np(y, SR)
    dev, _ = extract_audio_features_jax(y, SR)
    np.testing.assert_allclose(np.asarray(dev), host, atol=2e-4, rtol=2e-3)
