"""Audio frontend parity: JAX/TPU path vs numpy twin vs definitional oracles.

The numpy twin (ops/frontend_np.py) is validated against definitional
re-computations here (scipy savgol, scipy dct, a literal per-frame
np.correlate autocorrelation loop matching the reference semantics at
extract_features_utils.py:83-92), and the JAX production path
(ops/frontend.py) is validated against the numpy twin.
"""

import numpy as np
import pytest
from scipy.signal import savgol_filter

from neurosync_trainer_lite_tpu.ops import frontend_np as F
from neurosync_trainer_lite_tpu.ops.frontend import (
    extract_audio_features_jax,
    _savgol_delta,
)

SR = 88200
FRAME = int(0.01667 * SR)   # 1470
HOP = FRAME // 2            # 735


@pytest.fixture(scope="module")
def speechlike():
    """~1.2 s of harmonic-plus-noise signal (speech-like spectral structure)."""
    rng = np.random.default_rng(42)
    t = np.arange(int(1.2 * SR)) / SR
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.5 * t)
    y = sum(np.sin(2 * np.pi * k * np.cumsum(f0) / SR) / k for k in range(1, 6))
    y += 0.05 * rng.standard_normal(t.shape)
    y *= np.clip(np.sin(2 * np.pi * 1.5 * t), 0.05, None)  # amplitude envelope
    return (y / np.abs(y).max()).astype(np.float32)


def test_frame_counts(speechlike):
    feats, _ = F.extract_audio_features_np(speechlike, SR)
    t120 = 1 + len(speechlike) // HOP
    expected_t60 = t120 // 2 + t120 % 2
    assert feats.shape == (expected_t60, 256)


def test_autocorr_matches_literal_loop(speechlike):
    """FFT-based autocorr == the definitional per-frame np.correlate loop."""
    y = speechlike[: 4 * FRAME]
    ours = F.autocorr_features(y, FRAME, HOP)

    # definitional oracle (reference semantics, extract_features_utils.py:54-102)
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
    oracle = np.array(rows).T           # [187, T]
    if np.all(np.abs(oracle[:, 0]) < 1e-7):
        oracle[:, 0] = oracle[:, 1]
    if np.all(np.abs(oracle[:, -1]) < 1e-7):
        oracle[:, -1] = oracle[:, -2]
    oracle = F.reduce_features(oracle).T

    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_delta_matches_scipy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((23, 40))
    for order in (1, 2):
        ref = savgol_filter(x, 9, polyorder=order, deriv=order,
                            axis=-1, mode="interp")
        np.testing.assert_allclose(F.delta(x, 9, order), ref, atol=1e-12)
        ours_jax = np.asarray(_savgol_delta(x.astype(np.float32), 9, order))
        np.testing.assert_allclose(ours_jax, ref, atol=1e-4)


def test_reduce_features_odd_even():
    x = np.arange(10, dtype=float).reshape(1, 10)
    np.testing.assert_array_equal(
        F.reduce_features(x), [[0.5, 2.5, 4.5, 6.5, 8.5]])
    x = np.arange(5, dtype=float).reshape(1, 5)
    np.testing.assert_array_equal(F.reduce_features(x), [[0.5, 2.5, 4.0]])


def test_mel_filterbank_properties():
    fb = F.mel_filterbank(SR, FRAME, 128)
    assert fb.shape == (128, 1 + FRAME // 2)
    assert (fb >= 0).all()
    # each filter is a single triangle: nonzero support is contiguous
    nz = fb[64] > 0
    idx = np.flatnonzero(nz)
    assert (np.diff(idx) == 1).all()
    # slaney normalization: peak value ≈ 2 / bandwidth_hz
    assert fb.max() < 1.0


def test_jax_matches_numpy(speechlike):
    ref, _ = F.extract_audio_features_np(speechlike, SR)
    ours, _ = extract_audio_features_jax(speechlike, SR)
    assert ours.shape == ref.shape
    # MFCC block (CMVN'd, O(1) magnitudes): absolute tolerance
    np.testing.assert_allclose(ours[:, :23], ref[:, :23], atol=5e-3)
    # deltas are small magnitude
    np.testing.assert_allclose(ours[:, 23:69], ref[:, 23:69], atol=5e-3)
    # autocorr block is in [-1, 1]
    np.testing.assert_allclose(ours[:, 69:], ref[:, 69:], atol=1e-4)


def test_too_short_returns_none():
    y = np.zeros(FRAME * 2, dtype=np.float32)
    feats, _ = F.extract_audio_features_np(y, SR)
    assert feats is None
    feats, _ = extract_audio_features_jax(y, SR)
    assert feats is None


def test_jax_matches_numpy_odd_frame_length(speechlike):
    """sr=44100 gives an odd frame_length (735) — the device frontend must
    use the strided-gather framing path and still match the host oracle."""
    sr = 44100
    y = speechlike[: sr * 2]
    ref, _ = F.extract_audio_features_np(y, sr)
    ours, _ = extract_audio_features_jax(y, sr)
    assert ours is not None and ref is not None
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=2e-3)


def test_autocorr_include_deltas_variant(speechlike):
    """The reference's off-by-default delta-stacked autocorr
    (extract_features_utils.py:116-135): 3x the lag rows."""
    fl = int(0.01667 * SR)
    base = F.autocorr_features(speechlike, fl, fl // 2)
    with_d = F.autocorr_features(speechlike, fl, fl // 2, include_deltas=True)
    assert with_d.shape == (base.shape[0], base.shape[1] * 3)
    np.testing.assert_allclose(with_d[:, :187], base, atol=1e-6)


def test_int16_entry_matches_host_normalized_float():
    """int16 PCM upload (device widen + peak-normalize) == the host loader's
    /32768 + peak-normalize followed by the float path, bitwise on the
    waveform and to fp32 tolerance on features."""
    rng = np.random.default_rng(11)
    i16 = (rng.standard_normal(SR) * 9000).astype(np.int16)

    y = i16.astype(np.float32) / 32768.0
    y /= np.max(np.abs(y))

    f_i16, y_i16 = extract_audio_features_jax(i16, SR)
    f_f32, _ = extract_audio_features_jax(y, SR)
    np.testing.assert_array_equal(np.asarray(y_i16), y)
    np.testing.assert_allclose(f_i16, f_f32, rtol=1e-5, atol=1e-5)


def test_bucketed_valid_length_extraction_matches_per_length():
    """The traced-valid-length frontend (zero-padded power-of-two buckets,
    ops/frontend.py:extract_features_valid) must reproduce the per-length
    extraction on the valid rows — for BOTH framing parities (even frame
    length sr=88200 and odd sr=44100), odd and even 120 fps frame counts,
    and multiple buckets."""
    from neurosync_trainer_lite_tpu.ops.frontend import (
        extract_audio_features_bucketed,
        extract_audio_features_jax,
    )

    rng = np.random.default_rng(17)
    for sr in (88200, 44100):
        for seconds in (1.7, 2.0, 2.35, 4.1):
            y = (rng.standard_normal(int(sr * seconds)) * 0.4
                 ).astype(np.float32)
            bucketed = extract_audio_features_bucketed(y, sr,
                                                       min_bucket=1 << 15)
            plain, _ = extract_audio_features_jax(y, sr)
            plain = np.asarray(plain)
            assert bucketed.shape == plain.shape
            np.testing.assert_allclose(bucketed, plain, atol=5e-6, rtol=1e-4)
