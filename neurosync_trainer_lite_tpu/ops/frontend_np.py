"""Host (numpy) audio feature frontend — the semantic reference.

Re-derivation, from first principles, of the feature math the reference gets
from librosa (reference: utils/audio/extraction/extract_features.py:6-46 and
extract_features_utils.py):

  features[T, 256] = hstack(
      MFCC(23) + CMVN + delta + delta2  (69 dims, extract_features_utils.py:11-30),
      autocorrelation (187 lags, zero-lag-normalized, :54-113),
  ) pair-averaged from 120 fps to 60 fps (:33-44)

with frame_length = int(0.01667*sr) (≈1470 @ 88.2 kHz ≈ 60 fps) and
hop = frame_length // 2 (extract_features.py:12-13).

librosa itself is NOT a dependency: the mel filterbank (Slaney scale, slaney
norm), STFT (hann-periodic window, centered, zero pad), power_to_db
(amin=1e-10, top_db=80), DCT-II(ortho) and Savitzky-Golay delta
(width 9, mode='interp') are implemented here from their published
definitions. scipy is used only for the savgol filter.

This module doubles as the golden oracle for the JAX/TPU implementation
(ops/frontend.py) and as a host-side fallback.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import savgol_filter

# ---------------------------------------------------------------------------
# constant builders (shared with the JAX path)
# ---------------------------------------------------------------------------


def hann_periodic(n: int) -> np.ndarray:
    """'hann' with fftbins=True, as used by STFT windows."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def hann_symmetric(n: int) -> np.ndarray:
    """np.hanning — symmetric Hann, used by the autocorrelation frontend."""
    if n == 1:
        return np.ones(1)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )
    return freqs


def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank [n_mels, 1+n_fft//2]."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.arange(1 + n_fft // 2, dtype=np.float64) * sr / n_fft
    mel_pts = np.linspace(
        _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)  # [n_mels+2]

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney normalization: each triangle integrates to ~2/bandwidth
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    weights *= enorm[:, None]
    return weights.astype(np.float64)


def dct_ii_ortho_matrix(n_out: int, n_in: int) -> np.ndarray:
    """First n_out rows of the orthonormal DCT-II matrix [n_out, n_in]."""
    n = np.arange(n_in, dtype=np.float64)
    k = np.arange(n_out, dtype=np.float64)[:, None]
    M = np.cos(np.pi * k * (2.0 * n[None, :] + 1.0) / (2.0 * n_in))
    M *= np.sqrt(2.0 / n_in)
    M[0] /= np.sqrt(2.0)
    return M


# ---------------------------------------------------------------------------
# STFT → mel → MFCC
# ---------------------------------------------------------------------------


def frame_signal(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """Frame a 1-D signal → [num_frames, frame_length]."""
    num_frames = 1 + (len(y) - frame_length) // hop_length
    idx = (np.arange(num_frames)[:, None] * hop_length
           + np.arange(frame_length)[None, :])
    return y[idx]


def power_spectrogram(y: np.ndarray, n_fft: int, hop_length: int) -> np.ndarray:
    """Centered, zero-padded, hann-periodic power STFT → [1+n_fft//2, T]."""
    y_pad = np.pad(y, n_fft // 2, mode="constant")
    frames = frame_signal(y_pad, n_fft, hop_length)
    win = hann_periodic(n_fft)
    spec = np.fft.rfft(frames * win[None, :], n=n_fft, axis=-1)
    return (np.abs(spec) ** 2).T


def power_to_db(S: np.ndarray, amin: float = 1e-10, top_db: float = 80.0) -> np.ndarray:
    S_db = 10.0 * np.log10(np.maximum(amin, S))
    if top_db is not None:
        S_db = np.maximum(S_db, S_db.max() - top_db)
    return S_db


def mfcc(y: np.ndarray, sr: int, n_mfcc: int, n_fft: int, hop_length: int,
         n_mels: int = 128) -> np.ndarray:
    """MFCC [n_mfcc, T] matching librosa.feature.mfcc defaults."""
    S = power_spectrogram(y, n_fft, hop_length)
    mel = mel_filterbank(sr, n_fft, n_mels) @ S
    mel_db = power_to_db(mel)
    return dct_ii_ortho_matrix(n_mfcc, n_mels) @ mel_db


def cmvn(x: np.ndarray) -> np.ndarray:
    """Cepstral mean/variance normalization over time (axis=1)
    (reference: extract_features_utils.py:5-8)."""
    mean = np.mean(x, axis=1, keepdims=True)
    std = np.std(x, axis=1, keepdims=True)
    return (x - mean) / (std + 1e-10)


def delta(x: np.ndarray, width: int = 9, order: int = 1) -> np.ndarray:
    """librosa.feature.delta semantics: savgol(width, polyorder=order,
    deriv=order, mode='interp') along time (axis=-1)."""
    return savgol_filter(x, window_length=width, polyorder=order,
                         deriv=order, axis=-1, mode="interp")


def smooth_features(features: np.ndarray) -> np.ndarray:
    """Pairwise running smoother over leading-axis frames (reference:
    extract_features_utils.py:47-51, unused-by-default helper — kept for
    surface parity)."""
    smoothed = np.copy(features)
    smoothed[1:] = (features[:-1] + features[1:]) / 2
    return smoothed


def reduce_features(features: np.ndarray) -> np.ndarray:
    """Pair-average adjacent time frames 120→60 fps, keep odd tail frame
    (reference: extract_features_utils.py:33-44). features: [F, T]."""
    T = features.shape[1]
    paired = features[:, : T // 2 * 2].reshape(features.shape[0], -1, 2)
    reduced = paired.mean(axis=2)
    if T % 2 == 1:
        reduced = np.hstack([reduced, features[:, -1:]])
    return reduced


def mfcc_features(y: np.ndarray, sr: int, frame_length: int, hop_length: int,
                  num_mfcc: int = 23) -> np.ndarray:
    """[T60, 69] = CMVN MFCC + delta + delta2, reduced to 60 fps."""
    m = mfcc(y, sr, num_mfcc, frame_length, hop_length)
    m = cmvn(m)
    stacked = np.vstack([m, delta(m, order=1), delta(m, order=2)])
    return reduce_features(stacked).T


# ---------------------------------------------------------------------------
# autocorrelation frontend
# ---------------------------------------------------------------------------


def compute_autocorr_with_deltas(autocorr_base: np.ndarray) -> np.ndarray:
    """[3C, T]: autocorr stacked with delta + delta² rows — the reference's
    optional (off-by-default) include_deltas variant
    (reference: extract_features_utils.py:131-135)."""
    return np.vstack([autocorr_base,
                      delta(autocorr_base, 9, 1),
                      delta(autocorr_base, 9, 2)])


def autocorr_features(y: np.ndarray, frame_length: int, hop_length: int,
                      num_coeff: int = 187,
                      include_deltas: bool = False) -> np.ndarray:
    """[T60, 187] zero-lag-normalized autocorrelation lags 1..187
    (reference: extract_features_utils.py:54-113,116-128); include_deltas=True
    gives the reference's unused [T60, 561] delta-stacked variant (:116-128)."""
    pad = frame_length // 2
    y_pad = np.pad(y, pad, mode="reflect")
    frames = frame_signal(y_pad, frame_length, hop_length)      # [T, L]
    frames = frames - frames.mean(axis=1, keepdims=True)         # per-frame DC removal
    frames = frames * hann_symmetric(frame_length)[None, :]

    # full autocorrelation lags 0..num_coeff via FFT (replaces the reference's
    # per-frame np.correlate python loop — identical values, O(T L log L))
    nfft = 1
    while nfft < 2 * frame_length - 1:
        nfft *= 2
    spec = np.fft.rfft(frames, n=nfft, axis=-1)
    ac = np.fft.irfft(np.abs(spec) ** 2, n=nfft, axis=-1)[:, : num_coeff + 1]

    # normalize by zero-lag energy where nonzero
    r0 = ac[:, :1]
    ac = np.where(r0 != 0, ac / np.where(r0 == 0, 1.0, r0), ac)
    ac = ac[:, 1:]                                               # drop lag 0

    # edge-frame fix (reference: extract_features_utils.py:105-113)
    ac = ac.T.copy()                                             # [lags, T]
    if np.all(np.abs(ac[:, 0]) < 1e-7):
        ac[:, 0] = ac[:, 1]
    if np.all(np.abs(ac[:, -1]) < 1e-7):
        ac[:, -1] = ac[:, -2]

    if include_deltas:
        ac = compute_autocorr_with_deltas(ac)
    return reduce_features(ac).T


# ---------------------------------------------------------------------------
# combined
# ---------------------------------------------------------------------------

MIN_FRAMES = 9  # minimum 120fps frames for delta computation
                # (reference: extract_features.py:14)


def extract_audio_features_np(y: np.ndarray, sr: int = 88200):
    """y (mono float) → (features[T60, 256], y). Returns (None, None) when the
    clip is too short (reference: extract_features.py:16-20)."""
    frame_length = int(0.01667 * sr)
    hop_length = frame_length // 2
    num_frames = (len(y) - frame_length) // hop_length + 1
    if num_frames < MIN_FRAMES:
        return None, None
    m = mfcc_features(y, sr, frame_length, hop_length)
    a = autocorr_features(y, frame_length, hop_length)
    return np.hstack([m, a]), y
