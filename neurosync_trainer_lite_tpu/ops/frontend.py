"""Device-side (JAX/TPU) batched audio feature frontend.

The TPU-native production path for the feature math defined in
ops/frontend_np.py (which is itself the re-derivation of what the reference
gets from librosa — reference: utils/audio/extraction/*). Numerically matches
the numpy twin to fp32 tolerance (tested in tests/test_frontend.py).

TPU-first design (not a translation):
- The STFT is GEMM-native: frames × precomputed rDFT cos/sin matrices run on
  the MXU instead of a non-power-of-two FFT (n_fft=1470), following the
  NDFT-as-matmul idea (PAPERS.md: MelT). mel projection and DCT-II are further
  matmuls, so STFT→mel→MFCC is one fused matmul chain for XLA.
- Framing uses a reshape/stack trick (hop == frame_length//2 exactly), so no
  gather is needed: frame t = [block t, block t+1] of 735-sample blocks.
- The autocorrelation replaces the reference's per-frame Python np.correlate
  loop (extract_features_utils.py:83-92) with one batched power-of-two
  rFFT/irFFT (lags via Wiener–Khinchin), or a GEMM-native DFT fallback.
- Savitzky-Golay deltas are a depthwise VALID convolution plus two tiny edge
  matmuls (the exact linear operator scipy's mode='interp' applies).

Everything is jit-compiled per input length; lengths are cached by jit.
"""

from __future__ import annotations

import functools
from math import factorial

import numpy as np
import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.ops import frontend_np as F

# ---------------------------------------------------------------------------
# host-precomputed constants
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _rdft_matrices(n_fft: int):
    """Real-DFT as two matrices [n_fft, 1+n_fft//2] (cos, -sin)."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(1 + n_fft // 2)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return (np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32))


@functools.lru_cache(maxsize=8)
def _mfcc_constants(sr: int, n_fft: int, n_mels: int, n_mfcc: int):
    return (
        F.hann_periodic(n_fft).astype(np.float32),
        F.mel_filterbank(sr, n_fft, n_mels).astype(np.float32).T,   # [736, 128]
        F.dct_ii_ortho_matrix(n_mfcc, n_mels).astype(np.float32).T,  # [128, 23]
    )


@functools.lru_cache(maxsize=8)
def _savgol_constants(width: int, order: int):
    """(reversed interior conv kernel, left edge matrix, right edge matrix)."""
    from scipy.signal import savgol_coeffs

    kernel = savgol_coeffs(width, polyorder=order, deriv=order, delta=1.0)[::-1]
    V = np.vander(np.arange(width), order + 1, increasing=True)
    pinv = np.linalg.pinv(V)

    def deriv_row(t):
        # d-th derivative of the LSQ polynomial fit, evaluated at position t,
        # as a linear functional of the window samples (scipy mode='interp').
        d = order
        row = np.zeros(width)
        for j in range(d, order + 1):
            row += factorial(j) / factorial(j - d) * t ** (j - d) * pinv[j]
        return row

    half = width // 2
    left = np.array([deriv_row(t) for t in range(half)])
    right = np.array([deriv_row(t) for t in range(width - half, width)])
    return (kernel.astype(np.float32).copy(),
            left.astype(np.float32), right.astype(np.float32))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _frame_half_overlap(y: jnp.ndarray, frame_length: int) -> jnp.ndarray:
    """Frame with hop = frame_length//2: [T, frame_length].

    y must already be padded. For even frame_length (2·hop == frame_length,
    the default sr=88200 → 1470) the half-overlap frames are a free block
    reshape + concat; odd frame lengths (e.g. sr=44100 → 735) fall back to a
    strided gather, matching librosa.util.frame's hop arithmetic exactly.
    """
    hop = frame_length // 2
    if frame_length % 2 == 0:
        n_blocks = y.shape[0] // hop
        blocks = y[: n_blocks * hop].reshape(n_blocks, hop)
        return jnp.concatenate([blocks[:-1], blocks[1:]], axis=1)
    n_frames = 1 + (y.shape[0] - frame_length) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(frame_length)[None, :])
    return y[idx]


def _savgol_delta(x: jnp.ndarray, width: int = 9, order: int = 1) -> jnp.ndarray:
    """Savitzky-Golay derivative along time. x: [C, T] → [C, T]."""
    kernel, left, right = _savgol_constants(width, order)
    half = width // 2
    # interior: depthwise VALID correlation (XLA conv is cross-correlation)
    interior = jax.lax.conv_general_dilated(
        x[:, None, :],                         # [C, 1, T]
        jnp.asarray(kernel)[None, None, :],    # [1, 1, w]
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]                                  # [C, T-w+1]
    first = x[:, :width] @ jnp.asarray(left).T   # [C, half]
    last = x[:, -width:] @ jnp.asarray(right).T  # [C, half]
    return jnp.concatenate([first, interior, last], axis=1)


def _reduce_features(x: jnp.ndarray) -> jnp.ndarray:
    """Pair-average over time (120→60 fps), keep odd tail. x: [C, T]."""
    T = x.shape[1]
    reduced = x[:, : T // 2 * 2].reshape(x.shape[0], -1, 2).mean(axis=2)
    if T % 2 == 1:
        reduced = jnp.concatenate([reduced, x[:, -1:]], axis=1)
    return reduced


def _mfcc_69(y: jnp.ndarray, sr: int, frame_length: int) -> jnp.ndarray:
    """[T60, 69]: CMVN MFCC(23) + delta + delta² at 60 fps."""
    win, mel_T, dct_T = _mfcc_constants(sr, frame_length, 128, 23)
    cos_m, msin_m = _rdft_matrices(frame_length)

    y_pad = jnp.pad(y, frame_length // 2, mode="constant")
    frames = _frame_half_overlap(y_pad, frame_length) * jnp.asarray(win)

    # GEMM-native power spectrum on the MXU
    re = jnp.dot(frames, jnp.asarray(cos_m), preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(msin_m), preferred_element_type=jnp.float32)
    power = re * re + im * im                           # [T, 736]

    mel = jnp.dot(power, jnp.asarray(mel_T),
                  preferred_element_type=jnp.float32)   # [T, 128]
    mel_db = 10.0 * jnp.log10(jnp.maximum(1e-10, mel))
    mel_db = jnp.maximum(mel_db, jnp.max(mel_db) - 80.0)  # top_db, global max

    mfcc = jnp.dot(mel_db, jnp.asarray(dct_T),
                   preferred_element_type=jnp.float32).T  # [23, T]

    mean = jnp.mean(mfcc, axis=1, keepdims=True)
    std = jnp.std(mfcc, axis=1, keepdims=True)
    mfcc = (mfcc - mean) / (std + 1e-10)

    stacked = jnp.concatenate(
        [mfcc, _savgol_delta(mfcc, 9, 1), _savgol_delta(mfcc, 9, 2)], axis=0)
    return _reduce_features(stacked).T


def _autocorr_187(y: jnp.ndarray, frame_length: int,
                  num_coeff: int = 187) -> jnp.ndarray:
    """[T60, 187]: zero-lag-normalized autocorrelation lags 1..187."""
    y_pad = jnp.pad(y, frame_length // 2, mode="reflect")
    frames = _frame_half_overlap(y_pad, frame_length)
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    frames = frames * jnp.asarray(
        F.hann_symmetric(frame_length).astype(np.float32))

    nfft = pow2_bucket(2 * frame_length - 1)
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    ac = jnp.fft.irfft(jnp.abs(spec) ** 2, n=nfft, axis=-1)[:, : num_coeff + 1]
    ac = ac.astype(jnp.float32)

    r0 = ac[:, :1]
    ac = jnp.where(r0 != 0, ac / jnp.where(r0 == 0, 1.0, r0), ac)
    ac = ac[:, 1:]                                       # [T, 187]

    # near-zero edge-frame fix (reference: extract_features_utils.py:105-113)
    first_dead = jnp.all(jnp.abs(ac[0]) < 1e-7)
    last_dead = jnp.all(jnp.abs(ac[-1]) < 1e-7)
    ac = ac.at[0].set(jnp.where(first_dead, ac[1], ac[0]))
    ac = ac.at[-1].set(jnp.where(last_dead, ac[-2], ac[-1]))

    return _reduce_features(ac.T).T


# ---------------------------------------------------------------------------
# valid-length-masked variants: same math on a zero-padded bucket
# ---------------------------------------------------------------------------
#
# The serving pipeline (inference/device_pipeline.py) pads the waveform to a
# power-of-two sample bucket so the fused frontend+decode program compiles
# once per bucket instead of once per clip length. The pad region is zeros;
# everything below reproduces the unpadded functions' values on the valid
# rows with the TRUE length as a *traced* scalar:
# - MFCC framing pads with zeros anyway, so per-frame spectra are already
#   exact; only the clip-global stats (top_db max, CMVN mean/std), the
#   Savitzky-Golay right-edge rows, and the pair-reduce odd-tail need masking
#   or dynamic patching.
# - Autocorrelation reflect-pads the true tail, so the reflected samples are
#   written into the pad region at the traced boundary first; the dead-edge
#   fix moves to the dynamic last-valid index.
# Rows at/beyond the valid frame count are garbage and must not be consumed
# (the chunk gather never references them).


def _savgol_delta_valid(x: jnp.ndarray, t_valid, width: int = 9,
                        order: int = 1) -> jnp.ndarray:
    """_savgol_delta with the right-edge rows re-derived at the traced valid
    end (the static version's edge matrices sit at the bucket end)."""
    _, _, right = _savgol_constants(width, order)
    half = width // 2
    out = _savgol_delta(x, width, order)
    lastw = jax.lax.dynamic_slice(
        x, (0, t_valid - width), (x.shape[0], width))       # last 9 valid
    patch = lastw @ jnp.asarray(right).T                     # [C, half]
    return jax.lax.dynamic_update_slice(out, patch, (0, t_valid - half))


def _reduce_features_valid(x: jnp.ndarray, t_valid) -> jnp.ndarray:
    """Pair-average over time with the odd-valid-tail kept, at a traced
    valid length. x: [C, T_bucket(even)] → [C, T_bucket//2]; output rows at
    index ≥ (t_valid+1)//2 are garbage."""
    if x.shape[1] % 2 == 1:
        x = x[:, :-1]  # bucket parity is static; the dropped row is garbage
    red = x.reshape(x.shape[0], -1, 2).mean(axis=2)
    # odd valid length: the last valid output row is the single frame
    # x[:, t_valid-1], not a pair average (matches _reduce_features' tail)
    last = jax.lax.dynamic_slice(x, (0, t_valid - 1), (x.shape[0], 1))
    patched = jax.lax.dynamic_update_slice(red, last, (0, t_valid // 2))
    return jnp.where(t_valid % 2 == 1, patched, red)


def _mfcc_69_valid(y: jnp.ndarray, sr: int, frame_length: int,
                   t120: jnp.ndarray) -> jnp.ndarray:
    """_mfcc_69 on a zero-padded bucket with t120 valid frames (traced)."""
    win, mel_T, dct_T = _mfcc_constants(sr, frame_length, 128, 23)
    cos_m, msin_m = _rdft_matrices(frame_length)

    y_pad = jnp.pad(y, frame_length // 2, mode="constant")
    frames = _frame_half_overlap(y_pad, frame_length) * jnp.asarray(win)

    re = jnp.dot(frames, jnp.asarray(cos_m), preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(msin_m), preferred_element_type=jnp.float32)
    power = re * re + im * im

    mel = jnp.dot(power, jnp.asarray(mel_T),
                  preferred_element_type=jnp.float32)       # [T_bucket, 128]
    valid = (jnp.arange(mel.shape[0]) < t120)[:, None]
    mel_db = 10.0 * jnp.log10(jnp.maximum(1e-10, mel))
    vmax = jnp.max(jnp.where(valid, mel_db, -jnp.inf))      # top_db over valid
    mel_db = jnp.maximum(mel_db, vmax - 80.0)

    mfcc = jnp.dot(mel_db, jnp.asarray(dct_T),
                   preferred_element_type=jnp.float32).T    # [23, T_bucket]

    # CMVN over the valid frames only
    maskT = valid.T.astype(jnp.float32)                     # [1, T_bucket]
    n = t120.astype(jnp.float32)
    mean = jnp.sum(mfcc * maskT, axis=1, keepdims=True) / n
    var = jnp.sum(jnp.square(mfcc - mean) * maskT, axis=1, keepdims=True) / n
    mfcc = (mfcc - mean) / (jnp.sqrt(var) + 1e-10)

    stacked = jnp.concatenate(
        [mfcc, _savgol_delta_valid(mfcc, t120, 9, 1),
         _savgol_delta_valid(mfcc, t120, 9, 2)], axis=0)
    return _reduce_features_valid(stacked, t120).T


def _autocorr_187_valid(y: jnp.ndarray, frame_length: int, n_samples,
                        t120, num_coeff: int = 187) -> jnp.ndarray:
    """_autocorr_187 on a zero-padded bucket with n_samples valid (traced).

    Requires bucket ≥ n_samples + frame_length//2 + 1 so the reflected tail
    fits in the pad region (the caller's bucket choice guarantees it).
    """
    half = frame_length // 2
    # write the true clip's reflect-pad into the zero region: np.pad reflect
    # appends y[n-2], y[n-3], … y[n-half-1]
    seg = jax.lax.dynamic_slice(y, (n_samples - (half + 1),), (half + 1,))
    tail = jnp.flip(seg[:-1])
    y = jax.lax.dynamic_update_slice(y, tail, (n_samples,))

    y_pad = jnp.pad(y, half, mode="reflect")
    frames = _frame_half_overlap(y_pad, frame_length)
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    frames = frames * jnp.asarray(
        F.hann_symmetric(frame_length).astype(np.float32))

    nfft = pow2_bucket(2 * frame_length - 1)
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    ac = jnp.fft.irfft(jnp.abs(spec) ** 2, n=nfft, axis=-1)[:, : num_coeff + 1]
    ac = ac.astype(jnp.float32)

    r0 = ac[:, :1]
    ac = jnp.where(r0 != 0, ac / jnp.where(r0 == 0, 1.0, r0), ac)
    ac = ac[:, 1:]

    # dead-edge fix at the static first and the traced last-valid frame
    first_dead = jnp.all(jnp.abs(ac[0]) < 1e-7)
    ac = ac.at[0].set(jnp.where(first_dead, ac[1], ac[0]))
    lastf = jax.lax.dynamic_slice(ac, (t120 - 1, 0), (1, ac.shape[1]))
    prevf = jax.lax.dynamic_slice(ac, (t120 - 2, 0), (1, ac.shape[1]))
    last_dead = jnp.all(jnp.abs(lastf) < 1e-7)
    ac = jax.lax.dynamic_update_slice(
        ac, jnp.where(last_dead, prevf, lastf), (t120 - 1, 0))

    return _reduce_features_valid(ac.T, t120).T


def extract_features_valid(y: jnp.ndarray, n_samples, sr: int) -> jnp.ndarray:
    """Bucket-padded waveform + traced valid sample count → [T60_bucket, 256]
    features whose first (t120+1)//2 rows equal the unpadded extraction
    (tests/test_device_pipeline.py pins equality through the serving path)."""
    frame_length = int(0.01667 * sr)
    t120 = num_frames_120(n_samples, frame_length)
    return jnp.concatenate(
        [_mfcc_69_valid(y, sr, frame_length, t120),
         _autocorr_187_valid(y, frame_length, n_samples, t120)], axis=1)


@functools.partial(jax.jit, static_argnames=("sr",))
def _extract_valid_jit(y_pad: jnp.ndarray, n_samples, sr: int) -> jnp.ndarray:
    return extract_features_valid(y_pad.astype(jnp.float32), n_samples, sr)


#: smallest power-of-two sample bucket (~1.5 s at 88.2 kHz); buckets double
#: above it, so an hour-long clip is ~12 compile variants from the shortest
MIN_SAMPLE_BUCKET = 1 << 17


def pow2_bucket(n: int, minimum: int = 1) -> int:
    """Smallest power-of-two ≥ n (and ≥ minimum) — the shared shape-bucket
    rule for every serving surface (decode batches, sample buckets, session
    counts), so compile caches key on O(log) shapes."""
    b = minimum
    while b < n:
        b *= 2
    return b


def num_frames_120(n_samples, frame_length: int):
    """120 fps frame count of the center-padded half-overlap framing — the
    single source for the host/device agreement the serving pipelines rely
    on (chunk gathers index rows this formula counts). n_samples may be a
    traced scalar; frame_length is static."""
    hop = frame_length // 2
    if frame_length % 2 == 0:
        return (n_samples + 2 * (frame_length // 2)) // hop - 1
    return 1 + (n_samples + 2 * (frame_length // 2) - frame_length) // hop


def num_frames_60(n_samples, frame_length: int):
    """60 fps feature-row count after the pair-reduce (odd tail kept)."""
    t120 = num_frames_120(n_samples, frame_length)
    return t120 // 2 + t120 % 2


def extract_audio_features_bucketed(y, sr: int = 88200,
                                    min_bucket: int = MIN_SAMPLE_BUCKET):
    """Like extract_audio_features_jax but with compile cost bounded by
    power-of-two sample buckets instead of one compile per input length:
    the waveform is zero-padded to a bucket and the true length rides along
    as a traced scalar (extract_features_valid). Built for callers that see
    arbitrary, growing lengths — the streamer re-extracts its audio buffer
    on every push (inference/streaming.py).

    Integer PCM is widened by the dtype's full scale (no peak
    normalization — this is a streaming surface, the peak is not yet
    known; same policy as MultiStreamer.push_audio). A silent float cast
    would feed ±32767-amplitude garbage into the frontend (ADVICE r2)."""
    y = np.asarray(y).reshape(-1)
    if y.dtype == np.int16:
        y = y.astype(np.float32) / 32768.0
    elif np.issubdtype(y.dtype, np.integer):
        y = widen_int_pcm(y)
    y = y.astype(np.float32, copy=False)
    frame_length = int(0.01667 * sr)
    hop = frame_length // 2
    n = y.shape[0]
    num_frames = (n - frame_length) // hop + 1
    if num_frames < F.MIN_FRAMES:
        return None
    # + autocorr reflected-tail room
    bucket = pow2_bucket(n + frame_length // 2 + 1, min_bucket)
    y_pad = np.zeros(bucket, np.float32)
    y_pad[:n] = y
    t60 = num_frames_60(n, frame_length)
    feats = _extract_valid_jit(jnp.asarray(y_pad), jnp.int32(n), sr)
    # download the whole bucket and slice on host: slicing on device would
    # compile (and dispatch) a tiny per-length program — one extra link
    # round-trip per new length
    return np.asarray(feats)[:t60]


@functools.partial(jax.jit, static_argnames=("sr", "normalize"))
def _extract_jit(y: jnp.ndarray, sr: int, normalize: bool = False) -> jnp.ndarray:
    y = y.astype(jnp.float32)
    if normalize:
        # int16 PCM upload path: the /32768 widening is a power-of-two
        # multiply (exact in fp32), so widen + peak-normalize on device is
        # bitwise-identical to the host loader (utils/audio_io.py) while
        # uploading half the bytes
        y = y * jnp.float32(1.0 / 32768.0)
        peak = jnp.max(jnp.abs(y))
        y = jnp.where(peak > 0, y / jnp.where(peak > 0, peak, 1.0), y)
    frame_length = int(0.01667 * sr)
    return jnp.concatenate(
        [_mfcc_69(y, sr, frame_length), _autocorr_187(y, frame_length)], axis=1)


def widen_int_pcm(y: np.ndarray) -> np.ndarray:
    """Integer PCM (other than int16, which has raw-upload fast paths) →
    float32 in [-1, 1) by the dtype's full scale; unsigned PCM (e.g. uint8
    WAV) is offset-binary and gets re-centered first. No peak normalization
    — callers apply their own policy."""
    info = np.iinfo(y.dtype)
    if info.min == 0:
        mid = (info.max + 1) / 2.0
        return ((y.astype(np.float64) - mid) / mid).astype(np.float32)
    return (y.astype(np.float64) / float(info.max + 1)).astype(np.float32)


def extract_audio_features_jax(y, sr: int = 88200):
    """y (mono waveform) → (features[T60, 256], y), or (None, None) if the
    clip is shorter than 9 intermediate frames (reference: extract_features.py:14-20).

    A float input is used as-is (callers peak-normalize on host). An int16
    input uploads raw PCM — half the host→device bytes — and is widened +
    peak-normalized on device, bitwise-identical to the host loader; the
    returned waveform is the same normalized float32 (computed on host, no
    extra transfer).

    Compiled per distinct input length (cached by jit).
    """
    y = np.asarray(y)
    frame_length = int(0.01667 * sr)
    hop = frame_length // 2
    num_frames = (y.shape[0] - frame_length) // hop + 1
    if num_frames < F.MIN_FRAMES:
        return None, None
    if np.issubdtype(y.dtype, np.integer) and y.dtype != np.int16:
        # widen by the dtype's full scale + peak-normalize (matching the
        # int16 path's semantics) — a silent float32 cast of e.g. int32 PCM
        # would feed ±2^31-amplitude garbage into the frontend (ADVICE r2)
        y = widen_int_pcm(y)
        peak = np.max(np.abs(y)) if y.size else 0.0
        if peak > 0:
            y = y / peak
    if y.dtype == np.int16:
        feats = _extract_jit(jnp.asarray(y), sr, normalize=True)
        y_f = y.astype(np.float32) / 32768.0
        peak = np.max(np.abs(y_f)) if y_f.size else 0.0
        if peak > 0:
            y_f = y_f / peak
        return np.asarray(feats), y_f
    # host np waveform on BOTH paths (the int16 branch above returns np):
    # callers hold/mutate the second return value — a device array here
    # would be immutable and pin device memory for no consumer
    y = np.asarray(y, np.float32)
    return np.asarray(_extract_jit(jnp.asarray(y), sr)), y
