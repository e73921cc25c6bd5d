"""Device-resident wav→blendshape serving pipeline (one upload, one program).

The host serving path (inference/chunked.py, matching the reference's
utils/audio/processing/audio_processing.py:50-112) round-trips through host
memory twice per request: waveform up, features down, chunk batch up, frames
down. On TPU the interconnect — PCIe locally, a tunnel on this rig — is the
serving bottleneck: the device frontend finishes 60 s of audio in ~40 ms
while the fp32 waveform upload alone costs seconds, and each extra device
dispatch pays the link's round-trip latency (docs/PERF.md).

TPU-first redesign: ONE host→device transfer, ONE device program per
request, and compile cost bounded by shape buckets.

- The upload is **int16 PCM** when the source is a 16-bit WAV at the target
  rate (the LiveLink capture format) — half the bytes of fp32. The /32768
  widening is a power-of-two multiply (exact in fp32), so device-side
  normalization is bitwise-identical to the host loader
  (utils/audio_io.py:_decode_wav + peak-normalize).
- Static shapes, dynamic truth: the waveform is zero-padded to a
  power-of-two sample bucket and the TRUE length rides along as a *traced*
  scalar. The frontend's clip-global statistics (CMVN, top_db max), its
  Savitzky-Golay right edge, the autocorrelation's reflected tail and
  dead-edge fix, and the 120→60 fps pair-reduce parity are all evaluated at
  the traced valid length (ops/frontend.py:extract_features_valid), so the
  valid rows equal the unpadded extraction. The chunk gather-index matrix
  (padded to a power-of-two chunk count) is a traced operand too. The whole
  frontend → gather → batched 228M decode program therefore compiles once
  per (sample-bucket, chunk-bucket) pair and serves ANY clip length.
- The serial overlap cross-fade (reference :33-48), tail fix-up (:86-93)
  and ÷100 rescale (:102) run on host over the downloaded
  [chunks, frame_size, 61] frames (shared with the host path:
  inference/chunked.py:blend_decoded_chunks) — a small download next to
  the waveform upload it replaces.

Equality with the host path is pinned over many clip lengths (covering both
reduce parities and multi-bucket geometries), and the program's
compile-cache reuse across lengths is asserted, in
tests/test_device_pipeline.py.
"""

from __future__ import annotations

import functools
import io
import wave

import numpy as np
import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.inference.chunked import (
    blend_decoded_chunks,
    chunk_plan,
)
from neurosync_trainer_lite_tpu.models.seq2seq import seq2seq_apply
from neurosync_trainer_lite_tpu.ops import frontend_np as F
from neurosync_trainer_lite_tpu.ops.frontend import (
    MIN_SAMPLE_BUCKET,
    extract_features_valid,
    num_frames_60,
    pow2_bucket,
)


def _gather_rows(num_frames: int, frame_length: int, overlap: int):
    """Gather index rows [N(+tail), frame_length] mirroring the host path's
    chunk extraction + reflect tail padding (inference/chunked.py:
    pad_audio_chunk), plus the chunk plan they came from."""
    starts, lengths, remaining = chunk_plan(num_frames, frame_length, overlap)

    def reflect_rows(s: int, L: int) -> np.ndarray:
        # np.pad(data, reflect) index series == pad the index vector
        idx = np.arange(s, s + L)
        if L < frame_length:
            idx = np.pad(idx, (0, frame_length - L), mode="reflect")
        return idx

    rows = [reflect_rows(s, L) for s, L in zip(starts, lengths)]
    if remaining > 0:
        rows.append(reflect_rows(num_frames - remaining, remaining))
    return np.asarray(rows, np.int32), lengths, remaining


@functools.partial(jax.jit, static_argnames=("sr", "cfg", "normalize"))
def _infer_bucketed(y_pad, n_samples, idx, params, sr: int, cfg: Config,
                    normalize: bool):
    """[s_bucket] waveform (+ traced true length) + [n_bucket, frame_size]
    gather rows → [n_bucket, frame_size, output_dim]. Caches purely on the
    bucket shapes — never on the clip length."""
    y = y_pad.astype(jnp.float32)
    if normalize:
        # int16 widening: /32768 is exact in fp32, then the same peak divide
        # the host loader applies (pad zeros affect neither) — bitwise
        # identical to utils/audio_io.py
        y = y * jnp.float32(1.0 / 32768.0)
        peak = jnp.max(jnp.abs(y))
        y = jnp.where(peak > 0, y / jnp.where(peak > 0, peak, 1.0), y)
    feats = extract_features_valid(y, n_samples, sr)
    chunks = feats[idx]
    return seq2seq_apply(params, chunks, cfg).astype(jnp.float32)


def infer_waveform_device(y: np.ndarray, params, cfg: Config,
                          *, normalized: bool = False) -> np.ndarray | None:
    """Mono waveform at cfg.sr → [T, 61] LiveLink frames.

    y: int16 PCM (uploaded raw; widened + peak-normalized on device) or a
    float array (peak-normalized on host unless ``normalized=True``).
    Returns None for clips shorter than the frontend minimum
    (reference: extract_features.py:14-20).
    """
    y = np.asarray(y).reshape(-1)
    frame_length = int(0.01667 * cfg.sr)
    hop = frame_length // 2
    if (y.shape[0] - frame_length) // hop + 1 < F.MIN_FRAMES:
        return None
    n = y.shape[0]
    # + tail margin so the autocorrelation's reflected pad fits in the
    # zero region (ops/frontend.py:_autocorr_187_valid)
    s_bucket = pow2_bucket(n + frame_length // 2 + 1, MIN_SAMPLE_BUCKET)

    if y.dtype == np.int16:
        y_pad = np.zeros(s_bucket, np.int16)
        y_pad[:n] = y                       # half the upload bytes of fp32
        normalize = True
    else:
        yf = np.asarray(y, np.float32)
        if not normalized:
            peak = np.max(np.abs(yf)) if yf.size else 0.0
            if peak > 0:
                yf = yf / peak
        y_pad = np.zeros(s_bucket, np.float32)
        y_pad[:n] = yf
        normalize = False

    num_frames = num_frames_60(n, frame_length)
    rows, lengths, remaining = _gather_rows(num_frames, cfg.frame_size,
                                            cfg.overlap)
    n_true = rows.shape[0]
    n_bucket = pow2_bucket(n_true)
    if n_bucket != n_true:
        # pad with copies of the first row; the decoded pad rows are discarded
        rows = np.concatenate(
            [rows, np.broadcast_to(rows[:1], (n_bucket - n_true,
                                              rows.shape[1]))])

    decoded = _infer_bucketed(jnp.asarray(y_pad), jnp.int32(n),
                              jnp.asarray(rows), params, cfg.sr, cfg,
                              normalize)
    # download the whole bucket, slice on host — a device-side slice would
    # compile + dispatch a tiny per-(bucket, n_true) program per clip length
    decoded = np.asarray(decoded, dtype=np.float64)[:n_true]

    return blend_decoded_chunks(decoded, lengths, remaining, cfg.overlap,
                                num_frames)


def _sniff_wav_int16(audio_bytes: bytes, sr: int) -> np.ndarray | None:
    """Raw int16 samples iff the bytes are a 16-bit mono WAV already at sr."""
    try:
        with wave.open(io.BytesIO(audio_bytes)) as w:
            if (w.getsampwidth() == 2 and w.getnchannels() == 1
                    and w.getframerate() == sr):
                return np.frombuffer(
                    w.readframes(w.getnframes()), dtype="<i2")
    except (wave.Error, EOFError):
        pass
    return None


def decode_bytes_to_waveform(audio_bytes: bytes, cfg: Config):
    """(waveform, normalized) for the device path: raw int16 when the bytes
    are a 16-bit mono WAV already at cfg.sr (uploaded raw, half the bytes),
    otherwise the host loader's peak-normalized fp32. Raises on undecodable
    input — a host-side INPUT error, distinct from device failures (the
    api.py breaker relies on that distinction)."""
    from neurosync_trainer_lite_tpu.utils.audio_io import load_audio_from_bytes

    i16 = _sniff_wav_int16(audio_bytes, cfg.sr)
    if i16 is not None:
        return i16, False
    y, _ = load_audio_from_bytes(audio_bytes, cfg.sr)
    return y, True


def generate_facial_data_from_bytes_device(
        audio_bytes: bytes, params, cfg: Config,
        use_smoothing: bool = False) -> np.ndarray:
    """Bytes-in serving entry on the device pipeline.

    16-bit mono WAV at cfg.sr (the capture format) uploads as raw int16;
    anything else decodes through the host loader first and uploads fp32.
    Output matches inference/api.py:generate_facial_data_from_bytes to fp32
    tolerance (tested).
    """
    from neurosync_trainer_lite_tpu.inference.api import smooth_by_averaging_pairs

    y, normalized = decode_bytes_to_waveform(audio_bytes, cfg)
    out = infer_waveform_device(y, params, cfg, normalized=normalized)
    if out is None:
        return [], np.array([])  # same empty signature as the host API path
    if use_smoothing:
        out = smooth_by_averaging_pairs(out)
    return out
