"""Device-resident wav→blendshape serving pipeline (one upload, one download).

The host serving path (inference/chunked.py, matching the reference's
utils/audio/processing/audio_processing.py:50-112) round-trips through host
memory twice per request: waveform up, features down, chunk batch up, frames
down. On TPU the interconnect — PCIe locally, a tunnel on this rig — is the
serving bottleneck: the device frontend finishes 60 s of audio in ~40 ms
while the fp32 waveform upload alone costs seconds (docs/PERF.md).

TPU-first redesign: ONE host→device transfer and ONE device program.

- The upload is **int16 PCM** when the source is a 16-bit WAV at the target
  rate (the LiveLink capture format) — half the bytes of fp32. The /32768
  widening is a power-of-two multiply (exact in fp32), so device-side
  normalization is bitwise-identical to the host loader
  (utils/audio_io.py:_decode_wav + peak-normalize).
- Feature extraction (ops/frontend.py), the static chunk gathers (including
  the reference's reflect tail padding, audio_processing.py:14-23), the
  batched seq2seq decode, the serial overlap cross-fade (:33-48, unrolled
  over the static chunk count), the tail fix-up (:86-93), and the ÷100
  rescale (:102) all run inside a single jit program.
- Only the final [T, 61] LiveLink-space frames come back to host.

Equality with the host path is pinned over many clip lengths in
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
from neurosync_trainer_lite_tpu.data.processing import BLENDSHAPE_SCALE
from neurosync_trainer_lite_tpu.models.seq2seq import seq2seq_apply
from neurosync_trainer_lite_tpu.ops import frontend_np as F
from neurosync_trainer_lite_tpu.ops.frontend import _autocorr_187, _mfcc_69


def _num_frames_120(n_samples: int, frame_length: int) -> int:
    """120 fps frame count of the padded framing in ops/frontend.py."""
    hop = frame_length // 2
    padded = n_samples + 2 * (frame_length // 2)
    if frame_length % 2 == 0:
        return padded // hop - 1
    return 1 + (padded - frame_length) // hop


def _chunk_geometry(num_frames: int, frame_length: int, overlap: int):
    """Static chunk plan mirroring inference/chunked.py exactly:
    (gather index rows [N, frame_length], per-chunk valid lengths,
    remaining tail frames or 0)."""
    starts, start = [], 0
    while start < num_frames:
        starts.append(start)
        start += frame_length - overlap
    lengths = [min(s + frame_length, num_frames) - s for s in starts]

    acc_len = lengths[0] if lengths else 0
    for L in lengths[1:]:
        acc_len += L - min(overlap, acc_len, L)
    remaining = max(0, num_frames - acc_len)

    def reflect_rows(s: int, L: int) -> np.ndarray:
        # np.pad(..., mode='reflect') index series == pad the index vector
        idx = np.arange(s, s + L)
        if L < frame_length:
            idx = np.pad(idx, (0, frame_length - L), mode="reflect")
        return idx

    rows = [reflect_rows(s, L) for s, L in zip(starts, lengths)]
    if remaining > 0:
        rows.append(reflect_rows(num_frames - remaining, remaining))
    return np.asarray(rows, np.int32), lengths, remaining


@functools.partial(jax.jit, static_argnames=("sr", "cfg", "normalize"))
def _infer_device(y, sr: int, cfg: Config, params, normalize: bool):
    """waveform (int16 or float32, device) → [T, output_dim] LiveLink frames."""
    y = y.astype(jnp.float32)
    if normalize:
        # int16 widening: /32768 is exact in fp32, then the same peak divide
        # the host loader applies (utils/audio_io.py) — bitwise identical.
        y = y * jnp.float32(1.0 / 32768.0)
        peak = jnp.max(jnp.abs(y))
        y = jnp.where(peak > 0, y / jnp.where(peak > 0, peak, 1.0), y)

    frame_length = int(0.01667 * sr)
    feats = jnp.concatenate(
        [_mfcc_69(y, sr, frame_length), _autocorr_187(y, frame_length)], axis=1)

    t120 = _num_frames_120(y.shape[0], frame_length)
    num_frames = t120 // 2 + (t120 % 2)
    rows, lengths, remaining = _chunk_geometry(
        num_frames, cfg.frame_size, cfg.overlap)

    chunks = feats[jnp.asarray(rows)]              # [N, frame_size, 256]
    decoded = seq2seq_apply(params, chunks, cfg)   # [N, frame_size, 61]
    decoded = decoded.astype(jnp.float32)

    # serial overlap cross-fade, unrolled over the static chunk count
    # (reference: audio_processing.py:33-48; lengths are compile-time ints)
    overlap = cfg.overlap
    acc = decoded[0][: lengths[0]]
    for i in range(1, len(lengths)):
        nxt = decoded[i][: lengths[i]]
        a = min(overlap, acc.shape[0], nxt.shape[0])
        if a == 0:
            acc = jnp.concatenate([acc, nxt])
            continue
        alpha = (jnp.arange(a, dtype=jnp.float32) / a)[:, None]
        blended = (1.0 - alpha) * acc[-a:] + alpha * nxt[:a]
        acc = jnp.concatenate([acc[:-a], blended, nxt[a:]])
    if remaining > 0:
        acc = jnp.concatenate([acc, decoded[-1][:remaining]])

    return acc[:num_frames] / jnp.float32(BLENDSHAPE_SCALE)


def infer_waveform_device(y: np.ndarray, params, cfg: Config,
                          *, normalized: bool = False) -> np.ndarray | None:
    """Mono waveform at cfg.sr → [T, 61] LiveLink frames, all on device.

    y: int16 PCM (uploaded raw; widened + peak-normalized on device) or a
    float array (peak-normalized on device unless ``normalized=True``).
    Returns None for clips shorter than the frontend minimum
    (reference: extract_features.py:14-20).
    """
    y = np.asarray(y).reshape(-1)
    frame_length = int(0.01667 * cfg.sr)
    hop = frame_length // 2
    if (y.shape[0] - frame_length) // hop + 1 < F.MIN_FRAMES:
        return None
    if y.dtype == np.int16:
        dev = jnp.asarray(y)  # half the upload bytes of fp32
        normalize = True
    else:
        yf = np.asarray(y, np.float32)
        if not normalized:
            peak = np.max(np.abs(yf)) if yf.size else 0.0
            if peak > 0:
                yf = yf / peak
        dev = jnp.asarray(yf)
        normalize = False
    out = _infer_device(dev, cfg.sr, cfg, params, normalize)
    return np.asarray(out)


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
    from neurosync_trainer_lite_tpu.utils.audio_io import load_audio_from_bytes

    i16 = _sniff_wav_int16(audio_bytes, cfg.sr)
    if i16 is not None:
        out = infer_waveform_device(i16, params, cfg)
    else:
        y, _ = load_audio_from_bytes(audio_bytes, cfg.sr)
        out = infer_waveform_device(y, params, cfg, normalized=True)
    if out is None:
        return [], np.array([])  # same empty signature as the host API path
    if use_smoothing:
        out = smooth_by_averaging_pairs(out)
    return out
