"""Bytes-in serving API.

Matches the reference's API-facing generator (reference:
utils/generate_face_shapes.py:8-26). Note: the reference calls
process_audio_features without its required ``config`` argument
(generate_face_shapes.py:15 — a latent bug that only works against the
separate NeuroSync_Local_API signature); here the config is threaded through
properly while keeping the same external behavior.
"""

from __future__ import annotations

import numpy as np

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.data.processing import extract_audio_features
from neurosync_trainer_lite_tpu.inference.chunked import process_audio_features


# set after repeated device-pipeline failures so subsequent requests go
# straight to the host path instead of re-paying the failing device attempt
_device_pipeline_broken = False
#: consecutive device failures tolerated before the breaker trips — a single
#: transient fault (a tunnel flap on this rig, a preempted device) shouldn't
#: permanently downgrade the process to the 3x-slower host path
_DEVICE_FAILURE_LIMIT = 2
_device_failures = 0
#: half-open: after the breaker trips, retry the device path once every N
#: host-served requests — two transient faults in a row (the tunnel is
#: documented as flappy) must not permanently downgrade a long-lived server
#: to the 3x-slower host path (ADVICE r2)
_RETRY_AFTER_N_REQUESTS = 50
_requests_since_break = 0


def reset_device_pipeline_breaker() -> None:
    """Explicitly re-enable the device pipeline (e.g. from an operator
    endpoint) without waiting out the half-open retry interval."""
    global _device_pipeline_broken, _device_failures, _requests_since_break
    _device_pipeline_broken = False
    _device_failures = 0
    _requests_since_break = 0


def smooth_by_averaging_pairs(data: np.ndarray) -> np.ndarray:
    """(reference: generate_face_shapes.py:22-26), vectorized."""
    smoothed = data.copy()
    smoothed[:-1] = (data[:-1] + data[1:]) / 2.0
    return smoothed


def generate_facial_data_from_bytes(audio_bytes: bytes, params, cfg: Config,
                                    use_smoothing: bool = False,
                                    pipeline: str = "device"):
    """wav/audio bytes → [T, 61] blendshape frames at 60 fps.

    pipeline='device' (default) runs the single-program device-resident path
    (inference/device_pipeline.py — int16 upload for 16-bit WAVs, frontend +
    chunked decode + blend in one jit, 3× the host path's throughput on the
    measured v5e), falling back to the host path on any failure.
    pipeline='host' forces the reference-exact host orchestration
    (inference/chunked.py). Both are equality-tested against each other
    (tests/test_device_pipeline.py).
    """
    global _device_pipeline_broken, _device_failures, _requests_since_break
    if pipeline == "device" and _device_pipeline_broken:
        # half-open probe: periodically give the device path another chance
        _requests_since_break += 1
        if _requests_since_break >= _RETRY_AFTER_N_REQUESTS:
            print("device-pipeline breaker half-open — retrying the device "
                  "path on this request")
            reset_device_pipeline_breaker()
    if pipeline == "device" and not _device_pipeline_broken:
        from neurosync_trainer_lite_tpu.inference import device_pipeline as dp

        # Bytes are decoded OUTSIDE the breaker's try: a malformed request is
        # an INPUT error that must surface to the caller (matching the host
        # path), not permanently disable the device pipeline for the process.
        y, normalized = dp.decode_bytes_to_waveform(audio_bytes, cfg)
        try:
            out = dp.infer_waveform_device(y, params, cfg,
                                           normalized=normalized)
            _device_failures = 0
            if out is None:
                return [], np.array([])  # reference's too-short signature
            if use_smoothing:
                out = smooth_by_averaging_pairs(out)
            return out
        except Exception as e:  # pragma: no cover - device fallback
            # breaker: a deterministic DEVICE failure (OOM, tracing bug)
            # would otherwise re-pay the failed attempt on EVERY request —
            # but tolerate isolated transient faults (link flap, preemption)
            _device_failures += 1
            if _device_failures >= _DEVICE_FAILURE_LIMIT:
                _device_pipeline_broken = True
                print("device pipeline failed repeatedly — disabling it for "
                      f"this process, serving via the host path: {e!r}")
            else:
                print(f"device pipeline failed (attempt {_device_failures}/"
                      f"{_DEVICE_FAILURE_LIMIT} before disable) — serving "
                      f"this request via the host path: {e!r}")

    audio_features, y = extract_audio_features(
        audio_bytes, sr=cfg.sr, from_bytes=True)
    if audio_features is None or y is None:
        return [], np.array([])

    final = process_audio_features(np.asarray(audio_features), params, cfg)
    if use_smoothing:
        final = smooth_by_averaging_pairs(final)
    return final
