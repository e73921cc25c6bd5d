"""Synthesize the committed golden dataset: test_set pair + one capture folder.

The reference ships dataset/test_set/audio.wav + testset.csv as its fixed
per-epoch validation pair (reference: config.py:52-53) and a sample capture
folder under dataset/data/. Real capture data isn't redistributable here, so
these assets are synthesized DETERMINISTICALLY (fixed seeds, no wall clock):

- audio: speech-like — a pitch-contoured harmonic voice with formant-ish
  spectral tilt, amplitude envelope with pauses, and a low noise floor
  (never all-zero: silence NaNs post-LN backward passes, see CLAUDE.md)
- blendshapes: 60 fps trajectories CORRELATED with the audio (JawOpen et al.
  follow the loudness envelope; other active dims are smoothed noise mixed
  with envelope harmonics) so training on the sample clip has real signal;
  the 24 always-zero Lite dims (models/loss.py ZERO_INDICES) are exactly 0,
  matching iPhone Lite capture

Outputs (committed):
  dataset/test_set/audio.wav + testset.csv          (10 s / ~600 frames)
  dataset/data/sample_capture_iPhone_cal/audio.wav
      + sample_iPhone_cal.csv                       (24 s / 1440 frames)

Regenerate with:  python tools/make_golden_assets.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from neurosync_trainer_lite_tpu.models.loss import ZERO_INDICES  # noqa: E402
from neurosync_trainer_lite_tpu.utils.audio_io import save_audio_file  # noqa: E402
from neurosync_trainer_lite_tpu.utils.csv_io import (  # noqa: E402
    DIMENSION_LABELS,
    save_generated_data_as_csv,
)

SR = 88200
FPS = 60
ACTIVE_DIMS = [i for i in range(61) if i not in ZERO_INDICES]  # 14..50
JAW_OPEN = DIMENSION_LABELS.index("JawOpen")  # 17


def _smooth(x: np.ndarray, k: int) -> np.ndarray:
    """Moving-average smoothing with edge-preserving same-length output."""
    kernel = np.ones(k) / k
    return np.convolve(np.pad(x, (k // 2, k - 1 - k // 2), mode="edge"),
                       kernel, mode="valid")


def synth_voice(seconds: float, rng: np.random.Generator
                ) -> tuple[np.ndarray, np.ndarray]:
    """Returns (waveform at SR, loudness envelope at FPS)."""
    n = int(seconds * SR)
    t = np.arange(n) / SR

    # pitch contour: 90-200 Hz random walk, smoothed over ~0.3 s
    f0 = 140.0 + 50.0 * _smooth(rng.standard_normal(n), int(0.3 * SR))
    f0 = np.clip(f0, 90.0, 220.0)
    phase = 2 * np.pi * np.cumsum(f0) / SR

    # harmonic stack with a formant-ish 1/h^1.2 tilt + slow vibrato
    voice = np.zeros(n)
    for h, w in ((1, 1.0), (2, 0.6), (3, 0.45), (4, 0.25), (5, 0.15)):
        voice += w * np.sin(h * phase + 0.1 * h * np.sin(2 * np.pi * 5.5 * t))

    # syllable-rate (≈4 Hz) amplitude envelope with pauses
    env_frames = int(seconds * FPS)
    env = _smooth(rng.random(env_frames) ** 2, 9)
    gate = (_smooth(rng.random(env_frames), 31) > 0.35).astype(np.float64)
    env = env * _smooth(gate, 7)
    env = env / (env.max() + 1e-9)
    env_samples = np.interp(np.arange(n) / SR * FPS,
                            np.arange(env_frames), env)

    breath = 0.02 * rng.standard_normal(n)
    y = env_samples * voice * 0.25 + breath * (0.3 + 0.7 * env_samples)
    y += 1e-4 * rng.standard_normal(n)  # noise floor — never all-zero
    y = y / np.max(np.abs(y))
    return y.astype(np.float32), env


def synth_blendshapes(env: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """60 fps [T, 61] in LiveLink [0,1] space, correlated with the envelope."""
    T = len(env)
    out = np.zeros((T, 61))
    for j, dim in enumerate(ACTIVE_DIMS):
        # each active dim = its own smoothed noise + an envelope component
        # with a dim-specific lag, so dims are distinct but audio-driven
        lag = (j * 2) % 7
        drive = np.roll(env, lag)
        noise = _smooth(rng.standard_normal(T), 13) * 0.15
        mix = 0.55 if dim == JAW_OPEN else rng.uniform(0.15, 0.45)
        base = rng.uniform(0.02, 0.1)
        out[:, dim] = np.clip(base + mix * drive + noise, 0.0, 1.0)
    return out


def main():
    rng = np.random.default_rng(7)

    test_dir = os.path.join(REPO, "dataset", "test_set")
    os.makedirs(test_dir, exist_ok=True)
    y, env = synth_voice(10.0, rng)
    save_audio_file(y, SR, os.path.join(test_dir, "audio.wav"))
    save_generated_data_as_csv(synth_blendshapes(env, rng),
                               os.path.join(test_dir, "testset.csv"))

    cap_dir = os.path.join(REPO, "dataset", "data",
                           "sample_capture_iPhone_cal")
    os.makedirs(cap_dir, exist_ok=True)
    y2, env2 = synth_voice(24.0, rng)
    save_audio_file(y2, SR, os.path.join(cap_dir, "audio.wav"))
    save_generated_data_as_csv(synth_blendshapes(env2, rng),
                               os.path.join(cap_dir, "sample_iPhone_cal.csv"))

    print(f"test_set: {len(env)} frames; capture: {len(env2)} frames")


if __name__ == "__main__":
    main()
