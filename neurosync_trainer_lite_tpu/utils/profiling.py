"""Tracing and step-timing instrumentation.

The reference has no profiling beyond wall-clock epoch prints
(reference: utils/training_utils.py:43,115,298); here (SURVEY.md §5.1):

- ``profile_trace(dir)`` — context manager capturing a jax.profiler trace
  (XPlane + TensorBoard-viewable) around any region; also exposed as the
  training CLI's ``--profile`` flag.
- ``StepTimer`` — cheap per-step wall-clock histogram. Device dispatch is
  async, so per-step host timestamps only bound dispatch time; the timer
  forces a sync every ``sync_every`` steps (fetching a scalar, which is
  reliable through remote-execution tunnels where ``block_until_ready`` has
  proven not to be) and attributes the elapsed window evenly.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, sync_every: int = 20):
        self.sync_every = max(1, sync_every)
        self._times: list[float] = []
        self._window_start: float | None = None
        self._window_steps = 0

    def step(self, sync_value=None) -> None:
        """Record one step; pass a device scalar to sync on at the cadence."""
        now = time.perf_counter()
        if self._window_start is None:
            self._window_start = now
            return
        self._window_steps += 1
        if self._window_steps % self.sync_every == 0 and sync_value is not None:
            float(sync_value)  # force the pipeline to drain
            elapsed = time.perf_counter() - self._window_start
            per_step = elapsed / self._window_steps
            self._times.extend([per_step] * self._window_steps)
            self._window_start = time.perf_counter()
            self._window_steps = 0

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
            "steps_per_sec": float(1.0 / t.mean()),
        }
