"""Shared harness for the serving probe tools (serving_knee / serving_soak /
serving_trace).

These tools previously triplicated the same ~40-line preamble (persistent
compile cache, Config/params/MultiStreamer construction, warmup, session
priming) and duplicated the decode-tick-hunting loop; a change to
MultiStreamer's tick or priming semantics then had to be fixed in three
places or the probes silently measured different things. One copy lives here.

Probe-only code: nothing in the package imports this.
"""

from __future__ import annotations

import time

_UNSET = object()


def build_streamer(*, max_sessions: int, fused: bool,
                   stall_watchdog_s=_UNSET, dropout: float = 0.0,
                   warm_fallback=_UNSET, verbose: bool = True,
                   decode_bucket_cap=_UNSET, push_seconds=_UNSET,
                   push_formats=_UNSET):
    """Persistent cache on → Config → random params → MultiStreamer →
    forced warmup. Returns (ms, cfg, n_warmed_programs).

    stall_watchdog_s / warm_fallback: leave unset to take MultiStreamer's
    production defaults (what soak wants); pass explicitly to pin a probe's
    behavior (knee/trace disable the watchdog so a stall is MEASURED, not
    auto-recovered)."""
    from neurosync_trainer_lite_tpu.utils.compilation_cache import (
        enable_persistent_cache)

    enable_persistent_cache()

    import jax

    from neurosync_trainer_lite_tpu.config import Config
    from neurosync_trainer_lite_tpu.inference.multi_stream import MultiStreamer
    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq

    cfg = Config(dropout=dropout)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    kw = {}
    if stall_watchdog_s is not _UNSET:
        kw["stall_watchdog_s"] = stall_watchdog_s
    if decode_bucket_cap is not _UNSET:
        kw["decode_bucket_cap"] = decode_bucket_cap
    if push_seconds is not _UNSET:
        kw["push_seconds"] = push_seconds
    if push_formats is not _UNSET:
        kw["push_formats"] = push_formats
    ms = MultiStreamer(params, cfg, max_sessions=max_sessions,
                       fused_decode=fused, **kw)
    t0 = time.perf_counter()
    wkw = {} if warm_fallback is _UNSET else {"warm_fallback": warm_fallback}
    n_prog = ms.warmup(**wkw)
    if verbose:
        print(f"warmup: {n_prog} programs in "
              f"{time.perf_counter() - t0:.1f} s", flush=True)
    return ms, cfg, n_prog


def window_stride_s(cfg) -> float:
    """Seconds of audio per decode window step (≈1.87 s at the defaults)."""
    return (cfg.frame_size - cfg.overlap) / cfg.frame_rate


def push_noise(ms, sid, rng, n_samples: int) -> None:
    """Push n_samples of int16 noise (random data — all-zero audio NaNs
    downstream consumers and real captures never look like silence)."""
    import numpy as np

    ms.push_audio(sid, (rng.standard_normal(n_samples) * 8000
                        ).astype(np.int16))


def prime_sessions(ms, cfg, k: int, rng, *, seconds: float = 2.2) -> list:
    """Open k sessions, push each ring past its first window, and drain all
    catch-up ticks — so the caller's subsequent ticks are pure intake until
    it deliberately tops a window up. Returns the session ids."""
    sids = [ms.open() for _ in range(k)]
    for sid in sids:
        push_noise(ms, sid, rng, int(cfg.sr * seconds))
    while ms.tick():
        pass
    return sids


def hunt_decode_tick(ms, sids, rng, cfg, *, top_samples: int,
                     max_ticks: int = 8, top_sids=None):
    """Top sessions up past their next ready window, then tick until the
    tick that actually decodes (yields frames). Returns (dt_seconds,
    n_frames) for that decode tick, then drains catch-up ticks so repeated
    calls stay comparable.

    top_sids: which sessions to top up (default: all of sids) — topping a
    subset measures the live-realistic decode tick where only ~K/8
    sessions have a window ready while the rest are mid-window."""
    for sid in (sids if top_sids is None else top_sids):
        push_noise(ms, sid, rng, top_samples)
    for _ in range(max_ticks):
        t1 = time.perf_counter()
        out = ms.tick()
        dt = time.perf_counter() - t1
        frames = sum(out.values())
        if frames > 0:
            while ms.tick():  # drain catch-up
                pass
            return dt, frames
    raise RuntimeError(f"no decode tick within {max_ticks} ticks")
