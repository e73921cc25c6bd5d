"""Measure the NON-device cost of a MultiStreamer tick on a LOCAL backend.

VERDICT r3 weak #2: every serving capacity number in docs/PERF.md is a
property of this rig's tunnel (≥75% of a tick is round-trips/uploads/host —
tools/serving_trace.py), so "32 streams per v5e" must not be read as a
hardware constant. The capacity model for a PCIe-local deployment
(docs/SERVING.md "Capacity model") needs its host-orchestration term
anchored by measurement, not subtraction: this probe runs the REAL
MultiStreamer tick loop on the in-process CPU backend with a tiny model, so
program compute and transfer are ~0 and the tick wall time IS the
per-tick host cost (Python session bookkeeping, ring-shadow memcpys,
argument staging, jit dispatch) that a local deployment would still pay.

Also reports the bare jit-dispatch floor (trivial program, donated arg) to
split "framework bookkeeping" from "jax dispatch" at each K.

Usage:
  python tools/local_dispatch_probe.py [--sessions 8 32] [--ticks 300]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def bare_dispatch_us(n: int = 2000) -> float:
    """Median wall time of a minimal jit dispatch+execute on this host."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.zeros((8,), jnp.float32)
    f(x).block_until_ready()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e6)


def tick_cost(k: int, ticks: int, push_s: float) -> dict:
    import jax

    from neurosync_trainer_lite_tpu.config import tiny_config
    from neurosync_trainer_lite_tpu.inference.multi_stream import MultiStreamer
    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq

    cfg = tiny_config(hidden_dim=32, n_layers=1, num_heads=2)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    ms = MultiStreamer(params, cfg, max_sessions=k, max_buffer_seconds=8.0,
                       push_seconds=push_s)
    sids = [ms.open() for _ in range(k)]
    rng = np.random.default_rng(0)
    chunk_n = int(cfg.sr * push_s)

    # warm every program the loop will touch (compiles excluded from timing)
    for _ in range(8):
        for sid in sids:
            ms.push_audio(sid, (rng.standard_normal(chunk_n) * 0.2)
                          .astype(np.float32))
        ms.tick()
        for sid in sids:
            ms.pop_frames(sid)

    walls = []
    for _ in range(ticks):
        for sid in sids:
            ms.push_audio(sid, (rng.standard_normal(chunk_n) * 0.2)
                          .astype(np.float32))
        t0 = time.perf_counter()
        ms.tick()
        walls.append(time.perf_counter() - t0)
        for sid in sids:
            ms.pop_frames(sid)
    w = np.array(walls) * 1e3
    return {"k": k, "ticks": ticks,
            "tick_ms_p50": round(float(np.percentile(w, 50)), 2),
            "tick_ms_p95": round(float(np.percentile(w, 95)), 2),
            "tick_ms_max": round(float(w.max()), 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--push_s", type=float, default=0.5)
    args = ap.parse_args()

    # local in-process backend BEFORE backend init (env vars are overridden
    # by the axon plugin on this rig — see tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")

    print(f"backend: {jax.devices()[0].platform}")
    print(f"bare jit dispatch: {bare_dispatch_us():.0f} us median")
    for k in args.sessions:
        r = tick_cost(k, args.ticks, args.push_s)
        print(r, flush=True)


if __name__ == "__main__":
    main()
