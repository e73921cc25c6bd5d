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
    from neurosync_trainer_lite_tpu.inference import multi_stream as M
    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq

    cfg = tiny_config(hidden_dim=32, n_layers=1, num_heads=2)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    ms = M.MultiStreamer(params, cfg, max_sessions=k, max_buffer_seconds=8.0,
                         push_seconds=push_s, push_formats=("f32",))
    # full eager warmup: the host-term measurement must not include XLA
    # compiles (the r4 probe run skipped this and the decode-bucket ladder
    # compiled mid-measurement, putting 1.4 s compile spikes in the p95)
    ms.warmup(serve_buckets=None)
    sids = [ms.open() for _ in range(k)]
    rng = np.random.default_rng(0)
    chunk_n = int(cfg.sr * push_s)

    # Wrap the tick programs so the time INSIDE the jitted calls (forced
    # with block_until_ready) is attributed separately: on this in-process
    # CPU backend the frontend/decode math runs on the SAME cores, so a raw
    # tick wall time would conflate device-substitute compute with the host
    # orchestration the capacity model needs. host = wall − program.
    prog_t = [0.0]

    def wrap(fn):
        def w(*a, **kw):
            t0 = time.perf_counter()
            r = jax.block_until_ready(fn(*a, **kw))
            prog_t[0] += time.perf_counter() - t0
            return r
        return w

    orig = (M._tick_fused, M._tick_ring_only, M._tick_program)
    M._tick_fused = wrap(M._tick_fused)
    M._tick_ring_only = wrap(M._tick_ring_only)
    M._tick_program = wrap(M._tick_program)
    try:
        for _ in range(8):  # settle the steady-state backlog pattern
            for sid in sids:
                ms.push_audio(sid, (rng.standard_normal(chunk_n) * 0.2)
                              .astype(np.float32))
            ms.tick()
            for sid in sids:
                ms.pop_frames(sid)

        intake, decode, dec_prog = [], [], []
        for _ in range(ticks):
            for sid in sids:
                ms.push_audio(sid, (rng.standard_normal(chunk_n) * 0.2)
                              .astype(np.float32))
            prog_t[0] = 0.0
            t0 = time.perf_counter()
            out = ms.tick()
            host = time.perf_counter() - t0 - prog_t[0]
            # decode ticks finalize ≥1 frame; intake-only ticks just ingest —
            # the two run different programs and the capacity model uses
            # separate host terms for them
            if any(out.values()):
                decode.append(host)
                dec_prog.append(prog_t[0])
            else:
                intake.append(host)
            for sid in sids:
                ms.pop_frames(sid)
    finally:
        M._tick_fused, M._tick_ring_only, M._tick_program = orig

    def pct(xs, q):
        return round(float(np.percentile(np.array(xs) * 1e3, q)), 2)

    return {"k": k, "ticks": ticks,
            "intake_ticks": len(intake), "decode_ticks": len(decode),
            "intake_host_ms_p50": pct(intake, 50) if intake else None,
            "intake_host_ms_p95": pct(intake, 95) if intake else None,
            "decode_host_ms_p50": pct(decode, 50) if decode else None,
            "decode_host_ms_p95": pct(decode, 95) if decode else None,
            "decode_cpu_prog_ms_p50": pct(dec_prog, 50) if dec_prog else None}


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
