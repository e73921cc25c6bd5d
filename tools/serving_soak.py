"""Serving soak: N unpaced MultiStreamer ticks with session churn on the
real TPU; prints per-run latency percentiles + a JSON summary line.

Built for the r3 fused-stall investigation (docs/PERF.md rare-stall note):
the r2 soaks were ad-hoc; this makes ≥500-tick runs restartable and
comparable. Each live session pushes 0.5 s of int16 audio per tick;
sessions churn (open/close) every `--churn` ticks. The stall watchdog is
left at its production default unless --watchdog overrides it, so a run
also demonstrates the fallback behavior on a real stall.

Usage: python tools/serving_soak.py NAME --ticks 500 [--fused 0|1]
           [--sessions 4] [--churn 60] [--watchdog SECONDS|-]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("name")
    p.add_argument("--out", default="/tmp/serving_soak_results.jsonl")
    p.add_argument("--ticks", type=int, default=500)
    p.add_argument("--fused", type=int, default=1)
    p.add_argument("--sessions", type=int, default=4)
    p.add_argument("--max-sessions", type=int, default=8)
    p.add_argument("--churn", type=int, default=60,
                   help="close one + open one session every N ticks")
    p.add_argument("--push-seconds", type=float, default=0.5)
    p.add_argument("--dcap", type=int, default=-1,
                   help="decode_bucket_cap (-1 = production 'auto' default; "
                        "0 = None, i.e. decode every ready row at once)")
    p.add_argument("--watchdog", default=None,
                   help="stall watchdog seconds; '-' disables; default: "
                        "production default (30)")
    p.add_argument("--pressure", type=int, default=0,
                   help="r3 stall root-cause probe: compile-and-run N "
                        "DISTINCT dummy programs every --pressure-every "
                        "ticks to force server-side executable-cache "
                        "pressure. If the rare fused-tick stall is an "
                        "eviction+recompile of the big fused program, "
                        "stalls should become reproducible on demand.")
    p.add_argument("--pressure-every", type=int, default=25)
    args = p.parse_args()

    import numpy as np

    from tools._serving_harness import build_streamer

    kw = {}
    if args.watchdog == "-":
        kw["stall_watchdog_s"] = None
    elif args.watchdog is not None:
        kw["stall_watchdog_s"] = float(args.watchdog)
    if args.dcap != -1:
        kw["decode_bucket_cap"] = args.dcap or None
    ms, cfg, _ = build_streamer(max_sessions=args.max_sessions,
                                fused=bool(args.fused), **kw)

    import jax

    rng = np.random.default_rng(0)
    push = int(cfg.sr * args.push_seconds)

    def audio():
        return (rng.standard_normal(push) * 8000).astype(np.int16)

    import jax.numpy as jnp

    pressure_n = [0]  # unique-shape counter across the whole run

    def apply_pressure(n_programs):
        """Compile + run n distinct never-seen programs (unique static
        shapes → unique executables). Each is a chain of matmuls so the
        executable has some size; runtime is trivial. Pressure compiles are
        intentionally NOT serveable from any compile cache: shapes are
        monotonic within the run, and a per-burst time salt is baked into
        the HLO so reruns never hit the persistent cache either."""
        t0 = time.perf_counter()
        # run-unique salt baked into the program as a CONSTANT: a fresh HLO
        # (hence a persistent-cache miss) every run even when two runs'
        # shape sequences collide. The previous pid%64 shape offset aliased
        # for ~half of pid pairs (8*p1 ≡ 8*p2 mod 16), letting a rerun's
        # "pressure" burst be served entirely from the persistent cache —
        # i.e. no compile pressure at all.
        salt = 1e-3 + (time.time_ns() % 1_000_003) * 1e-12
        for _ in range(n_programs):
            pressure_n[0] += 1
            # monotonic within the run (never wraps back onto an earlier
            # shape → never served by the in-process caches mid-run)
            n = 256 + 16 * pressure_n[0]

            def chain(x):
                for _ in range(8):
                    # salt is a closure constant → baked into the traced
                    # HLO as a literal, so the program (and its cache key)
                    # really is run-unique
                    x = jnp.tanh(x @ x + salt)
                return x.sum()

            float(jax.jit(chain)(jnp.ones((n, n), jnp.bfloat16) * 1e-3))
        return time.perf_counter() - t0

    sids = [ms.open() for _ in range(args.sessions)]
    frames = {sid: 0 for sid in sids}
    lat = []
    flipped_at = None
    pressure_ticks = set()
    for t in range(args.ticks):
        if args.pressure and t and t % args.pressure_every == 0:
            dt_p = apply_pressure(args.pressure)
            pressure_ticks.add(t)
            print(f"tick {t}: pressure burst ({args.pressure} programs, "
                  f"{dt_p:.1f} s)", flush=True)
        if args.churn and t and t % args.churn == 0:
            old = sids.pop(0)
            # flush() returns the tail frames it finalized (its internal
            # ticks aren't seen by the loop below) — count them
            frames[old] = frames.get(old, 0) + ms.flush(old)
            ms.pop_frames(old)
            ms.close(old)
            sids.append(ms.open())
            frames.setdefault(sids[-1], 0)
        for sid in sids:
            ms.push_audio(sid, audio())
        t1 = time.perf_counter()
        out = ms.tick()
        dt = time.perf_counter() - t1
        lat.append(dt)
        for sid, n in out.items():
            frames[sid] = frames.get(sid, 0) + n
        if dt > 5.0:
            # slow-tick forensics: distance to the last pressure burst is
            # the causal signal (stall right after a burst = eviction)
            since = (t - max((pt for pt in pressure_ticks if pt <= t),
                             default=-1)) if pressure_ticks else None
            print(f"tick {t}: SLOW {dt:.1f} s "
                  f"(ticks since pressure burst: {since})", flush=True)
        if flipped_at is None and bool(args.fused) and not ms.fused:
            flipped_at = t
            print(f"watchdog flipped to two-dispatch at tick {t} "
                  f"({dt:.1f} s tick)", flush=True)
        if t % 100 == 0:
            print(f"tick {t}: {dt * 1e3:.0f} ms, "
                  f"{sum(frames.values())} frames total", flush=True)
    live_frames = int(sum(frames.values()))  # delivered during ticks —
    # the liveness signal: a decode cap too small for the session count
    # shows up as a growing backlog that only drains in the final flush
    for sid in sids:
        frames[sid] = frames.get(sid, 0) + ms.flush(sid)
        ms.pop_frames(sid)
        ms.close(sid)

    ms_lat = np.asarray(lat) * 1e3
    rec = {
        "name": args.name, "ticks": args.ticks, "fused": bool(args.fused),
        "sessions": args.sessions, "churn": args.churn,
        "dcap": ms.decode_bucket_cap,
        "p50_ms": round(float(np.percentile(ms_lat, 50)), 1),
        "p95_ms": round(float(np.percentile(ms_lat, 95)), 1),
        "p99_ms": round(float(np.percentile(ms_lat, 99)), 1),
        "max_ms": round(float(ms_lat.max()), 1),
        "stalls_over_30s": int((ms_lat > 30_000).sum()),
        "slow_over_5s": int((ms_lat > 5_000).sum()),
        "pressure": args.pressure, "pressure_every": args.pressure_every,
        "watchdog_flip_tick": flipped_at,
        "total_frames": int(sum(frames.values())),
        "live_frames": live_frames,
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
