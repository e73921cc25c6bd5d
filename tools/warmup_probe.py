"""Measure cold serving warmup: time-to-serve with the background warmer.

VERDICT r3 weak #3 / next-round #7: the production max_sessions=32 cold
warmup cost was never measured, and the background fallback warmer
(`MultiStreamer.warmup(background_fallback=True)`, server
`--background_warmup`) had no number behind it. One cold process measures
everything at once:

  1. warmup(background_fallback=True) — wall time until return is the
     TIME-TO-SERVE (the fused family, everything live ticks touch, warmed
     and forced);
  2. immediately run a churn soak (sessions opening/closing under live
     pushes) WHILE the daemon thread warms the two-dispatch insurance
     family — any mid-session compile shows up as a multi-second tick;
  3. wait_background_warmup() — total wall time to fully-warmed is the
     number a foreground (background_fallback=False) deployment would
     have paid before serving its first tick.

COLD means: do NOT call enable_persistent_cache() here (the CLIs enable it
by default; a fresh process without it re-compiles everything), and the
run is only honest on a machine/day where the serving family wasn't JIT'd
into the in-process cache — each invocation is one fresh process, so that
holds by construction.

Usage:
  python tools/warmup_probe.py [--sessions 32] [--format s16]
      [--soak-ticks 150] [--live 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=32)
    ap.add_argument("--serve-buckets", type=int, default=None,
                    help="progressive warmup: eager rungs ≤ bucket(N)")
    ap.add_argument("--format", default="s16", choices=("s16", "f32", "both"))
    ap.add_argument("--soak-ticks", type=int, default=150)
    ap.add_argument("--live", type=int, default=4,
                    help="live sessions during the churn soak")
    ap.add_argument("--churn-every", type=int, default=30,
                    help="close+reopen one session every N ticks")
    ap.add_argument("--out", default="/tmp/warmup_probe_results.jsonl")
    args = ap.parse_args()

    import jax

    from neurosync_trainer_lite_tpu.config import full_config
    from neurosync_trainer_lite_tpu.inference.multi_stream import MultiStreamer
    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq

    cfg = full_config()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    fmts = ("f32", "s16") if args.format == "both" else (args.format,)
    ms = MultiStreamer(params, cfg, max_sessions=args.sessions,
                       push_formats=fmts)

    print(f"cold warmup: max_sessions={args.sessions} formats={fmts} "
          f"decode_cap={ms.decode_bucket_cap} (background fallback"
          + (f", serve_buckets={args.serve_buckets}" if args.serve_buckets
             else "") + ")", flush=True)
    t0 = time.time()
    n_fused = ms.warmup(background_fallback=True,
                        serve_buckets=args.serve_buckets)
    tts = time.time() - t0
    print(f"time-to-serve ({n_fused} eager programs): {tts:.1f} s",
          flush=True)

    # churn soak while the daemon warms the fallback family
    rng = np.random.default_rng(0)
    chunk = int(cfg.sr * 0.5)
    sids = [ms.open() for _ in range(args.live)]
    walls = []
    for t in range(args.soak_ticks):
        if t and t % args.churn_every == 0:
            ms.close(sids.pop(0))
            sids.append(ms.open())
        for sid in sids:
            pcm = (rng.standard_normal(chunk) * 0.2 * 32767).astype(np.int16)
            ms.push_audio(sid, pcm)
        w0 = time.perf_counter()
        ms.tick()
        walls.append(time.perf_counter() - w0)
        for sid in sids:
            ms.pop_frames(sid)
    w = np.array(walls) * 1e3
    soak = {"p50": round(float(np.percentile(w, 50)), 1),
            "p95": round(float(np.percentile(w, 95)), 1),
            "max": round(float(w.max()), 1)}
    print(f"churn soak during background warmup: {soak}", flush=True)

    bg_done = ms.wait_background_warmup(timeout=3600.0)
    total = time.time() - t0
    print(f"fully warmed (fallback family too): {total:.1f} s "
          f"(bg completed: {bg_done})", flush=True)

    rec = {"sessions": args.sessions, "serve_buckets": args.serve_buckets,
           "formats": list(fmts),
           "n_fused_programs": n_fused, "time_to_serve_s": round(tts, 1),
           "total_warm_s": round(total, 1), "soak_tick_ms": soak,
           "bg_completed": bg_done}
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
