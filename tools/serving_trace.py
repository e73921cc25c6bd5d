"""Device-trace a MultiStreamer decode tick and attribute its device time.

Answers "where do the ~250 ms of a K=12 fused decode tick actually go?"
(frontend DFT/FFT vs decode vs transfer) with jax.profiler leaf-op data
instead of arithmetic guesses. Reuses tools/tpu_trace.py's parser.

Usage: python tools/serving_trace.py /tmp/servtrace [--k 12] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_trace import attribute  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--k", type=int, default=12)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--fused", type=int, default=1)
    p.add_argument("--format", default="both", choices=("s16", "f32", "both"),
                   help="push format(s) to warm/use — s16 matches the "
                   "production single-format deployment and its cache")
    args = p.parse_args()

    import numpy as np

    from tools._serving_harness import (
        build_streamer, hunt_decode_tick, prime_sessions, window_stride_s)

    fmts = ("f32", "s16") if args.format == "both" else (args.format,)
    # watchdog off (a stall must show in the trace, not auto-recover);
    # fallback family not warmed — it would pollute the traced program set
    ms, cfg, _ = build_streamer(max_sessions=args.k, fused=bool(args.fused),
                                stall_watchdog_s=None, warm_fallback=False,
                                push_formats=fmts)

    import jax

    rng = np.random.default_rng(0)
    sids = prime_sessions(ms, cfg, args.k, rng)

    top = int(cfg.sr * (window_stride_s(cfg) + 0.3))
    jax.profiler.start_trace(args.trace_dir)
    n_decode = 0
    for _ in range(args.reps):
        # hunt_decode_tick drains catch-up ticks inside the traced region —
        # attribute() divides leaf time by n_decode, so the printout below
        # notes the extra intake ticks explicitly
        hunt_decode_tick(ms, sids, rng, cfg, top_samples=top)
        n_decode += 1
    jax.profiler.stop_trace()
    print(f"{n_decode} decode ticks traced (plus catch-up/intake ticks)")

    attribute(args.trace_dir, n_decode)
    return 0


if __name__ == "__main__":
    sys.exit(main())
