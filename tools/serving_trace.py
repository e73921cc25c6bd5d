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
    args = p.parse_args()

    import numpy as np

    from neurosync_trainer_lite_tpu.utils.compilation_cache import (
        enable_persistent_cache)

    enable_persistent_cache()

    import jax

    from neurosync_trainer_lite_tpu.config import Config
    from neurosync_trainer_lite_tpu.inference.multi_stream import MultiStreamer
    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq

    cfg = Config(dropout=0.0)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    ms = MultiStreamer(params, cfg, max_sessions=args.k,
                       fused_decode=bool(args.fused), stall_watchdog_s=None)
    t0 = time.perf_counter()
    ms.warmup(warm_fallback=False)
    print(f"warmup {time.perf_counter() - t0:.1f} s", flush=True)

    rng = np.random.default_rng(0)
    sids = [ms.open() for _ in range(args.k)]
    for sid in sids:
        ms.push_audio(sid, (rng.standard_normal(int(cfg.sr * 2.2)) * 8000
                            ).astype(np.int16))
    while ms.tick():
        pass

    win_stride_s = (cfg.frame_size - cfg.overlap) / cfg.frame_rate
    top = int(cfg.sr * (win_stride_s + 0.3))
    jax.profiler.start_trace(args.trace_dir)
    n_decode = 0
    for _ in range(args.reps):
        for sid in sids:
            ms.push_audio(sid, (rng.standard_normal(top) * 8000
                                ).astype(np.int16))
        for _ in range(8):
            out = ms.tick()
            if sum(out.values()) > 0:
                n_decode += 1
                break
        while ms.tick():
            pass
    jax.profiler.stop_trace()
    print(f"{n_decode} decode ticks traced (plus catch-up/intake ticks)")

    attribute(args.trace_dir, n_decode)
    return 0


if __name__ == "__main__":
    sys.exit(main())
