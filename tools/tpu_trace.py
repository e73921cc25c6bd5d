"""Capture + attribute a jax.profiler device trace of the shipped train step.

jax.profiler traces DO work through the axon tunnel; tensorboard is not
needed — this parses the Chrome-format trace.json.gz directly and prints
leaf device-op time grouped by fusion kind, sorted. One config per process
(same discipline as tpu_probe.py). The r3 attributions in docs/PERF.md came
from this flow.

Usage: python tools/tpu_trace.py /tmp/r3trace2 [--dropout 0.3] [--steps 5]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def attribute(trace_dir: str, n_steps: int):
    """Sum leaf device-op durations by op-group over the traced steps."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"]["name"]}
    # leaf ops live on the "XLA Ops"/"Async XLA Ops" threads; "Steps"/"XLA
    # Modules" are container spans that would double-count everything
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in tpu_pids
               and "XLA Ops" in e["args"]["name"]}
    by_group = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        dur = e.get("dur", 0)  # microseconds
        name = e.get("name", "")
        # group: strip trailing .N / digits so fusion families collapse
        g = re.sub(r"[.\d]+$", "", name)
        # container spans (their children are recorded on the same thread
        # and would double-count): lax.scan's `while`, remat's call wrappers
        if g in ("while", "closed_call", "call", "checkpoint", "conditional"):
            continue
        by_group[g] += dur
        by_op[name] += dur
        total += dur
    print(f"\n== device-op attribution over {n_steps} steps "
          f"({total / n_steps / 1e3:.1f} ms/step of leaf device time) ==")
    for g, us in by_group.most_common(30):
        print(f"{us / n_steps / 1e3:8.1f} ms/step  {100 * us / total:5.1f}%  {g}")
    print("\n== top individual ops ==")
    for name, us in by_op.most_common(25):
        print(f"{us / n_steps / 1e3:8.2f} ms/step  {name}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--dropout", type=float, default=0.3)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--parse-only", action="store_true",
                   help="skip capture; attribute an existing trace dir")
    args = p.parse_args()

    if not args.parse_only:
        from neurosync_trainer_lite_tpu.utils.compilation_cache import (
            enable_persistent_cache)

        enable_persistent_cache()

        import jax
        import jax.numpy as jnp

        from neurosync_trainer_lite_tpu.config import full_config
        from neurosync_trainer_lite_tpu.training.loop import _maybe_auto_remat
        from neurosync_trainer_lite_tpu.training.step import (
            init_train_state, make_train_step)

        cfg = _maybe_auto_remat(full_config(dropout=args.dropout), 1,
                                verbose=False)
        state, tx = init_train_state(cfg, steps_per_epoch=100)
        step = make_train_step(cfg, tx)
        key = jax.random.PRNGKey(0)
        src = jax.random.normal(key, (cfg.batch_size, cfg.micro_batch_size,
                                      cfg.input_dim), jnp.float32)
        trg = jax.random.normal(key, (cfg.batch_size, cfg.micro_batch_size,
                                      cfg.output_dim), jnp.float32)
        dk = jax.random.key(0, impl=cfg.prng_impl)
        for i in range(3):  # warm/compile outside the trace
            state, loss, gn = step(state, src, trg, jax.random.fold_in(dk, i))
        float(loss)
        jax.profiler.start_trace(args.trace_dir)
        for i in range(args.steps):
            state, loss, gn = step(state, src, trg, jax.random.fold_in(dk, i))
        float(loss)  # force-sync through the tunnel before stopping
        jax.profiler.stop_trace()

    attribute(args.trace_dir, args.steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
