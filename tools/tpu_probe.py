"""One-shot TPU measurement probe (run one config per process, print JSON).

The axon tunnel to the single real chip is flaky; this tool makes perf sweeps
restartable: each invocation measures exactly one configuration and appends
one JSON line to the results file, so a bash retry loop composes the sweep.

Usage: python tools/tpu_probe.py NAME [--out FILE] [--b B] [--steps N]
           [--attn auto|xla] [--remat 0|1] [--policy full|dots]
           [--dropout R] [--fwd-only] [--amp 0|1]
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
    p.add_argument("--out", default="/tmp/tpu_probe_results.jsonl")
    p.add_argument("--b", type=int, default=128)
    p.add_argument("--t", type=int, default=128)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--attn", default="auto")
    p.add_argument("--remat", type=int, default=1)
    p.add_argument("--policy", default="full")
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--amp", type=int, default=1)
    p.add_argument("--fwd-only", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from neurosync_trainer_lite_tpu.config import full_config

    cfg = full_config(dropout=args.dropout, remat=bool(args.remat),
                      remat_policy=args.policy, attention_impl=args.attn,
                      use_amp=bool(args.amp))
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (args.b, args.t, cfg.input_dim), jnp.float32)

    if args.fwd_only:
        from neurosync_trainer_lite_tpu.models.seq2seq import (
            init_seq2seq, seq2seq_apply)
        params = init_seq2seq(key, cfg)
        f = jax.jit(lambda p, s: seq2seq_apply(p, s, cfg, train=False))
        for _ in range(3):
            out = f(params, src)
        float(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = f(params, src)
        float(out.ravel()[0])
        dt = time.perf_counter() - t0
    else:
        from neurosync_trainer_lite_tpu.training.step import (
            init_train_state, make_train_step)
        state, tx = init_train_state(cfg, steps_per_epoch=100)
        step = make_train_step(cfg, tx)
        trg = jax.random.normal(key, (args.b, args.t, cfg.output_dim),
                                jnp.float32)
        for i in range(3):
            state, loss, gn = step(state, src, trg, jax.random.fold_in(key, i))
        float(loss)
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, loss, gn = step(state, src, trg, jax.random.fold_in(key, i))
        float(loss)
        dt = time.perf_counter() - t0

    rec = {"name": args.name, "samples_per_sec": round(args.steps * args.b / dt, 1),
           "ms_per_step": round(dt / args.steps * 1e3, 2), "b": args.b,
           "t": args.t}
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
