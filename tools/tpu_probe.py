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
    p.add_argument("--scope", default="all")
    p.add_argument("--remat-layers", type=int, default=-1)
    p.add_argument("--rng", default="threefry", choices=("threefry", "rbg"))
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--amp", type=int, default=1)
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--patch", default=None,
                   choices=("norope", "noln", "nosoftmax", "noattn", "noffn",
                            "fastattn", "fusedqkv", "projonly", "notranspose",
                            "attndrop-skip", "attndrop-bf16", "softmax-vjp16",
                            "scores-bf16", "ln-vjp16"),
                   help="ablate/prototype a component (diagnostic only)")
    args = p.parse_args()

    if args.patch == "attndrop-skip":
        # diagnostic: disable ONLY the attention-weight dropout (keep
        # residual/FFN dropout) to isolate the [B,n,T,T]-mask cost
        from neurosync_trainer_lite_tpu.ops import attention as am
        orig_sdpa = am.sdpa

        def sdpa_nodrop(q, k, v, **kw):
            kw["dropout_rate"] = 0.0
            return orig_sdpa(q, k, v, **kw)

        am.sdpa = sdpa_nodrop
    elif args.patch == "attndrop-bf16":
        # prototype: apply attention-weight dropout AFTER the bf16 cast the
        # second einsum needs anyway (halves that op's HBM traffic; the mask
        # multiply rounds in bf16 instead of fp32 — semantically identical)
        import jax
        import jax.numpy as jnp
        from neurosync_trainer_lite_tpu.ops import attention as am

        def sdpa_bf16drop(q, k, v, *, dropout_rate=0.0, rng=None, train=False,
                          impl="auto"):
            scale = q.shape[-1] ** -0.5
            scores = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            weights = am.dropout(weights.astype(v.dtype), dropout_rate, rng,
                                 train)
            out = jnp.einsum("bnqk,bnkh->bnqh", weights, v,
                             preferred_element_type=jnp.float32)
            return out.astype(v.dtype)

        am.sdpa = sdpa_bf16drop
    elif args.patch == "softmax-vjp16":
        # prototype: custom-vjp softmax that RETURNS AND SAVES bf16 weights —
        # the fp32 [B,n,T,T] softmax output is never a backward residual
        # (fwd math unchanged: the weights einsum already consumes bf16)
        import jax
        import jax.numpy as jnp
        from neurosync_trainer_lite_tpu.ops import attention as am

        @jax.custom_vjp
        def softmax16(s):
            return jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)

        def softmax16_fwd(s):
            w = softmax16(s)
            return w, w

        def softmax16_bwd(w, dw):
            wf = w.astype(jnp.float32)
            dwf = dw.astype(jnp.float32)
            ds = wf * (dwf - jnp.sum(dwf * wf, axis=-1, keepdims=True))
            return (ds,)

        softmax16.defvjp(softmax16_fwd, softmax16_bwd)

        def sdpa16(q, k, v, *, dropout_rate=0.0, rng=None, train=False,
                   impl="auto"):
            scale = q.shape[-1] ** -0.5
            scores = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            weights = softmax16(scores.astype(jnp.float32))
            weights = am.dropout(weights, dropout_rate, rng, train)
            out = jnp.einsum("bnqk,bnkh->bnqh", weights, v,
                             preferred_element_type=jnp.float32)
            return out.astype(v.dtype)

        am.sdpa = sdpa16
    elif args.patch == "scores-bf16":
        # prototype: the entire [B,n,T,T] chain in bf16 — scores come out of
        # the MXU as bf16 (fp32 internal accumulate, one output rounding),
        # softmax stats in fp32 inside a custom vjp, cotangents bf16
        import jax
        import jax.numpy as jnp
        from neurosync_trainer_lite_tpu.ops import attention as am

        @jax.custom_vjp
        def softmax_b16(s):  # s bf16
            return jax.nn.softmax(s.astype(jnp.float32),
                                  axis=-1).astype(jnp.bfloat16)

        def softmax_b16_fwd(s):
            w = softmax_b16(s)
            return w, w

        def softmax_b16_bwd(w, dw):
            wf = w.astype(jnp.float32)
            dwf = dw.astype(jnp.float32)
            ds = wf * (dwf - jnp.sum(dwf * wf, axis=-1, keepdims=True))
            return (ds.astype(jnp.bfloat16),)

        softmax_b16.defvjp(softmax_b16_fwd, softmax_b16_bwd)

        def sdpa_sb16(q, k, v, *, dropout_rate=0.0, rng=None, train=False,
                      impl="auto"):
            scale = jnp.asarray(q.shape[-1] ** -0.5, jnp.bfloat16)
            scores = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                                preferred_element_type=jnp.bfloat16) * scale
            weights = softmax_b16(scores)
            weights = am.dropout(weights, dropout_rate, rng, train)
            out = jnp.einsum("bnqk,bnkh->bnqh", weights, v,
                             preferred_element_type=jnp.float32)
            return out.astype(v.dtype)

        am.sdpa = sdpa_sb16
    elif args.patch == "ln-vjp16":
        # prototype: custom-vjp LayerNorm saving only the bf16 input plus
        # [B,T,1] fp32 stats (XLA autodiff keeps [B,T,H] fp32 intermediates)
        import jax
        import jax.numpy as jnp
        from neurosync_trainer_lite_tpu.models import seq2seq as s2s

        EPS = 1e-5

        @jax.custom_vjp
        def ln16(x, scale, bias):
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + EPS)
            return (y * scale + bias).astype(x.dtype)

        def ln16_fwd(x, scale, bias):
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            r = jax.lax.rsqrt(var + EPS)
            y = (xf - mean) * r
            out = (y * scale + bias).astype(x.dtype)
            return out, (x, mean, r, scale)

        def ln16_bwd(res, dout):
            x, mean, r, scale = res
            xf = x.astype(jnp.float32)
            y = (xf - mean) * r
            df = dout.astype(jnp.float32)
            dscale = jnp.sum(df * y, axis=tuple(range(df.ndim - 1)))
            dbias = jnp.sum(df, axis=tuple(range(df.ndim - 1)))
            dy = df * scale
            m1 = jnp.mean(dy, axis=-1, keepdims=True)
            m2 = jnp.mean(dy * y, axis=-1, keepdims=True)
            dx = (r * (dy - m1 - y * m2)).astype(x.dtype)
            return dx, dscale, dbias

        ln16.defvjp(ln16_fwd, ln16_bwd)

        def layer_norm16(x, p, eps=1e-5):
            if x.dtype != jnp.bfloat16:
                return _orig_ln(x, p, eps)
            return ln16(x, p["scale"].astype(jnp.float32),
                        p["bias"].astype(jnp.float32))

        _orig_ln = s2s.layer_norm
        s2s.layer_norm = layer_norm16

    if args.patch == "norope":
        from neurosync_trainer_lite_tpu.ops import rope
        rope.apply_rope = lambda x, tables: x
    elif args.patch == "noln":
        from neurosync_trainer_lite_tpu.models import seq2seq
        seq2seq.layer_norm = lambda x, p, eps=1e-5: x
    elif args.patch == "nosoftmax":
        import jax.nn
        from neurosync_trainer_lite_tpu.ops import attention
        def sdpa_nosm(q, k, v, **kw):
            import jax.numpy as jnp
            scores = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                                preferred_element_type=jnp.float32)
            out = jnp.einsum("bnqk,bnkh->bnqh", scores.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            return out.astype(v.dtype)
        attention.sdpa = sdpa_nosm
    elif args.patch == "noattn":
        from neurosync_trainer_lite_tpu.ops import attention
        attention.multi_head_attention = (
            lambda params, q, k, v, **kw: q)
    elif args.patch == "noffn":
        from neurosync_trainer_lite_tpu.models import seq2seq
        seq2seq._ffn = lambda p, x, **kw: x
    elif args.patch == "projonly":
        # attention = projections + rope only; sdpa + head split skipped
        from neurosync_trainer_lite_tpu.ops import attention as am
        from neurosync_trainer_lite_tpu.models import seq2seq
        from neurosync_trainer_lite_tpu.ops.rope import rope_qk_preheads

        def mha(params, query, key, value, *, num_heads, dropout_rate=0.0,
                rng=None, train=False, use_rope=True, impl="auto"):
            q = am._linear(query, params["q"])
            k = am._linear(key, params["k"])
            v = am._linear(value, params["v"])
            if use_rope:
                q, k = rope_qk_preheads(q, k, num_heads)
            return am._linear(v + 0.0 * (q + k), params["out"])

        am.multi_head_attention = mha
        seq2seq.multi_head_attention = mha
    elif args.patch in ("fastattn", "fusedqkv"):
        import jax.numpy as jnp
        from neurosync_trainer_lite_tpu.ops import attention as attn_mod
        from neurosync_trainer_lite_tpu.models import seq2seq
        from neurosync_trainer_lite_tpu.ops.rope import rope_qk_preheads
        fused = args.patch == "fusedqkv"

        def mha(params, query, key, value, *, num_heads, dropout_rate=0.0,
                rng=None, train=False, use_rope=True, impl="auto"):
            B, Tq, H = query.shape
            h = H // num_heads
            if fused and query is key and key is value:
                wqkv = jnp.concatenate(
                    [params[n]["w"] for n in ("q", "k", "v")], axis=-1)
                bqkv = jnp.concatenate(
                    [params[n]["b"] for n in ("q", "k", "v")], axis=-1)
                qkv = (jnp.dot(query, wqkv.astype(query.dtype),
                               preferred_element_type=jnp.float32)
                       + bqkv.astype(jnp.float32)).astype(query.dtype)
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = attn_mod._linear(query, params["q"])
                k = attn_mod._linear(key, params["k"])
                v = attn_mod._linear(value, params["v"])
            if use_rope:
                q, k = rope_qk_preheads(q, k, num_heads)
            # transpose-free: contract straight from [B, T, n, h]
            q4 = q.reshape(B, Tq, num_heads, h)
            k4 = k.reshape(B, k.shape[1], num_heads, h)
            v4 = v.reshape(B, v.shape[1], num_heads, h)
            s = jnp.einsum("bqnh,bknh->bnqk", q4, k4,
                           preferred_element_type=jnp.float32) * (h ** -0.5)
            w = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bnqk,bknh->bqnh", w.astype(v4.dtype), v4,
                           preferred_element_type=jnp.float32)
            o = o.astype(v.dtype).reshape(B, Tq, H)
            return attn_mod._linear(o, params["out"])

        import jax
        attn_mod.multi_head_attention = mha
        seq2seq.multi_head_attention = mha

    import jax
    import jax.numpy as jnp
    from neurosync_trainer_lite_tpu.config import full_config

    cfg = full_config(dropout=args.dropout, remat=bool(args.remat),
                      remat_policy=args.policy, remat_scope=args.scope,
                      remat_layers=args.remat_layers,
                      attention_impl=args.attn, use_amp=bool(args.amp))
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
        if args.rng == "rbg":
            key = jax.random.key(0, impl="rbg")
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
