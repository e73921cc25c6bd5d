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
    p.add_argument("--unroll", type=int, default=0,
                   help="prototype: lax.scan unroll factor for the layer scans")
    p.add_argument("--cache", type=int, default=1,
                   help="persistent XLA compile cache (skip recompiles "
                        "across probe retries — the tunnel is flaky); pass "
                        "0 when measuring compile time itself")
    p.add_argument("--patch", default=None,
                   choices=("norope", "noln", "nosoftmax", "noattn", "noffn",
                            "fastattn", "fusedqkv", "projonly", "notranspose",
                            "attndrop-skip", "attndrop-bf16",
                            "attn-fp32-chain", "ln-autodiff", "ffn-autodiff",
                            "unroll-dec-tail", "unroll-remat-head",
                            "sdpa-nonlean", "sdpa-lean-nosplit", "no-opt",
                            "grads-bf16-stage", "no-gradnorm",
                            "ffn-bwd-pallas"),
                   help="ablate/prototype a component (diagnostic only). "
                        "The r3 forward prototypes (ffn-nokeep, "
                        "dropout-regen, mask-lean) SHIPPED as defaults and "
                        "were removed — they measured zero delta once "
                        "identical code became the baseline; ffn-autodiff / "
                        "ln-autodiff / sdpa-nonlean are their reverse "
                        "ablations (docs/PERF.md has the win tables)")
    p.add_argument("--ffn-bm", type=int, default=256,
                   help="ffn-bwd-pallas tile rows (per-grid-step "
                        "latency amortization knob)")
    p.add_argument("--ffn-bias", type=int, default=1,
                   help="ffn-bwd-pallas: 0 ablates the in-kernel bias "
                        "partials (bias grads sum in XLA instead)")
    p.add_argument("--unroll-residents", type=int, default=1,
                   help="Config.unroll_residents (1 = shipped default; 0 "
                        "ablates back to lax.scan-ing resident layers)")
    args = p.parse_args()

    if args.cache:
        from neurosync_trainer_lite_tpu.utils.compilation_cache import (
            enable_persistent_cache)
        enable_persistent_cache()

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
    elif args.patch == "attn-fp32-chain":
        # REVERSE ablation: restore the round-1 fp32 attention chain (fp32
        # logits/softmax residual/cotangents) over the shipped bf16 default —
        # measures what the bf16 [B,n,T,T] chain is worth on this chip
        import jax
        import jax.numpy as jnp
        from neurosync_trainer_lite_tpu.ops import attention as am

        def sdpa_fp32(q, k, v, *, dropout_rate=0.0, rng=None, train=False,
                      impl="auto"):
            scale = q.shape[-1] ** -0.5
            scores = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            weights = am.dropout(weights, dropout_rate, rng, train)
            out = jnp.einsum("bnqk,bnkh->bnqh", weights.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            return out.astype(v.dtype)

        am.sdpa = sdpa_fp32
    elif args.patch == "ffn-autodiff":
        # REVERSE ablation: plain-autodiff FFN (keeps the pre-relu [B,T,4H]
        # residual at every site) over the shipped lean-residual custom vjp
        import jax as _jax
        from neurosync_trainer_lite_tpu.models import seq2seq as s2s
        from neurosync_trainer_lite_tpu.ops.attention import _linear, dropout

        def ffn_plain(p, x, *, rate, rng, train):
            h = _linear(x, p["linear1"])
            h = _jax.nn.relu(h)
            h = dropout(h, rate, rng, train)
            return _linear(h, p["linear2"])

        s2s._ffn = ffn_plain
    if args.patch == "ln-autodiff":
        # REVERSE ablation: plain-autodiff LayerNorm (fp32 [B,T,H] residuals)
        # over the shipped lean-residual custom vjp
        import jax
        import jax.numpy as jnp
        from neurosync_trainer_lite_tpu.models import seq2seq as s2s

        def ln_plain(x, p, eps=1e-5):
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + eps)
            y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
            return y.astype(x.dtype)

        s2s.layer_norm = ln_plain

    if args.patch == "sdpa-nonlean":
        # REVERSE ablation: compose scores→softmax→dropout→out from the
        # individual custom-vjp pieces (autodiff keeps the two [B,n,T,T]
        # bf16 residuals per site) instead of the shipped lean SDPA core
        # that recomputes the chain in the backward from (q, k, key)
        from neurosync_trainer_lite_tpu.ops import attention as am
        am.SDPA_LEAN = False

    if args.patch == "sdpa-lean-nosplit":
        # prototype: the lean SDPA core operating on UNSPLIT heads —
        # q/k/v stay [B, T, n, h] reshape-views (no [B, n, T, h] transpose
        # materialization fwd or bwd); einsums contract straight from the
        # token-major layout. Asks whether the head-split transposes and
        # their backward twins are worth folding into the shipped core.
        import functools as _ft
        import jax as _jax
        import jax.numpy as _jnp
        from neurosync_trainer_lite_tpu.ops import attention as am
        from neurosync_trainer_lite_tpu.ops.rope import rope_qk_preheads

        @_ft.partial(_jax.custom_vjp, nondiff_argnums=(4, 5))
        def lean_nosplit(q, k, v, rng, scale, qthresh):
            s = _jnp.einsum("bqnh,bknh->bnqk", q, k,
                            preferred_element_type=_jnp.bfloat16
                            ) * _jnp.asarray(scale, _jnp.bfloat16)
            w = _jax.nn.softmax(s.astype(_jnp.float32), axis=-1
                                ).astype(_jnp.bfloat16)
            if qthresh > 0:
                keep = am.dropout_keep(rng, w.shape, qthresh)
                dsc = _jnp.asarray(256.0 / (256 - qthresh), w.dtype)
                w = _jnp.where(keep, w * dsc, 0).astype(w.dtype)
            out = _jnp.einsum("bnqk,bknh->bqnh", w, v,
                              preferred_element_type=_jnp.float32)
            return out.astype(v.dtype)

        def lean_nosplit_fwd(q, k, v, rng, scale, qthresh):
            return lean_nosplit(q, k, v, rng, scale, qthresh), (q, k, v, rng)

        def lean_nosplit_bwd(scale, qthresh, res, dout):
            q, k, v, rng = res
            s = _jnp.einsum("bqnh,bknh->bnqk", q, k,
                            preferred_element_type=_jnp.bfloat16
                            ) * _jnp.asarray(scale, _jnp.bfloat16)
            w = _jax.nn.softmax(s.astype(_jnp.float32), axis=-1
                                ).astype(_jnp.bfloat16)
            if qthresh > 0:
                keep = am.dropout_keep(rng, w.shape, qthresh)
                dsc = _jnp.asarray(256.0 / (256 - qthresh), w.dtype)
                wd = _jnp.where(keep, w * dsc, 0).astype(w.dtype)
            else:
                wd = w
            dv = _jnp.einsum("bnqk,bqnh->bknh", wd, dout,
                             preferred_element_type=_jnp.float32
                             ).astype(v.dtype)
            dwd = _jnp.einsum("bqnh,bknh->bnqk", dout, v,
                              preferred_element_type=_jnp.float32
                              ).astype(w.dtype)
            if qthresh > 0:
                dw = _jnp.where(keep, dwd * dsc, 0).astype(dwd.dtype)
            else:
                dw = dwd
            wf = w.astype(_jnp.float32)
            dwf = dw.astype(_jnp.float32)
            ds = (wf * (dwf - _jnp.sum(dwf * wf, axis=-1, keepdims=True))
                  ).astype(_jnp.bfloat16)
            ds = ds * _jnp.asarray(scale, _jnp.bfloat16)
            dq = _jnp.einsum("bnqk,bknh->bqnh", ds, k,
                             preferred_element_type=_jnp.bfloat16)
            dk = _jnp.einsum("bnqk,bqnh->bknh", ds, q,
                             preferred_element_type=_jnp.bfloat16)
            return dq, dk, dv, None

        lean_nosplit.defvjp(lean_nosplit_fwd, lean_nosplit_bwd)

        def mha_nosplit(params, query, key, value, *, num_heads,
                        dropout_rate=0.0, rng=None, train=False,
                        use_rope=True, impl="auto"):
            B, Tq, H = query.shape
            h = H // num_heads
            q = am._linear(query, params["q"])
            k = am._linear(key, params["k"])
            v = am._linear(value, params["v"])
            if rng is not None and train:
                rng_attn, rng_resid = _jax.random.split(rng)
            else:
                rng_attn = rng_resid = None
            if use_rope:
                q, k = rope_qk_preheads(q, k, num_heads)
            q4 = q.reshape(B, Tq, num_heads, h)
            k4 = k.reshape(B, k.shape[1], num_heads, h)
            v4 = v.reshape(B, v.shape[1], num_heads, h)
            drop = train and dropout_rate > 0.0 and rng_attn is not None
            qt = am.dropout_mask_q(dropout_rate) if drop else 0
            kk = rng_attn if qt > 0 else _jax.random.PRNGKey(0)
            out = lean_nosplit(q4, k4, v4, kk, h ** -0.5, qt
                               ).reshape(B, Tq, H)
            out = am._linear(out, params["out"])
            return am.dropout(out, dropout_rate, rng_resid, train)

        from neurosync_trainer_lite_tpu.models import seq2seq as s2s
        am.multi_head_attention = mha_nosplit
        s2s.multi_head_attention = mha_nosplit

    if args.patch == "ffn-bwd-pallas":
        # prototype (VERDICT r4 ask #2): route the FFN backward's
        # dam/mask-apply/bias-grad chain through the fused Pallas kernel
        # (ops/ffn_bwd_pallas.py) — kills the [B,T,4H] dam intermediate
        # round-trip (the compare_select block) and the two cotangent
        # re-reads for db1/db2 (part of convert_reduce)
        from neurosync_trainer_lite_tpu.models import seq2seq as s2s
        from neurosync_trainer_lite_tpu.ops import ffn_bwd_pallas as fbp
        fbp.FFN_BWD_BM = args.ffn_bm
        fbp.FFN_BWD_WITH_BIAS = bool(args.ffn_bias)
        s2s._ffn = fbp.ffn_fused

    if args.patch == "grads-bf16-stage":
        # prototype (VERDICT r3 weak #1 lever): stage gradients in bf16
        # until the optimizer update. The model consumes every weight via
        # w.astype(x.dtype), so differentiating w.r.t. PRE-CAST bf16 params
        # makes those casts no-ops — the backward's per-leaf bf16→fp32
        # cotangent converts (in the convert_reduce trace block) disappear,
        # grad-norm/clip read half the bytes, and the single fp32 widening
        # happens inside the Adam elementwise pass (moments stay fp32;
        # master weights stay fp32). Semantic delta vs ship: grads are
        # rounded to bf16 once before Adam; norm accumulated fp32.
        import jax as _jax
        import jax.numpy as _jnp
        import optax as _optax
        from neurosync_trainer_lite_tpu.training import step as st

        def make_step_bf16grads(cfg, tx, *, donate=True, total_steps=1):
            def step(state, src, trg, rng):
                bf16p = _jax.tree.map(
                    lambda p: p.astype(_jnp.bfloat16)
                    if p.dtype == _jnp.float32 else p, state.params)
                loss, grads = _jax.value_and_grad(st._compute_loss)(
                    bf16p, src, trg, cfg, rng, True, None, total_steps)
                # fp32-accumulated norm over bf16 leaves (reads half bytes)
                grad_norm = _jnp.sqrt(sum(
                    _jnp.sum(_jnp.square(g.astype(_jnp.float32)))
                    for g in _jax.tree.leaves(grads)))
                updates, opt_state = tx.update(
                    grads, state.opt_state, state.params)
                params = _optax.apply_updates(state.params, updates)
                return st.TrainState(params, opt_state), loss, grad_norm
            return _jax.jit(step, donate_argnums=(0,) if donate else ())

        st.make_train_step = make_step_bf16grads

    if args.patch == "no-gradnorm":
        # diagnostic (VERDICT r3 weak #1 lever): drop the separately
        # returned pre-clip grad norm — clip_by_global_norm still computes
        # its own. If the delta is ~0, XLA already CSEs the two identical
        # norm reductions and the "fuse the grad-norm reduce into the
        # update" lever has nothing left to win.
        import jax as _jax
        import jax.numpy as _jnp
        import optax as _optax
        from neurosync_trainer_lite_tpu.training import step as st

        def make_step_nonorm(cfg, tx, *, donate=True, total_steps=1):
            def step(state, src, trg, rng):
                loss, grads = _jax.value_and_grad(st._compute_loss)(
                    state.params, src, trg, cfg, rng, True, None, total_steps)
                updates, opt_state = tx.update(
                    grads, state.opt_state, state.params)
                params = _optax.apply_updates(state.params, updates)
                return (st.TrainState(params, opt_state), loss,
                        _jnp.zeros((), _jnp.float32))
            return _jax.jit(step, donate_argnums=(0,) if donate else ())

        st.make_train_step = make_step_nonorm

    if args.patch == "no-opt":
        # diagnostic: replace the optimizer chain (global-norm clip + L2
        # decay + Adam + LR scale) with a zero update — the step still
        # computes grads and the logged grad norm, so the measured delta
        # vs the baseline is the optimizer chain's cost
        import optax as _optax
        from neurosync_trainer_lite_tpu.training import optim as om
        from neurosync_trainer_lite_tpu.training import step as st

        om.make_optimizer = lambda cfg, spe: _optax.set_to_zero()
        st.make_optimizer = om.make_optimizer

    if args.patch == "unroll-dec-tail":
        # diagnostic: unroll ONLY the decoder tail, keep the encoder on the
        # plain scan — isolates the decoder-tail vs encoder contributions to
        # the shipped unroll_residents win (measured r3: dec-tail-only 554.1
        # vs both 574.0 vs neither 529.5 samples/s at dropout 0.3).
        from neurosync_trainer_lite_tpu.models import seq2seq as s2s

        _shipped = s2s._scan_layers

        def dec_tail_only(body, x, xs, cfg, scope, train=False):
            return _shipped(body, x, xs, cfg, scope,
                            train=train and scope == "decoder")

        s2s._scan_layers = dec_tail_only

    if args.patch == "unroll-remat-head":
        # prototype: unroll the REMAT'D head layers too (per-layer
        # jax.checkpoint in a Python loop instead of lax.scan) — the
        # post-unroll trace still shows the remat scan's stat fusions and
        # carry DUS among the top ops; this asks whether freeing those is
        # worth the extra code size.
        from neurosync_trainer_lite_tpu.models import seq2seq as s2s

        _shipped_scan = s2s._scan_layers

        def unroll_everything(body, x, xs, cfg, scope, train=False):
            n_layers = cfg.n_layers
            k = cfg.remat_layers
            in_scope = cfg.remat and cfg.remat_scope in ("all", scope)
            # same gates as the shipped _scan_layers: inference and
            # --unroll-residents 0 keep shipped behavior exactly
            if (not (train and cfg.unroll_residents) or not in_scope
                    or k < 0 or k >= n_layers):
                return _shipped_scan(body, x, xs, cfg, scope, train=train)
            rbody = s2s._maybe_remat(body, cfg, scope)
            for i in range(k):
                x, _ = rbody(x, jax.tree.map(lambda a, i=i: a[i], xs))
            return s2s._unrolled_layers(body, x, xs, k, n_layers)

        s2s._scan_layers = unroll_everything

    if args.unroll > 0:
        # prototype: unroll the layer scans so XLA can interleave/schedule
        # across layer bodies (costs compile time and code size)
        import jax as _jax
        from neurosync_trainer_lite_tpu.models import seq2seq as s2s

        def scan_unrolled(body, x, xs, cfg, scope, train=False):
            # diagnostic: lax.scan's unroll factor, NOT the shipped
            # Python-unroll (train intentionally unused here)
            n_layers = cfg.n_layers
            k = cfg.remat_layers
            in_scope = cfg.remat and cfg.remat_scope in ("all", scope)
            u = args.unroll
            if not in_scope or k < 0 or k >= n_layers:
                x, _ = _jax.lax.scan(s2s._maybe_remat(body, cfg, scope), x, xs,
                                     unroll=min(u, n_layers))
                return x
            if k > 0:
                head = _jax.tree.map(lambda a: a[:k], xs)
                x, _ = _jax.lax.scan(s2s._maybe_remat(body, cfg, scope), x,
                                     head, unroll=min(u, k))
            tail = _jax.tree.map(lambda a: a[k:], xs)
            x, _ = _jax.lax.scan(body, x, tail, unroll=min(u, n_layers - k))
            return x

        s2s._scan_layers = scan_unrolled

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
                      unroll_residents=bool(args.unroll_residents),
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
