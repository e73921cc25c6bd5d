"""Multi-head attention with per-head RoPE.

Semantics match the reference's MultiHeadAttention (utils/model.py:89-141):
q/k/v/out projections, RoPE on q and k, scaled dot-product attention with
softmax-dropout, output projection, residual dropout. The reference dispatches
to CUDA flash attention (F.scaled_dot_product_attention, model.py:126); here
the hot path is an XLA-fused SDPA with fp32 accumulation on the MXU, with an
optional Pallas flash kernel for long sequences (ops/flash_attention.py).

All matmuls run with preferred_element_type=float32 so bf16 inputs accumulate
in fp32 on the MXU; softmax is computed in fp32 for stability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.ops.rope import rope_qk_preheads


def _linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def dropout_mask_q(rate: float) -> int:
    """rate → THE shared uint8 drop threshold (keep iff bits >= q).

    Single source for every dropout site — ops/attention.dropout's core
    AND the lean-FFN custom vjp (models/seq2seq._ffn) draw their masks
    through dropout_keep with this q, so the two paths can never
    desynchronize the mask sequence (bf16-lean vs fp32-plain runs must see
    identical masks from identical keys)."""
    return int(round(rate * 256))


def dropout_keep(rng, shape, q):
    """THE shared keep-mask draw: uint8 bits from `rng`, keep iff
    bits >= q. jax.random.bits is a pure function of (key, shape), so
    every caller redrawing with the same key gets the same mask."""
    return jax.random.bits(rng, shape, jnp.uint8) >= q


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout_core(x, rng, q):
    keep = dropout_keep(rng, x.shape, q)
    scale = jnp.asarray(256.0 / (256 - q), x.dtype)
    return jnp.where(keep, x * scale, 0).astype(x.dtype)


def _dropout_core_fwd(x, rng, q):
    # residual = the KEY only: the backward redraws the mask bits from it
    # instead of keeping ~uint8 masks alive across fwd→bwd (dropout touches
    # ~2.2e9 elements per 228M train step; rbg mask generation is measured
    # ~free while the stored-mask HBM traffic was ~6 ms/step — docs/PERF.md
    # r3). Bitwise-safe: jax.random.bits is a pure function of (key, shape),
    # so the redrawn mask equals the forward's for rbg and threefry alike.
    return _dropout_core(x, rng, q), rng


def _dropout_core_bwd(q, rng, dy):
    keep = dropout_keep(rng, dy.shape, q)
    scale = jnp.asarray(256.0 / (256 - q), dy.dtype)
    return jnp.where(keep, dy * scale, 0).astype(dy.dtype), None


_dropout_core.defvjp(_dropout_core_fwd, _dropout_core_bwd)


def dropout(x: jnp.ndarray, rate: float, rng, train: bool) -> jnp.ndarray:
    """Inverted dropout (torch.nn.Dropout semantics).

    Masks are drawn as uint8 thresholds instead of fp32 bernoulli: one byte
    of randomness per element (4x less RNG/mask traffic — dropout touches
    ~2.2e9 elements per 228M train step). The keep probability quantizes to
    1/256 steps (rate 0.3 → effective 0.30078), immaterial for training and
    compensated exactly by the matching inverted scale. The backward pass
    REDRAWS the mask from the saved key rather than storing it
    (_dropout_core); gradient equality with stored-mask autodiff is pinned
    in tests/test_model.py.
    """
    if not train or rate == 0.0 or rng is None:
        return x
    q = dropout_mask_q(rate)
    if q <= 0:
        return x
    if q >= 256:  # rate ≈ 1.0: everything dropped (torch nn.Dropout(1.0))
        return jnp.zeros_like(x)
    return _dropout_core(x, rng, q)


@jax.custom_vjp
def _softmax_residual_bf16(s: jnp.ndarray) -> jnp.ndarray:
    """softmax over bf16 logits with fp32 internal stats; bf16 in, bf16 out,
    and — the point — a bf16 backward residual.

    Under bf16 compute the whole [B, n, T, T] chain stays bf16 (134 MB → 67 MB
    per attention instance, ×24 at the 228M batch-128 geometry, for the
    logits, the saved weights, and the cotangents), while everything
    precision-critical stays fp32: the MXU accumulates q·kᵀ in fp32 (one
    rounding to bf16 on output — the standard mixed-precision contract), and
    the softmax max-subtraction/exp/normalize and the backward
    dS = W·(dW − Σ dW·W) run in fp32. Measured: 494 → 509 samples/s dropout-
    free, 451 → 459 at dropout 0.3, on top of the earlier fp32-residual
    elimination (434 → 451) — docs/PERF.md. Gradient agreement with the
    fp32-residual formulation is pinned by
    tests/test_model.py::test_softmax_residual_bf16_grads_match_fp32_reference.
    """
    return jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)


def _softmax_residual_bf16_fwd(s):
    w = _softmax_residual_bf16(s)
    return w, w


def _softmax_residual_bf16_bwd(w, dw):
    wf = w.astype(jnp.float32)
    dwf = dw.astype(jnp.float32)
    ds = wf * (dwf - jnp.sum(dwf * wf, axis=-1, keepdims=True))
    return (ds.astype(jnp.bfloat16),)


_softmax_residual_bf16.defvjp(_softmax_residual_bf16_fwd,
                              _softmax_residual_bf16_bwd)


# Ablation switch for tools/tpu_probe.py (--patch sdpa-nonlean): when False,
# training falls back to the composed scores→softmax→dropout→out path whose
# backward keeps the [B, n, T, T] weights + dropped-weights residuals.
SDPA_LEAN = True


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sdpa_lean_core(q, k, v, rng, scale, qthresh):
    """The bf16 training attention core with stats-free lean residuals.

    Composition (bit-identical forward to the composed path below):
      scores(bf16, fp32 MXU acc) → softmax(fp32 stats, bf16 out)
      → attention-weight dropout (uint8 threshold `qthresh`, 0 = off)
      → weights·v (fp32 MXU acc, bf16 out).

    The point is the backward residual set: only (q, k, v, key). Autodiff
    of the composed path saves BOTH the softmax weights and the dropped
    weights — two [B, n, T, T] bf16 tensors (~134 MB per attention site at
    the flagship geometry, ×20 resident sites under the r3 unroll) held
    from forward to backward. Here the backward *recomputes* the score/
    softmax/mask chain from (q, k, key) — one extra q·kᵀ einsum per site
    (~4.3 GFLOP, trivial on the MXU) and a mask redraw (rbg generation is
    measured ~free, docs/PERF.md r3) in exchange for freeing the residuals
    and their HBM round-trip. Gradient math matches autodiff of the
    composed path (same fp32 softmax backward, same preferred-element-type
    boundaries); pinned by
    tests/test_model.py::test_sdpa_lean_grads_match_composed.
    """
    s = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                   preferred_element_type=jnp.bfloat16
                   ) * jnp.asarray(scale, jnp.bfloat16)
    w = _softmax_fp32_to_bf16(s)
    if qthresh > 0:
        keep = dropout_keep(rng, w.shape, qthresh)
        dsc = jnp.asarray(256.0 / (256 - qthresh), w.dtype)
        w = jnp.where(keep, w * dsc, 0).astype(w.dtype)
    out = jnp.einsum("bnqk,bnkh->bnqh", w, v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def _softmax_fp32_to_bf16(s):
    return jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)


def _sdpa_lean_fwd(q, k, v, rng, scale, qthresh):
    return _sdpa_lean_core(q, k, v, rng, scale, qthresh), (q, k, v, rng)


def _sdpa_lean_bwd(scale, qthresh, res, dout):
    q, k, v, rng = res
    # recompute the forward chain — deterministic: the einsum/softmax are
    # pure functions and jax.random.bits redraws the forward's exact mask
    # from the saved key (the same contract _dropout_core relies on)
    s = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                   preferred_element_type=jnp.bfloat16
                   ) * jnp.asarray(scale, jnp.bfloat16)
    w = _softmax_fp32_to_bf16(s)
    if qthresh > 0:
        keep = dropout_keep(rng, w.shape, qthresh)
        dsc = jnp.asarray(256.0 / (256 - qthresh), w.dtype)
        wd = jnp.where(keep, w * dsc, 0).astype(w.dtype)
    else:
        wd = w

    # out = wd · v (fp32 acc, cast bf16): transpose dots keep fp32 acc
    dv = jnp.einsum("bnqk,bnqh->bnkh", wd, dout,
                    preferred_element_type=jnp.float32).astype(v.dtype)
    dwd = jnp.einsum("bnqh,bnkh->bnqk", dout, v,
                     preferred_element_type=jnp.float32).astype(w.dtype)
    # dropout backward (== _dropout_core_bwd)
    if qthresh > 0:
        dw = jnp.where(keep, dwd * dsc, 0).astype(dwd.dtype)
    else:
        dw = dwd
    # softmax backward in fp32 from the bf16-rounded weights
    # (== _softmax_residual_bf16_bwd)
    wf = w.astype(jnp.float32)
    dwf = dw.astype(jnp.float32)
    ds = (wf * (dwf - jnp.sum(dwf * wf, axis=-1, keepdims=True))
          ).astype(jnp.bfloat16)
    ds = ds * jnp.asarray(scale, jnp.bfloat16)
    # scores einsum was preferred bf16 — its transposes keep that contract
    dq = jnp.einsum("bnqk,bnkh->bnqh", ds, k,
                    preferred_element_type=jnp.bfloat16)
    dk = jnp.einsum("bnqk,bnqh->bnkh", ds, q,
                    preferred_element_type=jnp.bfloat16)
    return dq, dk, dv, None


_sdpa_lean_core.defvjp(_sdpa_lean_fwd, _sdpa_lean_bwd)


def sdpa(q, k, v, *, dropout_rate=0.0, rng=None, train=False, impl="auto"):
    """Scaled dot-product attention. q,k,v: [B, n, T, h].

    impl: 'auto' dispatches to the fused Pallas flash kernel for long
    sequences (≥ MIN_KV_LEN_AUTO, where keeping the [T,T] matrices in VMEM
    pays for the kernel overhead — at this model's 128-frame windows XLA's
    batched path is faster, see flash_attention.py) when no attention dropout
    is active; 'pallas' forces the kernel; 'xla' keeps the einsum+softmax
    path (required when attention-weight dropout is applied, matching torch
    SDPA dropout_p semantics).
    """
    from neurosync_trainer_lite_tpu.ops import flash_attention as fa

    scale = q.shape[-1] ** -0.5
    kv_len = k.shape[-2]
    use_pallas = impl == "pallas" or (
        impl == "auto" and kv_len >= fa.MIN_KV_LEN_AUTO)
    if use_pallas and fa.supports(kv_len, dropout_rate if train else 0.0, rng):
        return fa.flash_attention(q, k, v, scale)

    if v.dtype == jnp.bfloat16:
        if train and SDPA_LEAN:
            # training: the lean-residual fused core (saves only q/k/v/key,
            # recomputes scores/softmax/mask in the backward — see
            # _sdpa_lean_core). rate≈1.0 (everything dropped) falls through
            # to the composed path's exact zeros handling.
            drop = dropout_rate > 0.0 and rng is not None
            qthresh = dropout_mask_q(dropout_rate) if drop else 0
            if qthresh < 256:
                key = rng if qthresh > 0 else jax.random.PRNGKey(0)
                return _sdpa_lean_core(q, k, v, key, scale, qthresh)
        # bf16 compute: fp32 MXU accumulation with bf16 logits/weights/
        # residuals; softmax stats and backward math in fp32 inside the
        # custom vjp (see _softmax_residual_bf16)
        scores = jnp.einsum(
            "bnqh,bnkh->bnqk", q, k, preferred_element_type=jnp.bfloat16
        ) * jnp.asarray(scale, jnp.bfloat16)
        weights = _softmax_residual_bf16(scores)
    else:
        # fp32 compute: exact path, keeps oracle/parity tests bitwise-stable
        scores = jnp.einsum(
            "bnqh,bnkh->bnqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    weights = dropout(weights, dropout_rate, rng, train)
    out = jnp.einsum(
        "bnqk,bnkh->bnqh", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def multi_head_attention(
    params: dict,
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    *,
    num_heads: int,
    dropout_rate: float = 0.0,
    rng=None,
    train: bool = False,
    use_rope: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """params: {'q','k','v','out'} each {'w': [H,H], 'b': [H]}.

    query/key/value: [B, T, H]. Returns [B, T, H].
    """
    B, Tq, H = query.shape
    h = H // num_heads

    q = _linear(query, params["q"])
    k = _linear(key, params["k"])
    v = _linear(value, params["v"])

    if rng is not None and train:
        rng_attn, rng_resid = jax.random.split(rng)
    else:
        rng_attn = rng_resid = None

    from neurosync_trainer_lite_tpu.ops import fused_attention as fua

    drop_active = train and dropout_rate > 0.0 and rng_attn is not None
    Tk = k.shape[1]
    if (impl == "pallas" and not drop_active and use_rope
            and fua.fits_vmem(Tq, Tk, q.shape[-1], q.dtype.itemsize)
            and h % 2 == 0):
        # Fully-fused core: RoPE + per-head scores/softmax/·v in one Pallas
        # kernel on unsplit [B, T, H] (no head-split relayouts, no [T, T]
        # HBM traffic). Opt-in only: measured 70.2 vs 63.2 ms fwd against
        # the XLA path at this model's T=128 — the per-head 128×64 matmuls
        # can't beat XLA's batched scheduling (docs/PERF.md).
        tables = fua.make_tables(Tq, Tk, h, num_heads)
        out = fua.fused_rope_attention(q, k, v, tables, num_heads, h ** -0.5)
    else:
        # Per-head RoPE at full [B, T, H] lane width, before the head split
        # (mathematically identical to rotating each head after the split).
        if use_rope:
            q, k = rope_qk_preheads(q, k, num_heads)

        # [B, T, H] -> [B, n, T, h]
        def split_heads(x):
            return x.reshape(B, x.shape[1], num_heads, h).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        out = sdpa(q, k, v, dropout_rate=dropout_rate, rng=rng_attn,
                   train=train, impl=impl)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, H)

    out = _linear(out, params["out"])
    out = dropout(out, dropout_rate, rng_resid, train)
    return out
