"""The audio→blendshape Seq2Seq transformer, as pure functions over pytrees.

Architecture semantics match the reference (utils/model.py:213-266):

- Encoder: Linear embed → "global" RoPE over the embedding dim → n_layers of
  [post-LN self-attention + post-LN ReLU-FFN(4x)] → final LayerNorm.
- Decoder: consumes the *encoder outputs* as its input stream AND as
  cross-attention memory (non-autoregressive parallel decode,
  reference model.py:245-251 — an unusual design, reproduced as-is for
  checkpoint/quality parity) → "global" RoPE → n_layers of
  [self-attn + cross-attn + FFN, all post-LN] → LayerNorm → Linear(output_dim).
- Per-head RoPE is applied to q/k inside every attention
  (reference model.py:123).
- Dropout placement matches the reference exactly, including the double
  dropout on attention outputs (resid_dropout inside MHA *and* dropoutN in the
  layer — model.py:139 + model.py:175).

TPU-first design choices (not translations):
- Layer parameters are *stacked* along a leading n_layers axis and iterated
  with lax.scan — one compiled layer body instead of n_layers unrolled ones.
- All matmuls accumulate fp32 on the MXU; LayerNorm/softmax run fp32; params
  are fp32 with bf16 compute under mixed precision (no GradScaler — bf16 has
  fp32 exponent range).
- Optional jax.checkpoint rematerialisation of each layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.ops.rope import rope_embed
from neurosync_trainer_lite_tpu.ops.attention import (
    _linear,
    dropout,
    dropout_keep,
    dropout_mask_q,
    multi_head_attention,
)

# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, stack=(), dtype=jnp.float32):
    """N(0, 0.02) weight, zero bias (reference: training_utils.py:336-341)."""
    w = jax.random.normal(key, (*stack, d_in, d_out), dtype) * 0.02
    b = jnp.zeros((*stack, d_out), dtype)
    return {"w": w, "b": b}


def _init_norm(stack=(), dim=None, dtype=jnp.float32):
    return {
        "scale": jnp.ones((*stack, dim), dtype),
        "bias": jnp.zeros((*stack, dim), dtype),
    }


def _init_attn(key, hidden, stack=()):
    ks = jax.random.split(key, 4)
    return {
        name: _init_linear(k, hidden, hidden, stack)
        for name, k in zip(("q", "k", "v", "out"), ks)
    }


def _init_ffn(key, hidden, ffn_dim, stack=()):
    k1, k2 = jax.random.split(key)
    return {
        "linear1": _init_linear(k1, hidden, ffn_dim, stack),
        "linear2": _init_linear(k2, ffn_dim, hidden, stack),
    }


def init_seq2seq(key, cfg: Config) -> dict:
    """Initialise the full parameter pytree (fp32 master params)."""
    H, L = cfg.hidden_dim, cfg.n_layers
    k_emb, k_eattn, k_effn, k_dattn, k_dcross, k_dffn, k_out = jax.random.split(key, 7)
    stack = (L,)
    encoder = {
        "embedding": _init_linear(k_emb, cfg.input_dim, H),
        "layers": {
            "self_attn": _init_attn(k_eattn, H, stack),
            "ffn": _init_ffn(k_effn, H, cfg.ffn_dim, stack),
            "norm1": _init_norm(stack, H),
            "norm2": _init_norm(stack, H),
        },
        "norm": _init_norm((), H),
    }
    decoder = {
        "layers": {
            "self_attn": _init_attn(k_dattn, H, stack),
            "cross_attn": _init_attn(k_dcross, H, stack),
            "ffn": _init_ffn(k_dffn, H, cfg.ffn_dim, stack),
            "norm1": _init_norm(stack, H),
            "norm2": _init_norm(stack, H),
            "norm3": _init_norm(stack, H),
        },
        "fc_output": _init_linear(k_out, H, cfg.output_dim),
        "norm": _init_norm((), H),
    }
    return {"encoder": encoder, "decoder": decoder}


def count_parameters(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


_LN_EPS = 1e-5


@jax.custom_vjp
def _layer_norm_bf16(x, scale, bias):
    """LayerNorm with fp32 math and lean residuals for bf16 inputs.

    Forward is bit-identical to the plain formulation below. The custom vjp
    exists for the backward residuals: XLA autodiff keeps [B, T, H] fp32
    intermediates (the centered input, the broadcast rsqrt) for every one of
    the model's 41+ LayerNorm sites; here only the bf16 input and the
    [B, T, 1] fp32 (mean, rsqrt) stats are saved and the normalized value is
    recomputed in the backward — measured 513 → 534 samples/s dropout-free,
    462 → 478 at dropout 0.3 on the v5e (docs/PERF.md). The gradient formula
    is the complete analytic LN derivative (through mean and variance), all
    in fp32, so grads match autodiff to fp32 rounding
    (tests/test_model.py::test_layer_norm_bf16_grads_match_autodiff).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    return (y * scale + bias).astype(x.dtype)


def _layer_norm_bf16_fwd(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _LN_EPS)
    y = (xf - mean) * r
    return (y * scale + bias).astype(x.dtype), (x, mean, r, scale)


def _layer_norm_bf16_bwd(res, dout):
    x, mean, r, scale = res
    y = (x.astype(jnp.float32) - mean) * r
    df = dout.astype(jnp.float32)
    reduce_axes = tuple(range(df.ndim - 1))
    dscale = jnp.sum(df * y, axis=reduce_axes)
    dbias = jnp.sum(df, axis=reduce_axes)
    dy = df * scale
    m1 = jnp.mean(dy, axis=-1, keepdims=True)
    m2 = jnp.mean(dy * y, axis=-1, keepdims=True)
    dx = (r * (dy - m1 - y * m2)).astype(x.dtype)
    return dx, dscale, dbias


_layer_norm_bf16.defvjp(_layer_norm_bf16_fwd, _layer_norm_bf16_bwd)


def layer_norm(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last dim, fp32 math (torch nn.LayerNorm semantics)."""
    if x.dtype == jnp.bfloat16 and eps == _LN_EPS:
        return _layer_norm_bf16(x, p["scale"].astype(jnp.float32),
                                p["bias"].astype(jnp.float32))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


@jax.custom_vjp
def _ffn_lean_core(x, w1, b1, w2, b2, keep, scale):
    """linear→relu→dropout→linear with lean backward residuals for bf16.

    Forward is bit-identical to the plain composition below (same fp32 MXU
    accumulation, same bias-add-then-cast). The custom vjp saves only
    (x, masked activation, keep mask) — autodiff additionally keeps the
    pre-relu [B, T, 4H] tensor at every FFN site (~134 MB/layer bf16 at the
    flagship geometry). The relu gradient is derived from the masked
    activation: where kept, am > 0 ⟺ h1 > 0 (scale > 0); where dropped the
    cotangent is zero anyway. Measured: 478 → 490 samples/s at dropout 0.3,
    534 → 538 dropout-free, and the freed residents moved the decoder-remat
    sweet spot from 1 to 2 resident layers at dropout 0.3 (docs/PERF.md).
    Gradient agreement with autodiff is pinned in
    tests/test_model.py::test_ffn_lean_grads_match_autodiff.
    """
    h1 = (jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32)
          + b1.astype(jnp.float32)).astype(x.dtype)
    am = jnp.where(keep, jax.nn.relu(h1) * scale.astype(x.dtype), 0
                   ).astype(x.dtype)
    return (jnp.dot(am, w2.astype(x.dtype),
                    preferred_element_type=jnp.float32)
            + b2.astype(jnp.float32)).astype(x.dtype)


def _ffn_lean_fwd(x, w1, b1, w2, b2, keep, scale):
    h1 = (jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32)
          + b1.astype(jnp.float32)).astype(x.dtype)
    am = jnp.where(keep, jax.nn.relu(h1) * scale.astype(x.dtype), 0
                   ).astype(x.dtype)
    y = (jnp.dot(am, w2.astype(x.dtype), preferred_element_type=jnp.float32)
         + b2.astype(jnp.float32)).astype(x.dtype)
    # NOTE: `keep` is deliberately NOT a residual — (am > 0) already implies
    # kept AND relu-active (dropped or bf16-rounded-to-zero elements get a
    # zero cotangent either way, exactly as keep & (am > 0) would give), so
    # saving the [B, T, 4H] bool costs ~67 MB/site × 16 sites for nothing
    # (measured with the r3 mask-lean probes: part of 493 → 529 samples/s
    # at dropout 0.3 — docs/PERF.md)
    return y, (x, am, scale, w1, w2)


def _ffn_lean_bwd(res, dy):
    x, am, scale, w1, w2 = res
    red = tuple(range(dy.ndim - 1))
    db2 = jnp.sum(dy.astype(jnp.float32), axis=red)
    dw2 = jnp.einsum("...f,...o->fo", am, dy,
                     preferred_element_type=jnp.float32)
    dam = jnp.dot(dy, w2.astype(dy.dtype).T,
                  preferred_element_type=jnp.float32).astype(dy.dtype)
    dh1 = jnp.where(am > 0, dam * scale.astype(dam.dtype), 0
                    ).astype(dy.dtype)
    db1 = jnp.sum(dh1.astype(jnp.float32), axis=red)
    dw1 = jnp.einsum("...f,...o->fo", x, dh1,
                     preferred_element_type=jnp.float32)
    dx = jnp.dot(dh1, w1.astype(dh1.dtype).T,
                 preferred_element_type=jnp.float32).astype(dy.dtype)
    return dx, dw1, db1, dw2, db2, None, None


_ffn_lean_core.defvjp(_ffn_lean_fwd, _ffn_lean_bwd)


def _ffn(p: dict, x: jnp.ndarray, *, rate: float, rng, train: bool) -> jnp.ndarray:
    """ReLU FFN with dropout after the activation (reference: model.py:146-158).

    bf16 compute routes through the lean-residual custom vjp (bit-identical
    forward; see _ffn_lean_core). The mask bits come from the SHARED
    ops/attention draw (dropout_mask_q + dropout_keep — same rng, same
    shape, same uint8 threshold as the plain dropout core), so switching
    paths can never change the dropout sequence. fp32 keeps plain autodiff
    for the oracle/parity tests.
    """
    # lean path only where a backward exists (training); eval/serving keeps
    # the plain composition — the lean residuals buy nothing without a
    # backward, and the keep-mask would be a pure [B, T, 4H] overhead there
    if x.dtype == jnp.bfloat16 and train and rng is not None:
        w1 = p["linear1"]["w"]
        q = dropout_mask_q(rate)
        if q < 256:  # rate ≈ 1.0 drops everything — fall through to plain
            if q <= 0:
                keep = jnp.ones(x.shape[:-1] + (w1.shape[-1],), bool)
                scale = jnp.float32(1.0)
            else:
                keep = dropout_keep(rng, x.shape[:-1] + (w1.shape[-1],), q)
                scale = jnp.float32(256.0 / (256 - q))
            return _ffn_lean_core(x, w1, p["linear1"]["b"],
                                  p["linear2"]["w"], p["linear2"]["b"],
                                  keep, scale)
    h = _linear(x, p["linear1"])
    h = jax.nn.relu(h)
    h = dropout(h, rate, rng, train)
    return _linear(h, p["linear2"])


def _split_or_none(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def _encoder_layer(lp, x, rng, *, num_heads, rate, train, impl="auto"):
    r_attn, r_d1, r_ffn, r_d2 = _split_or_none(rng, 4)
    a = multi_head_attention(
        lp["self_attn"], x, x, x,
        num_heads=num_heads, dropout_rate=rate, rng=r_attn, train=train,
        impl=impl,
    )
    x = layer_norm(x + dropout(a, rate, r_d1, train), lp["norm1"])
    f = _ffn(lp["ffn"], x, rate=rate, rng=r_ffn, train=train)
    x = layer_norm(x + dropout(f, rate, r_d2, train), lp["norm2"])
    return x


def _decoder_layer(lp, x, memory, rng, *, num_heads, rate, train, impl="auto"):
    r_self, r_d1, r_cross, r_d2, r_ffn, r_d3 = _split_or_none(rng, 6)
    a = multi_head_attention(
        lp["self_attn"], x, x, x,
        num_heads=num_heads, dropout_rate=rate, rng=r_self, train=train,
        impl=impl,
    )
    x = layer_norm(x + dropout(a, rate, r_d1, train), lp["norm1"])
    c = multi_head_attention(
        lp["cross_attn"], x, memory, memory,
        num_heads=num_heads, dropout_rate=rate, rng=r_cross, train=train,
        impl=impl,
    )
    x = layer_norm(x + dropout(c, rate, r_d2, train), lp["norm2"])
    f = _ffn(lp["ffn"], x, rate=rate, rng=r_ffn, train=train)
    x = layer_norm(x + dropout(f, rate, r_d3, train), lp["norm3"])
    return x


def _maybe_remat(body, cfg: Config, scope: str):
    if not cfg.remat or cfg.remat_scope not in ("all", scope):
        return body
    if cfg.remat_policy == "dots":
        return jax.checkpoint(
            body, policy=jax.checkpoint_policies.checkpoint_dots)
    return jax.checkpoint(body)


def _unrolled_layers(body, x, xs, lo: int, hi: int):
    """Python-unroll layers [lo, hi) of the stacked pytree `xs`.

    Static `a[i]` indexing — XLA sees n independent layer bodies, and each
    body's backward residuals stay independent values fused into their
    producers. A lax.scan over the same layers must instead stack every
    residual into a [L, ...] loop-carry via dynamic-update-slice; the
    flagship device trace attributes ~52 ms/step to exactly those DUS
    fusions (docs/PERF.md, r3)."""
    for i in range(lo, hi):
        x, _ = body(x, jax.tree.map(lambda a: a[i], xs))
    return x


def _scan_layers(body, x, xs, cfg: Config, scope: str, train: bool = False):
    """Iterate the stacked layers: lax.scan the rematerialized head (its
    residuals are recomputed, never stacked), and — in training with
    cfg.unroll_residents — Python-unroll the resident layers so their
    backward residuals aren't dynamic-update-sliced into [L, ...] buffers
    (measured 529.5→574.0 samples/s on the flagship step; config.py).
    Inference always scans: no residuals exist, and the compact one-body
    program keeps serving compile times and executable sizes down."""
    n_layers = cfg.n_layers
    k = cfg.remat_layers
    in_scope = cfg.remat and cfg.remat_scope in ("all", scope)
    unroll = train and cfg.unroll_residents
    if not in_scope or k < 0 or k >= n_layers:
        if not in_scope and unroll:  # every layer resident
            return _unrolled_layers(body, x, xs, 0, n_layers)
        x, _ = jax.lax.scan(_maybe_remat(body, cfg, scope), x, xs)
        return x
    if k > 0:
        head = jax.tree.map(lambda a: a[:k], xs)
        x, _ = jax.lax.scan(_maybe_remat(body, cfg, scope), x, head)
    if unroll:
        return _unrolled_layers(body, x, xs, k, n_layers)
    tail = jax.tree.map(lambda a: a[k:], xs)
    x, _ = jax.lax.scan(body, x, tail)
    return x


def _layer_keys(rng, n_layers):
    """A scannable per-layer key array (dummy when rng is None)."""
    if rng is None:
        return jax.random.split(jax.random.PRNGKey(0), n_layers), False
    return jax.random.split(rng, n_layers), True


def encoder_apply(params, x, cfg: Config, *, rng=None, train: bool = False):
    """x: [B, T, input_dim] → [B, T, hidden_dim]."""
    compute_dtype = jnp.bfloat16 if cfg.use_amp else jnp.float32
    x = x.astype(compute_dtype)
    x = _linear(x, params["embedding"])
    x = rope_embed(x)

    keys, have_rng = _layer_keys(rng, cfg.n_layers)
    rate, num_heads = cfg.dropout, cfg.num_heads
    do_train = train and have_rng

    def body(carry, inp):
        lp, key = inp
        out = _encoder_layer(
            lp, carry, key if do_train else None,
            num_heads=num_heads, rate=rate, train=do_train,
            impl=cfg.attention_impl,
        )
        return out, None

    x = _scan_layers(body, x, (params["layers"], keys), cfg, "encoder",
                     train=train)
    return layer_norm(x, params["norm"])


def decoder_apply(params, encoder_outputs, cfg: Config, *, rng=None, train: bool = False):
    """encoder_outputs: [B, T, hidden_dim] → [B, T, output_dim].

    The decoder input stream IS the encoder output (reference model.py:245-251).
    """
    x = rope_embed(encoder_outputs)
    memory = encoder_outputs

    keys, have_rng = _layer_keys(rng, cfg.n_layers)
    rate, num_heads = cfg.dropout, cfg.num_heads
    do_train = train and have_rng

    def body(carry, inp):
        lp, key = inp
        out = _decoder_layer(
            lp, carry, memory, key if do_train else None,
            num_heads=num_heads, rate=rate, train=do_train,
            impl=cfg.attention_impl,
        )
        return out, None

    x = _scan_layers(body, x, (params["layers"], keys), cfg, "decoder",
                     train=train)
    x = layer_norm(x, params["norm"])
    out = _linear(x, params["fc_output"])
    return out.astype(jnp.float32)


def seq2seq_apply(params, src, cfg: Config, *, rng=None, train: bool = False):
    """src: [B, T, input_dim] → predictions [B, T, output_dim] (fp32)."""
    if rng is not None:
        rng_enc, rng_dec = jax.random.split(rng)
    else:
        rng_enc = rng_dec = None
    enc = encoder_apply(params["encoder"], src, cfg, rng=rng_enc, train=train)
    return decoder_apply(params["decoder"], enc, cfg, rng=rng_dec, train=train)
