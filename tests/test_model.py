"""Model-forward parity vs an independent fp32 torch oracle.

The oracle below re-implements the documented reference semantics
(reference: utils/model.py — RoPE-on-embeddings, per-head RoPE q/k, post-LN
blocks, ReLU 4x FFN, non-autoregressive decoder) directly on a reference-format
state dict, using torch ops. It is test-harness code, independent of both the
reference source and the framework under test.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.models import (
    count_parameters,
    init_seq2seq,
    seq2seq_apply,
)
from neurosync_trainer_lite_tpu.models.loss import loss_fn
from neurosync_trainer_lite_tpu.utils.torch_interop import (
    params_to_state_dict,
    state_dict_to_params,
)

CFG = Config(
    hidden_dim=64, n_layers=2, num_heads=4, input_dim=16, output_dim=7,
    dropout=0.0, use_amp=False,
)


# --------------------------- torch oracle ---------------------------------

def t_linear(x, sd, p):
    return x @ torch.from_numpy(sd[p + ".weight"]).T + torch.from_numpy(sd[p + ".bias"])


def t_ln(x, sd, p):
    return F.layer_norm(
        x, x.shape[-1:],
        torch.from_numpy(sd[p + ".weight"]), torch.from_numpy(sd[p + ".bias"]),
    )


def t_rope(x, d):
    """Interleaved RoPE over trailing width d (applied to [..., T, d_total])."""
    T = x.shape[-2]
    pos = torch.arange(T, dtype=torch.float32).unsqueeze(1)
    idx = torch.arange(0, d, 2, dtype=torch.float32)
    div = torch.exp(-math.log(10000.0) * idx / d)
    ang = pos * div
    sin, cos = torch.sin(ang), torch.cos(ang)
    x1, x2 = x[..., ::2], x[..., 1::2]
    even = x1 * cos - x2 * sin
    odd = x1 * sin + x2 * cos
    return torch.stack([even, odd], dim=-1).flatten(-2)


def t_mha(q_in, kv_in, sd, p, n_heads):
    B, T, H = q_in.shape
    h = H // n_heads
    q = t_linear(q_in, sd, p + ".q_linear").view(B, -1, n_heads, h).transpose(1, 2)
    k = t_linear(kv_in, sd, p + ".k_linear").view(B, -1, n_heads, h).transpose(1, 2)
    v = t_linear(kv_in, sd, p + ".v_linear").view(B, -1, n_heads, h).transpose(1, 2)
    q, k = t_rope(q, h), t_rope(k, h)
    scores = q @ k.transpose(-2, -1) * h ** -0.5
    out = F.softmax(scores, dim=-1) @ v
    out = out.transpose(1, 2).contiguous().view(B, -1, H)
    return t_linear(out, sd, p + ".out_linear")


def t_ffn(x, sd, p):
    return t_linear(F.relu(t_linear(x, sd, p + ".linear1")), sd, p + ".linear2")


def oracle_forward(src, sd, cfg):
    x = t_linear(src, sd, "encoder.embedding")
    x = t_rope(x, cfg.hidden_dim)
    for i in range(cfg.n_layers):
        p = f"encoder.transformer_encoder.{i}"
        x = t_ln(x + t_mha(x, x, sd, p + ".self_attn", cfg.num_heads), sd, p + ".norm1")
        x = t_ln(x + t_ffn(x, sd, p + ".ffn"), sd, p + ".norm2")
    enc = t_ln(x, sd, "encoder.layer_norm")

    x = t_rope(enc, cfg.hidden_dim)
    for i in range(cfg.n_layers):
        p = f"decoder.transformer_decoder.{i}"
        x = t_ln(x + t_mha(x, x, sd, p + ".self_attn", cfg.num_heads), sd, p + ".norm1")
        x = t_ln(x + t_mha(x, enc, sd, p + ".multihead_attn", cfg.num_heads), sd, p + ".norm2")
        x = t_ln(x + t_ffn(x, sd, p + ".ffn"), sd, p + ".norm3")
    x = t_ln(x, sd, "decoder.layer_norm")
    return t_linear(x, sd, "decoder.fc_output")


# ------------------------------- tests -------------------------------------

def test_forward_matches_torch_oracle(rng):
    params = init_seq2seq(jax.random.PRNGKey(1), CFG)
    sd = params_to_state_dict(params, CFG)
    src = rng.standard_normal((2, 10, CFG.input_dim)).astype(np.float32)

    ours = np.asarray(seq2seq_apply(params, jnp.asarray(src), CFG))
    theirs = oracle_forward(torch.from_numpy(src), sd, CFG).numpy()

    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)


def test_state_dict_roundtrip():
    params = init_seq2seq(jax.random.PRNGKey(2), CFG)
    sd = params_to_state_dict(params, CFG)
    back = state_dict_to_params(sd, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_count_full_model():
    cfg = Config()  # 8 layers / 16 heads / hidden 1024
    H, L, F_, I, O = 1024, 8, 4096, 256, 61
    attn = 4 * (H * H + H)
    ffn = H * F_ + F_ + F_ * H + H
    norm = 2 * H
    enc = (I * H + H) + L * (attn + ffn + 2 * norm) + norm
    dec = L * (2 * attn + ffn + 3 * norm) + (H * O + O) + norm
    expected = enc + dec
    params = init_seq2seq(jax.random.PRNGKey(0), cfg.replace(n_layers=1))
    # count the 1-layer model then extrapolate to avoid allocating 235M on CPU
    one = count_parameters(params)
    per_enc_layer = attn + ffn + 2 * norm
    per_dec_layer = 2 * attn + ffn + 3 * norm
    assert one + 7 * (per_enc_layer + per_dec_layer) == expected
    assert 230e6 < expected < 240e6  # ≈235M, README claims 228M


def test_loss_matches_torch():
    rng = np.random.default_rng(3)
    pred = rng.standard_normal((2, 12, 5)).astype(np.float32)
    targ = rng.standard_normal((2, 12, 5)).astype(np.float32)

    tp, tt = torch.from_numpy(pred), torch.from_numpy(targ)
    rec = F.smooth_l1_loss(tp, tt, beta=1.0)
    pd, td = tp[:, 1:] - tp[:, :-1], tt[:, 1:] - tt[:, :-1]
    temp = F.l1_loss(pd, td)
    pn = pd / (pd.norm(dim=-1, keepdim=True) + 1e-8)
    tn = td / (td.norm(dim=-1, keepdim=True) + 1e-8)
    expected = (rec + temp + (1 - (pn * tn).sum(-1).mean())).item()

    ours = float(loss_fn(jnp.asarray(pred), jnp.asarray(targ)))
    assert abs(ours - expected) < 1e-5


def test_dropout_is_stochastic_in_train_mode():
    cfg = CFG.replace(dropout=0.5)
    params = init_seq2seq(jax.random.PRNGKey(4), cfg)
    src = jnp.ones((1, 8, cfg.input_dim))
    a = seq2seq_apply(params, src, cfg, rng=jax.random.PRNGKey(0), train=True)
    b = seq2seq_apply(params, src, cfg, rng=jax.random.PRNGKey(1), train=True)
    c = seq2seq_apply(params, src, cfg)  # eval: deterministic
    d = seq2seq_apply(params, src, cfg)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_bf16_close_to_fp32():
    params = init_seq2seq(jax.random.PRNGKey(5), CFG)
    src = jnp.asarray(np.random.default_rng(6).standard_normal((2, 16, CFG.input_dim)), jnp.float32)
    out32 = seq2seq_apply(params, src, CFG)
    out16 = seq2seq_apply(params, src, CFG.replace(use_amp=True))
    assert out16.dtype == jnp.float32  # outputs always fp32
    np.testing.assert_allclose(np.asarray(out32), np.asarray(out16), atol=0.15, rtol=0.1)


def test_softmax_residual_bf16_grads_match_fp32_reference():
    """The bf16-residual softmax (ops/attention.py) must produce the same
    forward as softmax-then-cast and gradients within bf16 rounding of the
    fp32-residual formulation."""
    from neurosync_trainer_lite_tpu.ops.attention import (
        _softmax_residual_bf16)

    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.standard_normal((2, 4, 8, 8)) * 3.0, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 4, 8, 16)), jnp.bfloat16)

    def via_custom(s):
        w = _softmax_residual_bf16(s)
        return jnp.sum(jnp.einsum("bnqk,bnkh->bnqh", w, v,
                                  preferred_element_type=jnp.float32) ** 2)

    def via_plain(s):
        w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        return jnp.sum(jnp.einsum("bnqk,bnkh->bnqh", w, v,
                                  preferred_element_type=jnp.float32) ** 2)

    f_c, f_p = float(via_custom(s)), float(via_plain(s))
    assert f_c == pytest.approx(f_p, rel=1e-6)  # forward identical
    g_c = np.asarray(jax.grad(via_custom)(s), dtype=np.float32)
    g_p = np.asarray(jax.grad(via_plain)(s), dtype=np.float32)
    scale = np.max(np.abs(g_p)) + 1e-9
    assert np.max(np.abs(g_c - g_p)) / scale < 2e-2  # bf16-rounding only


def test_layer_norm_bf16_grads_match_autodiff():
    """The lean-residual LayerNorm vjp must match plain autodiff of the same
    fp32 math (the formula differentiates through mean and variance)."""
    from neurosync_trainer_lite_tpu.models.seq2seq import (
        _LN_EPS, _layer_norm_bf16)

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((3, 7, 32)) * 2.0, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 32), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(32), jnp.float32)

    def plain(x, scale, bias):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
        return (y * scale + bias).astype(x.dtype)

    def loss_c(*a):
        return jnp.sum(_layer_norm_bf16(*a).astype(jnp.float32) ** 2)

    def loss_p(*a):
        return jnp.sum(plain(*a).astype(jnp.float32) ** 2)

    # identical forward
    np.testing.assert_array_equal(
        np.asarray(_layer_norm_bf16(x, scale, bias), np.float32),
        np.asarray(plain(x, scale, bias), np.float32))
    g_c = jax.grad(loss_c, argnums=(0, 1, 2))(x, scale, bias)
    g_p = jax.grad(loss_p, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_c, g_p):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.max(np.abs(b)) + 1e-9
        assert np.max(np.abs(a - b)) / denom < 1e-2


def test_dropout_regen_backward_matches_stored_mask():
    """The regen-from-key dropout vjp (ops/attention._dropout_core saves
    only the KEY and redraws mask bits in the backward) must equal
    stored-mask autodiff of the same composition — jax.random.bits is a
    pure function of (key, shape), so the redrawn mask is the forward's,
    for threefry and rbg keys alike."""
    from neurosync_trainer_lite_tpu.ops.attention import dropout

    def stored(x, rate, key):
        q = int(round(rate * 256))
        bits = jax.random.bits(key, x.shape, jnp.uint8)
        scale = jnp.asarray(256.0 / (256 - q), x.dtype)
        return jnp.where(bits >= q, x * scale, 0).astype(x.dtype)

    rng = np.random.default_rng(12)
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(5, impl=impl)
        for dtype in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.standard_normal((4, 8, 32)), dtype)
            y_regen = dropout(x, 0.3, key, True)
            y_stored = stored(x, 0.3, key)
            np.testing.assert_array_equal(np.asarray(y_regen, np.float32),
                                          np.asarray(y_stored, np.float32))

            loss_r = lambda x: jnp.sum(
                dropout(x, 0.3, key, True).astype(jnp.float32) ** 2)
            loss_s = lambda x: jnp.sum(
                stored(x, 0.3, key).astype(jnp.float32) ** 2)
            g_r = jax.jit(jax.grad(loss_r))(x)
            g_s = jax.jit(jax.grad(loss_s))(x)
            np.testing.assert_allclose(
                np.asarray(g_r, np.float32), np.asarray(g_s, np.float32),
                rtol=1e-6, atol=1e-6)

    # the determinism assumption itself, pinned under jit: two bits() draws
    # from the same key are identical (the regen backward depends on it)
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(9, impl=impl)
        a, b = jax.jit(lambda k: (jax.random.bits(k, (64,), jnp.uint8),
                                  jax.random.bits(k, (64,), jnp.uint8)))(key)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sdpa_lean_grads_match_composed():
    """The lean-residual SDPA core (saves only q/k/v/key, recomputes the
    score/softmax/mask chain in the backward) must be forward-bit-identical
    to the composed scores→softmax→dropout→out path and match its gradients
    to bf16 rounding — with and without attention-weight dropout."""
    from neurosync_trainer_lite_tpu.ops import attention as attn

    rng = np.random.default_rng(17)
    B, n, T, h = 2, 4, 8, 16
    q = jnp.asarray(rng.standard_normal((B, n, T, h)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, n, T, h)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, n, T, h)), jnp.bfloat16)
    key = jax.random.PRNGKey(7)
    scale = h ** -0.5

    def composed(q, k, v, rate):
        s = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                       preferred_element_type=jnp.bfloat16
                       ) * jnp.asarray(scale, jnp.bfloat16)
        w = attn._softmax_residual_bf16(s)
        w = attn.dropout(w, rate, key if rate > 0 else None, True)
        return jnp.einsum("bnqk,bnkh->bnqh", w, v,
                          preferred_element_type=jnp.float32
                          ).astype(v.dtype)

    for rate in (0.0, 0.3):
        qthresh = attn.dropout_mask_q(rate) if rate > 0 else 0
        y_lean = attn._sdpa_lean_core(q, k, v, key, scale, qthresh)
        y_comp = composed(q, k, v, rate)
        np.testing.assert_array_equal(np.asarray(y_lean, np.float32),
                                      np.asarray(y_comp, np.float32))

        g_lean = jax.grad(lambda q, k, v: jnp.sum(
            attn._sdpa_lean_core(q, k, v, key, scale, qthresh
                                 ).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        g_comp = jax.grad(lambda q, k, v: jnp.sum(
            composed(q, k, v, rate).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_lean, g_comp):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            denom = np.max(np.abs(b)) + 1e-9
            assert np.max(np.abs(a - b)) / denom < 2e-2


def test_sdpa_lean_engages_and_model_output_unchanged():
    """The lean core must be what the bf16 training path actually runs, and
    flipping it off (the probe ablation switch) must not change the model's
    forward — the composed path is bit-identical by construction."""
    from neurosync_trainer_lite_tpu.ops import attention as attn

    cfg = CFG.replace(use_amp=True, dropout=0.3)
    params = init_seq2seq(jax.random.PRNGKey(2), cfg)
    src = jnp.asarray(
        np.random.default_rng(8).standard_normal((2, 16, cfg.input_dim)),
        jnp.float32)
    key = jax.random.PRNGKey(5)
    try:
        y_lean = seq2seq_apply(params, src, cfg, rng=key, train=True)
        attn.SDPA_LEAN = False
        y_comp = seq2seq_apply(params, src, cfg, rng=key, train=True)
    finally:
        attn.SDPA_LEAN = True
    np.testing.assert_array_equal(np.asarray(y_lean), np.asarray(y_comp))


def test_bf16_train_saves_no_attention_weight_residuals():
    """Structural pin of the lean SDPA mechanism: the bf16 training loss
    must not hold ANY [B, num_heads, T, T]-shaped tensor (softmax weights /
    dropped weights / logits) as a forward→backward residual — at the
    flagship geometry those were ~134 MB per attention site (docs/PERF.md
    r4). Also pins the FFN keep-mask absence ([B, T, 4H] bools) from r3."""
    from jax._src.ad_checkpoint import saved_residuals

    from neurosync_trainer_lite_tpu.models.loss import loss_fn

    cfg = CFG.replace(use_amp=True, dropout=0.3)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    # T must differ from the head dim, else the legitimate q/k/v residuals
    # [B, n, T, h] collide with the [B, n, T, T] shape being asserted absent
    B, T = 2, 12
    assert T != cfg.hidden_dim // cfg.num_heads
    src = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.input_dim))
    trg = jax.random.normal(jax.random.PRNGKey(2), (B, T, cfg.output_dim))

    def f(p):
        return loss_fn(seq2seq_apply(p, src, cfg, rng=jax.random.PRNGKey(3),
                                     train=True), trg)

    res = saved_residuals(f, params)
    attn_weight_shape = (B, cfg.num_heads, T, T)
    ffn_mask_shape = (B, T, cfg.ffn_dim)
    offenders = [
        (getattr(a, "shape", None), desc) for a, desc in res
        if getattr(a, "shape", None) == attn_weight_shape
        or (getattr(a, "shape", None) == ffn_mask_shape
            and getattr(a, "dtype", None) == jnp.bool_)
    ]
    assert not offenders, offenders


def test_ffn_lean_grads_match_autodiff():
    """The lean-residual FFN vjp (bf16 path) must match plain autodiff of
    the same composition, with and without dropout, and its forward must be
    bit-identical — including the exact dropout mask sequence (same rng,
    same uint8 threshold draw as ops/attention.dropout)."""
    from neurosync_trainer_lite_tpu.models.seq2seq import _ffn
    from neurosync_trainer_lite_tpu.ops.attention import _linear, dropout

    rng = np.random.default_rng(11)
    p = {"linear1": {"w": jnp.asarray(rng.standard_normal((32, 128)) * 0.1,
                                      jnp.float32),
                     "b": jnp.asarray(rng.standard_normal(128), jnp.float32)},
         "linear2": {"w": jnp.asarray(rng.standard_normal((128, 32)) * 0.1,
                                      jnp.float32),
                     "b": jnp.asarray(rng.standard_normal(32), jnp.float32)}}
    x = jnp.asarray(rng.standard_normal((4, 8, 32)), jnp.bfloat16)
    key = jax.random.PRNGKey(3)

    def plain(p, x, rate):
        h = _linear(x, p["linear1"])
        h = jax.nn.relu(h)
        h = dropout(h, rate, key, True)
        return _linear(h, p["linear2"])

    for rate in (0.0, 0.3):
        y_lean = _ffn(p, x, rate=rate, rng=key, train=True)
        y_plain = plain(p, x, rate)
        np.testing.assert_array_equal(
            np.asarray(y_lean, np.float32), np.asarray(y_plain, np.float32))

        g_lean = jax.grad(lambda p, x: jnp.sum(
            _ffn(p, x, rate=rate, rng=key, train=True
                 ).astype(jnp.float32) ** 2), argnums=(0, 1))(p, x)
        g_plain = jax.grad(lambda p, x: jnp.sum(
            plain(p, x, rate).astype(jnp.float32) ** 2), argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(g_lean), jax.tree.leaves(g_plain)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-2, atol=2e-2)
