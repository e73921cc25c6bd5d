"""Fused scaled-dot-product attention as a Pallas TPU kernel.

This is the TPU-native counterpart of the reference's CUDA flash-attention
dispatch (reference: utils/model.py:106,126 F.scaled_dot_product_attention):
one kernel computes qkᵀ → softmax → ·v entirely in VMEM, so the [T, T]
score/probability matrices never round-trip to HBM; the custom-VJP backward
kernel recomputes them flash-style from (q, k, v) instead of saving them,
which removes the dominant attention activation from training memory.

Geometry: this model attends over 128-frame windows (T = 128; inference
chunks likewise, config.py:48), so one q-block row and the full K/V strip fit
comfortably in VMEM and no online-softmax streaming is needed — the kernel
grids over (batch·heads, q-blocks) and loads K/V whole (fine for T ≤ ~2048;
above that, fall back to the XLA path).

Interface: q, k, v are [B, N, T, H]; softmax in fp32; output in v.dtype.
Non-causal (the model is a non-autoregressive parallel decoder — no masking
anywhere, reference model.py:245-251). Attention dropout is handled by the
caller (XLA path) — the kernel is used for the dropout-free paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 128
MAX_KV_LEN = 2048  # K/V strip must fit VMEM; larger sequences use the XLA path
# Measured on v5e (tools/tpu_probe.py): at T=128 XLA's batched einsum+softmax
# beats this kernel (432 vs 349 train samples/s — per-block work is too small
# at h=64 to amortize kernel overhead); the VMEM-residency win appears on
# longer sequences, so 'auto' only dispatches here from this length up.
MIN_KV_LEN_AUTO = 512


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                                    # [Tq, H]
    k = k_ref[0]                                    # [Tk, H]
    v = v_ref[0]                                    # [Tk, H]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [Tq, Tk] fp32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _fwd(q, k, v, scale):
    B, N, Tq, H = q.shape
    Tk = k.shape[2]
    qb = min(Q_BLOCK, Tq)
    grid = (B * N, pl.cdiv(Tq, qb))
    qr = q.reshape(B * N, Tq, H)
    kr = k.reshape(B * N, Tk, H)
    vr = v.reshape(B * N, Tk, H)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * N, Tq, H), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, H), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(qr, kr, vr)
    return out.reshape(B, N, Tq, H)


# ---------------------------------------------------------------------------
# backward — recompute p from (q, k), then the standard softmax-attention VJP
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)            # [Tq, Tk] fp32

    dv = jax.lax.dot_general(                             # pᵀ do : [Tk, H]
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(                             # do vᵀ : [Tq, Tk]
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k.astype(jnp.float32),
                 preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(                             # dsᵀ q : [Tk, H]
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_call(q, k, v, do, scale):
    B, N, Tq, H = q.shape
    Tk = k.shape[2]
    qr = q.reshape(B * N, Tq, H)
    kr = k.reshape(B * N, Tk, H)
    vr = v.reshape(B * N, Tk, H)
    dor = do.reshape(B * N, Tq, H)
    spec_q = pl.BlockSpec((1, Tq, H), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, Tk, H), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B * N, Tq, H), q.dtype),
            jax.ShapeDtypeStruct((B * N, Tk, H), k.dtype),
            jax.ShapeDtypeStruct((B * N, Tk, H), v.dtype),
        ),
        grid=(B * N,),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        interpret=_use_interpret(),
    )(qr, kr, vr, dor)
    return (dq.reshape(B, N, Tq, H), dk.reshape(B, N, Tk, H),
            dv.reshape(B, N, Tk, H))


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float | None = None):
    """q, k, v: [B, N, T, H] → [B, N, Tq, H]. Softmax fp32, non-causal."""
    s = scale if scale is not None else q.shape[-1] ** -0.5
    return _fwd(q, k, v, s)


def _vjp_fwd(q, k, v, scale):
    s = scale if scale is not None else q.shape[-1] ** -0.5
    return _fwd(q, k, v, s), (q, k, v)


def _vjp_bwd(scale, res, do):
    q, k, v = res
    s = scale if scale is not None else q.shape[-1] ** -0.5
    return _bwd_call(q, k, v, do, s)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


def supports(kv_len: int, dropout_rate: float, rng) -> bool:
    """Whether the kernel path applies (no attention dropout, K/V fit VMEM)."""
    return (dropout_rate == 0.0 or rng is None) and kv_len <= MAX_KV_LEN
