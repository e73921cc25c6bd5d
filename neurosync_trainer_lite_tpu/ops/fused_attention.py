"""Fully-fused multi-head attention core: RoPE + scores + softmax + ·v in
one Pallas kernel, operating on *unsplit* [B, T, H] tensors.

Why a second attention kernel (vs ops/flash_attention.py): the flash kernel
grids over (batch·heads) with one 128×64 tile per cell — measured SLOWER than
XLA at this model's T=128 (grid overhead dwarfs the tiny per-cell work,
docs/PERF.md). This kernel instead grids over batch only; each cell holds one
row's full [T, H] q/k/v strip in VMEM, applies the interleaved-RoPE rotation
in-register (lane rolls, as ops/rope_pallas.py), and unrolls the per-head
scores→softmax→·v chain as 16 small MXU ops with an fp32 VMEM accumulator —
so the [T, T] score/probability matrices, the fp32 softmax, and the four
head-split relayouts of the XLA path never touch HBM.

Backward is a mirror kernel: recompute the rotated q/k and per-head softmax
(flash-style — nothing attention-internal is saved), run the standard
softmax-attention VJP per head, and apply the *transpose* rotation to dq/dk
before writing (d pre-rope = Mᵀ · d post-rope).

Used for every dropout-free attention (inference always; training when
attention dropout is off). Attention-weight dropout keeps the XLA path for
exact torch-SDPA mask semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rot(x, cos, a, b):
    """Interleaved RoPE as lane rolls (fp32 in-register)."""
    d = x.shape[-1]
    return x * cos + pltpu.roll(x, d - 1, 1) * a + pltpu.roll(x, 1, 1) * b


def _rot_t(y, cos, a, b):
    """Transpose rotation: Mᵀy = cos·y + S₊₁(a·y) + S₋₁(b·y)."""
    d = y.shape[-1]
    return y * cos + pltpu.roll(y * a, 1, 1) + pltpu.roll(y * b, d - 1, 1)


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, cq_ref, aq_ref, bq_ref,
                ck_ref, ak_ref, bk_ref, o_ref, acc,
                *, num_heads: int, scale: float, rope: bool):
    rows = q_ref.shape[0]
    for r in range(rows):
        q = q_ref[r].astype(jnp.float32)          # [Tq, H]
        k = k_ref[r].astype(jnp.float32)          # [Tk, H]
        v = v_ref[r].astype(jnp.float32)          # [Tk, H]
        if rope:
            q = _rot(q, cq_ref[:], aq_ref[:], bq_ref[:])
            k = _rot(k, ck_ref[:], ak_ref[:], bk_ref[:])
        hd = q.shape[-1] // num_heads
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale    # [Tq, Tk]
            p = _softmax_rows(s)
            acc[:, sl] = jnp.dot(p, v[:, sl],
                                 preferred_element_type=jnp.float32)
        o_ref[r] = acc[:].astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, cq_ref, aq_ref, bq_ref,
                ck_ref, ak_ref, bk_ref, dq_ref, dk_ref, dv_ref,
                dq_acc, dk_acc, dv_acc,
                *, num_heads: int, scale: float, rope: bool):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    if rope:
        q = _rot(q, cq_ref[:], aq_ref[:], bq_ref[:])
        k = _rot(k, ck_ref[:], ak_ref[:], bk_ref[:])
    hd = q.shape[-1] // num_heads
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = _softmax_rows(s)                                   # [Tq, Tk]
        doh = do[:, sl]
        dv_acc[:, sl] = jax.lax.dot_general(                   # pᵀ do
            p, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(                              # do vᵀ
            doh, v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_acc[:, sl] = jnp.dot(ds, k[:, sl],
                                preferred_element_type=jnp.float32) * scale
        dk_acc[:, sl] = jax.lax.dot_general(                   # dsᵀ q
            ds, q[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    dq = dq_acc[:]
    dk = dk_acc[:]
    if rope:
        dq = _rot_t(dq, cq_ref[:], aq_ref[:], bq_ref[:])
        dk = _rot_t(dk, ck_ref[:], ak_ref[:], bk_ref[:])
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _table_specs(Tq, Tk, H):
    tq = pl.BlockSpec((Tq, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tk = pl.BlockSpec((Tk, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return [tq, tq, tq, tk, tk, tk]


def _row_spec(T, H, rows=1):
    return pl.BlockSpec((rows, T, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


#: conservative per-cell VMEM working-set cap. TPU cores have ~16-32 MB of
#: VMEM; leave headroom for Mosaic's own buffers and double-buffering.
VMEM_BUDGET = 12 * 1024 * 1024


def _cell_bytes(Tq, Tk, H, rows, itemsize=2):
    """Upper-bound VMEM bytes for one BACKWARD grid cell (the bigger of the
    two kernels): 6 fp32 RoPE tables, rows× q/k/v/do input strips, rows×
    dq/dk/dv outputs, and two fp32 [Tq, H] scratch accumulators."""
    tables = 4 * 3 * (Tq + Tk) * H
    strips = rows * itemsize * (2 * Tq * H + 2 * Tk * H)   # q, do + k, v
    outs = rows * itemsize * (Tq * H + 2 * Tk * H)         # dq + dk, dv
    scratch = 2 * 4 * Tq * H
    return tables + strips + outs + scratch


def fits_vmem(Tq, Tk, H, itemsize=2) -> bool:
    """Gate for the caller: can the kernel compile at all (rows=1)? A
    length/width the old Tk-only bound admitted (e.g. Tk=2048 at H=512:
    24 MB of tables alone) fails Mosaic VMEM allocation at compile time —
    reject it here and take the XLA path instead."""
    return _cell_bytes(Tq, Tk, H, 1, itemsize) <= VMEM_BUDGET


def _rows_per_cell(B, Tq, Tk, H, itemsize=2):
    """Batch rows per grid cell: more per-cell work pipelines the small
    per-head MXU ops better, bounded by the cell's VMEM working set (at the
    flagship T=128/H=1024 geometry, 4 rows ≈ 8 MB of strips)."""
    for r in (4, 2, 1):
        if B % r == 0 and _cell_bytes(Tq, Tk, H, r, itemsize) <= VMEM_BUDGET:
            return r
    return 1


def _fwd_call(q, k, v, tables, num_heads, scale, rope):
    B, Tq, H = q.shape
    Tk = k.shape[1]
    rows = _rows_per_cell(B, Tq, Tk, H, q.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale,
                          rope=rope),
        out_shape=jax.ShapeDtypeStruct((B, Tq, H), v.dtype),
        grid=(B // rows,),
        in_specs=[_row_spec(Tq, H, rows), _row_spec(Tk, H, rows),
                  _row_spec(Tk, H, rows), *_table_specs(Tq, Tk, H)],
        out_specs=_row_spec(Tq, H, rows),
        scratch_shapes=[pltpu.VMEM((Tq, H), jnp.float32)],
        interpret=_use_interpret(),
    )(q, k, v, *tables)


def _bwd_call(q, k, v, do, tables, num_heads, scale, rope):
    B, Tq, H = q.shape
    Tk = k.shape[1]
    rq, rk = _row_spec(Tq, H), _row_spec(Tk, H)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale,
                          rope=rope),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tq, H), q.dtype),
            jax.ShapeDtypeStruct((B, Tk, H), k.dtype),
            jax.ShapeDtypeStruct((B, Tk, H), v.dtype),
        ),
        grid=(B,),
        in_specs=[rq, rk, rk, rq, *_table_specs(Tq, Tk, H)],
        out_specs=(rq, rk, rk),
        scratch_shapes=[pltpu.VMEM((Tq, H), jnp.float32),
                        pltpu.VMEM((Tk, H), jnp.float32),
                        pltpu.VMEM((Tk, H), jnp.float32)],
        interpret=_use_interpret(),
    )(q, k, v, do, *tables)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_rope_attention(q, k, v, tables, num_heads: int,
                         scale: float, rope: bool = True):
    """q, k, v: [B, T, H] (heads unsplit). tables: 6-tuple of fp32 [T, H]
    RoPE tables — (cos, a, b) for q then for k, per-head-tiled
    (ops/rope.py:rope_tables(…, tile=num_heads)). Returns [B, Tq, H]."""
    return _fwd_call(q, k, v, tables, num_heads, scale, rope)


def _vjp_fwd(q, k, v, tables, num_heads, scale, rope):
    return _fwd_call(q, k, v, tables, num_heads, scale, rope), (q, k, v, tables)


def _vjp_bwd(num_heads, scale, rope, res, do):
    q, k, v, tables = res
    dq, dk, dv = _bwd_call(q, k, v, do, tables, num_heads, scale, rope)
    return dq, dk, dv, None


fused_rope_attention.defvjp(_vjp_fwd, _vjp_bwd)


#: legacy Tk-only bound, superseded by fits_vmem (which also accounts for
#: the hidden width H — at H=512+ the RoPE tables alone blow VMEM well
#: before Tk reaches this). Kept for external callers.
MAX_KV_LEN = 2048


def make_tables(Tq: int, Tk: int, head_dim: int, num_heads: int):
    """The 6 fp32 tables for fused_rope_attention."""
    from neurosync_trainer_lite_tpu.ops.rope import rope_tables

    tq = rope_tables(Tq, head_dim, jnp.float32, tile=num_heads)
    tk = rope_tables(Tk, head_dim, jnp.float32, tile=num_heads)
    return (*tq, *tk)
