"""Single-pass Pallas kernel for the full-width RoPE rotation.

The XLA formulation of the interleaved rotation (ops/rope.py: x·cos +
roll(x,-1)·A + roll(x,+1)·B) is correct but costs several HBM passes over
each [B, T, H] tensor, and it runs ~34 times per forward (2 global + 2 per
attention). Measured on v5e it is 18% of forward time (tools/tpu_probe.py
ablation fwd_abl_norope: 73.5→60.0 ms). This kernel does the whole rotation
in one VMEM round-trip: read x, two in-register lane rolls, two FMAs, write.

The backward pass is the inverse rotation, which has the same
mul-roll-add structure with the rolls applied after the table products
(M = diag(cos) + S₋₁·diag(A) + S₊₁·diag(B)  ⇒  Mᵀy = cos·y + S₊₁(A·y) +
S₋₁(B·y)), so one kernel body serves both directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rope_kernel(x_ref, cos_ref, a_ref, b_ref, o_ref, *, transpose: bool):
    # fp32 in-register math: Mosaic's lane rotate supports only 32-bit data,
    # and the upcast costs nothing extra — HBM traffic stays in x.dtype.
    x = x_ref[0].astype(jnp.float32)   # [T, d]
    cos = cos_ref[:]                   # [T, d] fp32
    a = a_ref[:]
    b = b_ref[:]
    d = x.shape[-1]
    if transpose:
        # Mᵀ: multiply by tables first, then roll the products
        # (pltpu.roll requires non-negative shifts; -1 ≡ d-1 circularly)
        o = x * cos + pltpu.roll(x * a, 1, 1) + pltpu.roll(x * b, d - 1, 1)
    else:
        o = x * cos + pltpu.roll(x, d - 1, 1) * a + pltpu.roll(x, 1, 1) * b
    o_ref[0] = o.astype(o_ref.dtype)


def _rope_call(x, cos, a, b, transpose: bool):
    B, T, d = x.shape
    table_spec = pl.BlockSpec((T, d), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_rope_kernel, transpose=transpose),
        out_shape=jax.ShapeDtypeStruct((B, T, d), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            table_spec, table_spec, table_spec,
        ],
        out_specs=pl.BlockSpec((1, T, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(x, cos, a, b)


@jax.custom_vjp
def rope_rotate(x, cos, a, b):
    """x: [B, T, d]; cos/a/b: [T, d] tables (see ops/rope.py) → rotated x."""
    return _rope_call(x, cos, a, b, transpose=False)


def _fwd(x, cos, a, b):
    return _rope_call(x, cos, a, b, transpose=False), (cos, a, b)


def _bwd(res, dy):
    cos, a, b = res
    return _rope_call(dy, cos, a, b, transpose=True), None, None, None


rope_rotate.defvjp(_fwd, _bwd)
