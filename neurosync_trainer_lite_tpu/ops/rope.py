"""Rotary positional encodings (interleaved-pair convention).

Semantics match the reference's two RoPE applications
(reference: utils/model.py:13-53 "global" RoPE on embeddings and
utils/model.py:60-83 "local" RoPE on per-head q/k): pairs are the
*interleaved* even/odd feature indices, theta base is 10000, and the angle for
pair i at position p is ``p * 10000**(-2i/d)`` where d is the rotated width
(d_model for global, head_dim for local).

TPU-first formulation: the textbook ``x.reshape(..., d//2, 2)`` pair-split
puts 2 in the lane dimension — the worst possible TPU tiling (lanes are 128
wide) — and costs strided gathers plus a stack per application, ~50 times per
forward. Instead we keep full-width [*, d] layouts everywhere:

    out = x * cos_full + roll(x, -1) * A + roll(x, +1) * B

where cos_full is the pairwise-repeated cos table and A/B are sin tables
pre-masked to even/odd lanes (A[2i] = -sin_i, A[2i+1] = 0; B[2i] = 0,
B[2i+1] = sin_i). The two lane-rolls express the pair swap
(x[2i+1] ← x[2i], x[2i] ← -x[2i+1]) without ever leaving the 128-lane
layout: 3 multiplies + 2 adds + 2 lane shifts on the VPU, zero relayouts.

Per-head RoPE is applied *before* the head split on [B, T, H] by tiling the
[T, head_dim] tables across all heads (heads are contiguous chunks of H, so
the tiled table is exactly the per-head pattern) — the rotation then runs at
H = n_heads·head_dim lane width instead of head_dim.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _rope_tables_np(seq_len: int, dim: int, tile: int = 1,
                    base: float = 10000.0):
    """Full-width (cos_full, sin_even, sin_odd) tables.

    Shapes [seq_len, dim*tile], float32; `tile` repeats the pattern across
    contiguous heads for pre-split per-head application.
    """
    position = np.arange(seq_len, dtype=np.float32)[:, None]          # [T,1]
    dim_idx = np.arange(0, dim, 2, dtype=np.float32)                  # [d/2]
    inv_freq = np.exp(-np.log(base) * dim_idx / dim)[None, :]         # [1,d/2]
    angle = position * inv_freq                                       # [T,d/2]
    sin = np.sin(angle)
    cos_full = np.repeat(np.cos(angle), 2, axis=1)                    # [T,d]
    sin_even = np.zeros_like(cos_full)
    sin_odd = np.zeros_like(cos_full)
    sin_even[:, 0::2] = -sin      # multiplies roll(x,-1): x[2i+1] at even lanes
    sin_odd[:, 1::2] = sin        # multiplies roll(x,+1): x[2i]   at odd lanes
    if tile > 1:
        cos_full = np.tile(cos_full, (1, tile))
        sin_even = np.tile(sin_even, (1, tile))
        sin_odd = np.tile(sin_odd, (1, tile))
    return cos_full, sin_even, sin_odd


def rope_tables(seq_len: int, dim: int, dtype=jnp.float32, tile: int = 1):
    cos_full, sin_even, sin_odd = _rope_tables_np(seq_len, dim, tile)
    return (jnp.asarray(cos_full, dtype), jnp.asarray(sin_even, dtype),
            jnp.asarray(sin_odd, dtype))


def apply_rope(x: jnp.ndarray, tables) -> jnp.ndarray:
    """Rotate interleaved pairs of the trailing dim.

    x: [..., T, d']; tables from rope_tables with matching [T, d'] (always
    fp32 — the rotation angles must not be quantized to the compute dtype).
    On TPU this dispatches to the single-pass Pallas kernel
    (ops/rope_pallas.py, fp32 in-register math); elsewhere the XLA roll
    formulation runs with the tables cast to x.dtype at apply time.
    """
    cos_full, sin_even, sin_odd = tables
    import jax

    if jax.default_backend() == "tpu":
        from neurosync_trainer_lite_tpu.ops.rope_pallas import rope_rotate

        lead = x.shape[:-2]
        x3 = x.reshape((-1,) + x.shape[-2:])
        out = rope_rotate(x3, cos_full, sin_even, sin_odd)
        return out.reshape(lead + x.shape[-2:])

    cos_full = cos_full.astype(x.dtype)
    sin_even = sin_even.astype(x.dtype)
    sin_odd = sin_odd.astype(x.dtype)
    left = jnp.roll(x, -1, axis=-1)    # even lanes see x[2i+1]
    right = jnp.roll(x, 1, axis=-1)    # odd lanes see x[2i]
    return x * cos_full + left * sin_even + right * sin_odd


def rope_embed(x: jnp.ndarray) -> jnp.ndarray:
    """'Global' RoPE over the full model dim (reference: model.py:29-53).

    x: [B, T, d_model]. Rotation angles use d = d_model.
    """
    seq_len, d = x.shape[-2], x.shape[-1]
    return apply_rope(x, rope_tables(seq_len, d))


def rope_qk_preheads(q: jnp.ndarray, k: jnp.ndarray, num_heads: int):
    """'Local' per-head RoPE applied before the head split
    (reference: model.py:60-83 applies it per-head after the split; tiling
    the head_dim tables across H is the same rotation at full lane width).

    q, k: [B, T, H] with H = num_heads * head_dim.
    """
    head_dim = q.shape[-1] // num_heads
    tq = rope_tables(q.shape[-2], head_dim, tile=num_heads)
    tk = rope_tables(k.shape[-2], head_dim, tile=num_heads)
    return apply_rope(q, tq), apply_rope(k, tk)


def rope_qk(q: jnp.ndarray, k: jnp.ndarray):
    """Per-head RoPE on already-split q/k: [B, n_heads, T, head_dim]."""
    d = q.shape[-1]
    return (apply_rope(q, rope_tables(q.shape[-2], d)),
            apply_rope(k, rope_tables(k.shape[-2], d)))
