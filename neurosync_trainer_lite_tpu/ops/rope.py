"""Rotary positional encodings (interleaved-pair convention).

Semantics match the reference's two RoPE applications
(reference: utils/model.py:13-53 "global" RoPE on embeddings and
utils/model.py:60-83 "local" RoPE on per-head q/k): pairs are the
*interleaved* even/odd feature indices, theta base is 10000, and the angle for
pair i at position p is ``p * 10000**(-2i/d)`` where d is the rotated width
(d_model for global, head_dim for local).

TPU note: ``x[..., ::2]`` strided gathers are relayouts on TPU; an
interleaved pair split is exactly a trailing ``reshape(..., d//2, 2)``, which
XLA handles as a free bitcast-like relayout, so we use that.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _rope_tables_np(seq_len: int, dim: int, base: float = 10000.0):
    """Host-precomputed (sin, cos) tables, shape [seq_len, dim//2], float32."""
    position = np.arange(seq_len, dtype=np.float32)[:, None]          # [T,1]
    dim_idx = np.arange(0, dim, 2, dtype=np.float32)                  # [d/2]
    inv_freq = np.exp(-np.log(base) * dim_idx / dim)[None, :]         # [1,d/2]
    angle = position * inv_freq                                       # [T,d/2]
    return np.sin(angle), np.cos(angle)


def rope_tables(seq_len: int, dim: int, dtype=jnp.float32):
    sin, cos = _rope_tables_np(seq_len, dim)
    return jnp.asarray(sin, dtype), jnp.asarray(cos, dtype)


def apply_rope(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs of the trailing dim.

    x: [..., T, d]; sin/cos: [T, d//2] (broadcast over leading dims).
    """
    d = x.shape[-1]
    xp = x.reshape(*x.shape[:-1], d // 2, 2)
    x1, x2 = xp[..., 0], xp[..., 1]
    out_even = x1 * cos - x2 * sin
    out_odd = x1 * sin + x2 * cos
    return jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)


def rope_embed(x: jnp.ndarray) -> jnp.ndarray:
    """'Global' RoPE over the full model dim (reference: model.py:29-53).

    x: [B, T, d_model]. Rotation angles use d = d_model.
    """
    seq_len, d = x.shape[-2], x.shape[-1]
    sin, cos = rope_tables(seq_len, d, x.dtype)
    return apply_rope(x, sin, cos)


def rope_qk(q: jnp.ndarray, k: jnp.ndarray):
    """'Local' per-head RoPE on q and k (reference: model.py:60-83).

    q, k: [B, n_heads, T, head_dim]. Rotation angles use d = head_dim. Each of
    q/k uses its own sequence length (in this model they are always equal:
    the decoder stream *is* the encoder output).
    """
    d = q.shape[-1]
    sin_q, cos_q = rope_tables(q.shape[-2], d, q.dtype)
    sin_k, cos_k = rope_tables(k.shape[-2], d, k.dtype)
    return apply_rope(q, sin_q, cos_q), apply_rope(k, sin_k, cos_k)
