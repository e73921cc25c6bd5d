"""Pallas RoPE kernel vs the XLA roll formulation (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.ops.rope import rope_tables
from neurosync_trainer_lite_tpu.ops.rope_pallas import rope_rotate


def _xla_rope(x, tables):
    cos_full, sin_even, sin_odd = tables
    return (x * cos_full + jnp.roll(x, -1, axis=-1) * sin_even
            + jnp.roll(x, 1, axis=-1) * sin_odd)


def test_kernel_matches_xla():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 16, 64), jnp.float32)
    tables = rope_tables(16, 64)
    out_k = rope_rotate(x, *tables)
    out_x = _xla_rope(x, tables)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               atol=1e-6, rtol=1e-6)


def test_kernel_grad_is_inverse_rotation():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 32), jnp.float32)
    tables = rope_tables(8, 32)

    g_k = jax.grad(lambda x: jnp.sum(jnp.sin(rope_rotate(x, *tables))))(x)
    g_x = jax.grad(lambda x: jnp.sum(jnp.sin(_xla_rope(x, tables))))(x)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               atol=1e-6, rtol=1e-6)


def test_tiled_per_head_tables():
    # pre-head-split application: tables tiled across 4 heads of dim 16
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 8, 64), jnp.float32)
    tiled = rope_tables(8, 16, tile=4)
    out_k = rope_rotate(x, *tiled)
    # equals rotating each head chunk with the untiled tables
    single = rope_tables(8, 16)
    chunks = [np.asarray(_xla_rope(x[..., i*16:(i+1)*16], single))
              for i in range(4)]
    np.testing.assert_allclose(np.asarray(out_k), np.concatenate(chunks, -1),
                               atol=1e-6, rtol=1e-6)
