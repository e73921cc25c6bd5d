"""Pallas flash-attention kernel vs the XLA einsum+softmax reference path.

Forward and backward parity (interpret mode on CPU), covering the shapes the
model actually uses: training windows (T=128) and inference chunk batches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.ops.attention import sdpa
from neurosync_trainer_lite_tpu.ops.flash_attention import flash_attention


def _qkv(key, B, N, T, H, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, N, T, H), dtype)
    k = jax.random.normal(kk, (B, N, T, H), dtype)
    v = jax.random.normal(kv, (B, N, T, H), dtype)
    return q, k, v


@pytest.mark.parametrize("shape", [(2, 4, 128, 64), (1, 2, 96, 32),
                                   (2, 1, 256, 64)])
def test_forward_matches_xla(shape):
    q, k, v = _qkv(jax.random.PRNGKey(0), *shape)
    out_fa = flash_attention(q, k, v, None)
    out_ref = sdpa(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out_fa), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)


def test_grads_match_xla():
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 2, 128, 64)

    def f_fa(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, None)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(sdpa(q, k, v, impl="xla")))

    g_fa = jax.grad(f_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fa, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=f"d{name}")


def test_bf16_inputs():
    q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 128, 64, jnp.bfloat16)
    out_fa = flash_attention(q, k, v, None).astype(jnp.float32)
    out_ref = sdpa(q, k, v, impl="xla").astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out_fa), np.asarray(out_ref),
                               atol=2e-2, rtol=2e-2)


def test_cross_attention_lengths():
    # decoder cross-attn: Tq != Tk
    kq, kk = jax.random.split(jax.random.PRNGKey(3))
    q = jax.random.normal(kq, (2, 2, 128, 64))
    k = jax.random.normal(kk, (2, 2, 192, 64))
    v = jax.random.normal(kk, (2, 2, 192, 64))
    out_fa = flash_attention(q, k, v, None)
    out_ref = sdpa(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out_fa), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)


def test_dropout_falls_back_to_xla():
    # with active attention dropout the auto path must not use the kernel
    # (kernel has no dropout); sdpa handles this dispatch internally.
    q, k, v = _qkv(jax.random.PRNGKey(4), 1, 2, 64, 32)
    out = sdpa(q, k, v, dropout_rate=0.5, rng=jax.random.PRNGKey(0),
               train=True, impl="auto")
    assert out.shape == q.shape
    # dropout changes the output vs the deterministic path
    det = sdpa(q, k, v, impl="xla")
    assert not np.allclose(np.asarray(out), np.asarray(det))
