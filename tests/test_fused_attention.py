"""Fused RoPE-attention kernel vs the reference XLA path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.ops.attention import (
    multi_head_attention,
    sdpa,
)
from neurosync_trainer_lite_tpu.ops.fused_attention import (
    fused_rope_attention,
    make_tables,
)
from neurosync_trainer_lite_tpu.ops.rope import rope_qk_preheads


def _ref_core(q, k, v, num_heads):
    """XLA reference: pre-split RoPE + split-head SDPA, back to [B, T, H]."""
    B, Tq, H = q.shape
    h = H // num_heads
    qr, kr = rope_qk_preheads(q, k, num_heads)

    def split(x):
        return x.reshape(B, x.shape[1], num_heads, h).transpose(0, 2, 1, 3)

    out = sdpa(split(qr), split(kr), split(v), impl="xla")
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, H)


@pytest.mark.parametrize("B,T,H,n", [(2, 16, 64, 4), (1, 24, 96, 6),
                                     (3, 8, 32, 2)])
def test_forward_matches_reference(B, T, H, n):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, H))
    k = jax.random.normal(kk, (B, T, H))
    v = jax.random.normal(kv, (B, T, H))
    tables = make_tables(T, T, H // n, n)
    out = fused_rope_attention(q, k, v, tables, n, (H // n) ** -0.5)
    ref = _ref_core(q, k, v, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_cross_attention_lengths():
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 16, 64))
    k = jax.random.normal(kk, (2, 24, 64))
    v = jax.random.normal(kv, (2, 24, 64))
    tables = make_tables(16, 24, 16, 4)
    out = fused_rope_attention(q, k, v, tables, 4, 16 ** -0.5)
    ref = _ref_core(q, k, v, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_grads_match_reference():
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 16, 64))
    k = jax.random.normal(kk, (2, 16, 64))
    v = jax.random.normal(kv, (2, 16, 64))
    tables = make_tables(16, 16, 16, 4)

    def f_fused(q, k, v):
        return jnp.sum(jnp.sin(
            fused_rope_attention(q, k, v, tables, 4, 16 ** -0.5)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(_ref_core(q, k, v, 4)))

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5, err_msg=f"d{name}")


def test_mha_pallas_impl_matches_xla(rng):
    """The public multi_head_attention: impl='pallas' (fused kernel) vs
    forced-XLA parity."""
    H, n = 64, 4
    params = {
        name: {"w": jnp.asarray(rng.standard_normal((H, H)) * 0.05,
                                jnp.float32),
               "b": jnp.asarray(rng.standard_normal(H) * 0.01, jnp.float32)}
        for name in ("q", "k", "v", "out")
    }
    x = jnp.asarray(rng.standard_normal((2, 16, H)), jnp.float32)
    out_fused = multi_head_attention(params, x, x, x, num_heads=n,
                                     impl="pallas")
    out_xla = multi_head_attention(params, x, x, x, num_heads=n, impl="xla")
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               atol=2e-5, rtol=2e-5)


def test_fits_vmem_gate_accounts_for_width():
    """The old Tk-only bound admitted shapes whose RoPE tables alone blow
    VMEM (Tk=2048 at H=512 is 24 MB of tables) — the gate must weigh the
    full per-cell working set, while keeping the flagship geometry
    (T=128, H=1024) and long-but-narrow shapes eligible."""
    from neurosync_trainer_lite_tpu.ops.fused_attention import (
        MAX_KV_LEN, fits_vmem)

    assert fits_vmem(128, 128, 1024)          # flagship: ~3 MB working set
    assert fits_vmem(2048, 2048, 64)          # long but narrow fits
    assert not fits_vmem(2048, 2048, 512)     # old gate admitted this
    assert not fits_vmem(4096, 4096, 1024)
    assert 2048 <= MAX_KV_LEN                 # legacy constant still sane
