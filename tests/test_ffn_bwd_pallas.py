"""The fused FFN-backward Pallas kernel (ops/ffn_bwd_pallas.py) must match
the composed XLA chain it replaces: dam = dy@w2ᵀ; dh1 = where(am>0,
dam*scale, 0); db2 = colsum(dy); db1 = colsum(dh1) — and the drop-in core's
gradients must match the shipped lean-FFN custom vjp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurosync_trainer_lite_tpu.models.seq2seq import _ffn_lean_core
from neurosync_trainer_lite_tpu.ops.ffn_bwd_pallas import (
    ffn_bwd_dh1,
    ffn_lean_core_fused,
)


@pytest.mark.parametrize("M,H,F,dtype", [
    (256, 128, 512, jnp.float32),
    (128, 128, 512, jnp.bfloat16),
    (96, 64, 192, jnp.float32),       # non-128 shapes: single-tile fallback
])
def test_fused_matches_composed(M, H, F, dtype):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    dy = jax.random.normal(k1, (M, H), jnp.float32).astype(dtype)
    w2 = jax.random.normal(k2, (F, H), jnp.float32).astype(dtype)
    # realistic am: output of where(keep, relu*scale, 0) — nonneg, sparse
    am_raw = jax.random.normal(k3, (M, F), jnp.float32)
    am = jnp.where(am_raw > 0.3, am_raw, 0.0).astype(dtype)
    scale = 256.0 / (256 - 77)  # dropout 0.3's quantized inverted scale

    dh1, db2, db1 = jax.jit(
        lambda a, b, c: ffn_bwd_dh1(a, b, c, scale=scale))(dy, w2, am)

    # composed reference (the XLA path in _ffn_lean_bwd, fp32 epilogue)
    dam = jnp.dot(dy, w2.T, preferred_element_type=jnp.float32)
    dh1_ref = jnp.where(am > 0, dam * scale, 0.0)
    np.testing.assert_allclose(
        np.asarray(dh1, np.float32), np.asarray(dh1_ref.astype(dtype),
                                                np.float32),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(db2), np.asarray(jnp.sum(dy.astype(jnp.float32), axis=0)),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(db1),
        np.asarray(jnp.sum(dh1_ref, axis=0)), rtol=2e-4, atol=2e-4)


def test_fused_core_grads_match_shipped_lean_core():
    """End-to-end vjp agreement: the fused-backward core vs the shipped
    _ffn_lean_core on identical bf16 inputs + mask. The only arithmetic
    difference is where the single bf16 rounding of dam happens (the fused
    epilogue multiplies in fp32 first), so tolerances are bf16-scale."""
    B, T, H, F = 2, 16, 128, 512
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    x = jax.random.normal(ks[0], (B, T, H), jnp.float32).astype(jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (H, F), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (F,), jnp.float32) * 0.01
    w2 = jax.random.normal(ks[3], (F, H), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (H,), jnp.float32) * 0.01
    keep = jax.random.bits(ks[5], (B, T, F), jnp.uint8) >= 77
    scale = 256.0 / (256 - 77)

    def f_ship(x, w1, b1, w2, b2):
        return _ffn_lean_core(x, w1, b1, w2, b2, keep,
                              jnp.float32(scale)).astype(jnp.float32).sum()

    def f_fused(x, w1, b1, w2, b2):
        return ffn_lean_core_fused(x, w1, b1, w2, b2, keep,
                                   scale).astype(jnp.float32).sum()

    y_s, g_s = jax.value_and_grad(f_ship, argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    y_f, g_f = jax.value_and_grad(f_fused, argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    np.testing.assert_allclose(float(y_s), float(y_f), rtol=1e-6)  # fwd ==
    for a, b, name in zip(g_s, g_f, ("dx", "dw1", "db1", "dw2", "db2")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2, err_msg=name)


def test_scale_one_and_full_mask():
    """dropout off (scale 1, all am kept) reduces to a plain masked matmul."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    dy = jax.random.normal(k1, (128, 128), jnp.bfloat16)
    w2 = jax.random.normal(k2, (512, 128), jnp.bfloat16)
    am = jnp.abs(jax.random.normal(k2, (128, 512), jnp.bfloat16)) + 0.01
    dh1, db2, db1 = ffn_bwd_dh1(dy, w2, am, scale=1.0)
    dam = jnp.dot(dy, w2.T, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(dh1, np.float32),
                               np.asarray(dam.astype(jnp.bfloat16),
                                          np.float32),
                               rtol=1e-5, atol=1e-5)
    assert db2.shape == (128,) and db1.shape == (512,)
