"""Gradient accumulation: N sequential micro-batches ≡ one full batch."""

import numpy as np

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import tiny_config
from neurosync_trainer_lite_tpu.parallel.mesh import batch_sharding, make_mesh
from neurosync_trainer_lite_tpu.training.step import (
    TrainState,
    init_train_state,
    make_train_step,
    shard_state,
)


def _data(rng, B, T, cfg):
    src = jnp.asarray(rng.standard_normal((B, T, cfg.input_dim)), jnp.float32)
    trg = jnp.asarray(rng.standard_normal((B, T, cfg.output_dim)), jnp.float32)
    return src, trg


def test_accum_matches_full_batch():
    rng = np.random.default_rng(0)
    base = tiny_config(batch_size=8, dropout=0.0)
    src, trg = _data(rng, 8, 16, base)

    def run(accum):
        cfg = base.replace(grad_accum_steps=accum)
        state, tx = init_train_state(cfg, steps_per_epoch=10)
        step = make_train_step(cfg, tx, donate=False)
        losses = []
        for i in range(2):
            state, loss, gn = step(state, src, trg, jax.random.PRNGKey(0))
            losses.append(float(loss))
        return losses, state, float(gn)

    import pytest

    losses_1, state_1, gn_1 = run(1)
    losses_4, state_4, gn_4 = run(4)
    np.testing.assert_allclose(losses_1, losses_4, rtol=1e-5)
    assert gn_1 == pytest.approx(gn_4, rel=1e-4)
    for a, b in zip(jax.tree.leaves(state_1.params),
                    jax.tree.leaves(state_4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_accum_with_data_parallel_mesh():
    rng = np.random.default_rng(1)
    cfg = tiny_config(batch_size=16, dropout=0.0, dp=4, tp=1,
                      grad_accum_steps=2)
    mesh = make_mesh(cfg)
    state, tx = init_train_state(cfg, steps_per_epoch=10)
    state = shard_state(state, cfg, mesh, tx)
    step = make_train_step(cfg, tx, donate=False)
    src, trg = _data(rng, 16, 16, cfg)
    src = jax.device_put(src, batch_sharding(mesh))
    trg = jax.device_put(trg, batch_sharding(mesh))
    state, loss, gn = step(state, src, trg, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)) and np.isfinite(float(gn))


def test_accum_with_dropout_runs():
    rng = np.random.default_rng(2)
    cfg = tiny_config(batch_size=8, dropout=0.3, grad_accum_steps=2)
    state, tx = init_train_state(cfg, steps_per_epoch=10)
    step = make_train_step(cfg, tx, donate=False)
    src, trg = _data(rng, 8, 16, cfg)
    state, loss, gn = step(state, src, trg,
                           jax.random.key(0, impl="rbg"))
    assert np.isfinite(float(loss))
