"""Loss variants: the zero-penalty option and the smoothness research loss
(reference model.py:296-346 and :377-485), including a torch cross-check and
a full train-step integration with annealing."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import tiny_config
from neurosync_trainer_lite_tpu.models.loss import (
    ZERO_INDICES,
    loss_fn,
    smoothness_loss_fn,
)


def _torch_smoothness(pred, targ, delta=1.0, w1=1.0, w2=1.0, w3=1.0, w4=1.0):
    """Independent torch oracle for the documented variant-(c) math."""
    pred_t = torch.from_numpy(pred)
    targ_t = torch.from_numpy(targ)
    err = targ_t - pred_t
    abs_err = err.abs()
    huber = torch.where(abs_err <= delta, 0.5 * err.square(),
                        delta * abs_err - 0.5 * delta ** 2).mean()
    dp = pred_t[:, :-1] - pred_t[:, 1:]
    dt = targ_t[:, :-1] - targ_t[:, 1:]
    l2 = (dp - dt).pow(2).mean()
    d2p = dp[:, :-1] - dp[:, 1:]
    d2t = dt[:, :-1] - dt[:, 1:]
    so = (d2p - d2t).pow(2).mean()
    cos = F.cosine_similarity(pred_t.reshape(-1, pred_t.size(-1)),
                              targ_t.reshape(-1, targ_t.size(-1)), dim=-1)
    return float(w1 * huber + w2 * l2 + w4 * so + w3 * (1 - cos.mean()))


def test_smoothness_matches_torch(rng):
    pred = rng.standard_normal((3, 20, 61)).astype(np.float32)
    targ = rng.standard_normal((3, 20, 61)).astype(np.float32)
    ours = float(smoothness_loss_fn(jnp.asarray(pred), jnp.asarray(targ),
                                    w2=0.7, w3=1.3, w4=0.5))
    ref = _torch_smoothness(pred, targ, w2=0.7, w3=1.3, w4=0.5)
    assert ours == pytest.approx(ref, rel=1e-5)


def test_annealing_weights_move(rng):
    pred = jnp.asarray(rng.standard_normal((1, 10, 4)).astype(np.float32))
    targ = jnp.asarray(rng.standard_normal((1, 10, 4)).astype(np.float32))
    # phase = step/total * 2π·cycles; with total=2000, cycles=1000 the phase is
    # step·π: alpha (L2 weight) is 1 at step 0 and 0 at step 1, beta opposite.
    l0 = float(smoothness_loss_fn(pred, targ, anneal=True, current_step=0,
                                  total_steps=2000, anneal_cycles=1000))
    l_half = float(smoothness_loss_fn(pred, targ, anneal=True, current_step=1,
                                      total_steps=2000, anneal_cycles=1000))
    assert l0 != pytest.approx(l_half, rel=1e-6)
    # alpha=1/beta=0 at step 0 ⇒ equals the un-annealed loss with w4 = 0
    assert l0 == pytest.approx(
        float(smoothness_loss_fn(pred, targ, w4=0.0)), rel=1e-5)
    # alpha=0/beta=1 at step 1 ⇒ equals the un-annealed loss with w2 = 0
    assert l_half == pytest.approx(
        float(smoothness_loss_fn(pred, targ, w2=0.0)), rel=1e-4)


def test_zero_penalty_increases_loss(rng):
    pred = jnp.asarray(rng.uniform(0.1, 1, (2, 16, 61)).astype(np.float32))
    targ = jnp.zeros((2, 16, 61))
    base = float(loss_fn(pred, targ))
    with_pen = float(loss_fn(pred, targ, zero_penalty_weight=2.0))
    assert with_pen > base
    # penalty targets exactly the documented zero dims
    manual = base + 2.0 * float(jnp.mean(jnp.abs(pred[:, :, list(ZERO_INDICES)])))
    assert with_pen == pytest.approx(manual, rel=1e-6)


def test_annealing_requires_real_total_steps(rng):
    """total_steps=1 pins alpha=1/beta=0 at every integer step — the schedule
    silently never runs (ADVICE r1). make_train_step must refuse it."""
    from neurosync_trainer_lite_tpu.training.step import (
        init_train_state, make_train_step)

    cfg = tiny_config(loss_variant="smoothness", smoothness_annealing=True)
    state, tx = init_train_state(cfg, steps_per_epoch=5)
    with pytest.raises(AssertionError, match="total_steps"):
        make_train_step(cfg, tx, donate=False)  # default total_steps=1


def test_eval_step_uses_annealed_weights(rng):
    """Validation loss must sit on the same annealed alpha/beta scale as the
    training loss when step_count is threaded through (ADVICE r1)."""
    from neurosync_trainer_lite_tpu.training.step import (
        init_train_state, make_eval_step)

    cfg = tiny_config(loss_variant="smoothness", smoothness_annealing=True,
                      batch_size=4)
    state, _ = init_train_state(cfg, steps_per_epoch=5)
    eval_step = make_eval_step(cfg, total_steps=2000)
    src = jnp.asarray(rng.standard_normal((4, 16, cfg.input_dim)), jnp.float32)
    trg = jnp.asarray(rng.standard_normal((4, 16, cfg.output_dim)), jnp.float32)

    # eval loss at two phases of the annealing cycle must differ
    l_alpha = float(eval_step(state.params, src, trg, jnp.asarray(0)))
    l_beta = float(eval_step(state.params, src, trg, jnp.asarray(1)))
    assert l_alpha != pytest.approx(l_beta, rel=1e-6)
    # and each matches the loss function evaluated at that step directly
    from neurosync_trainer_lite_tpu.models.seq2seq import seq2seq_apply
    out = seq2seq_apply(state.params, src, cfg, train=False)
    direct = float(smoothness_loss_fn(out, trg, anneal=True, current_step=0,
                                      total_steps=2000))
    assert l_alpha == pytest.approx(direct, rel=1e-5)


def test_train_step_with_smoothness_annealing(rng):
    from neurosync_trainer_lite_tpu.training.step import (
        init_train_state, make_train_step)

    cfg = tiny_config(loss_variant="smoothness", smoothness_annealing=True,
                      batch_size=4)
    state, tx = init_train_state(cfg, steps_per_epoch=5)
    step = make_train_step(cfg, tx, donate=False, total_steps=10)
    src = jnp.asarray(rng.standard_normal((4, 16, cfg.input_dim)), jnp.float32)
    trg = jnp.asarray(rng.standard_normal((4, 16, cfg.output_dim)), jnp.float32)
    losses = []
    for i in range(3):
        state, loss, gnorm = step(state, src, trg, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # it optimizes
