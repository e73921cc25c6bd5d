"""Optimizer and LR schedule.

Matches the reference's training components (reference: utils/model_utils.py:9-20):
- Adam(lr=5e-5, weight_decay=1e-5) with torch semantics: the weight decay is
  L2 regularization added to the gradient *before* the Adam moments (torch
  optim.Adam, not AdamW), betas (0.9, 0.999), eps 1e-8 added after sqrt.
- LambdaLR stepped once per epoch: factor(e) = e/warmup for e < warmup_epochs,
  else max(0, (n_epochs - e) / (n_epochs - warmup_epochs)).
- Global-norm gradient clipping at 2.0 applied to raw gradients before the
  update (reference: training_utils.py:73, train.py:44).

All of it compiles into the jitted train step — the schedule is a function of
the optimizer step count with a fixed steps_per_epoch, so resume restores the
exact LR trajectory from the restored opt_state count.
"""

from __future__ import annotations

import optax

from neurosync_trainer_lite_tpu.config import Config


def lr_factor(epoch: int | float, cfg: Config) -> float:
    """The reference's LambdaLR lambda (model_utils.py:13-16)."""
    if epoch < cfg.warmup_epochs:
        return float(epoch) / float(max(1, cfg.warmup_epochs))
    return max(
        0.0,
        float(cfg.n_epochs - epoch)
        / float(max(1, cfg.n_epochs - cfg.warmup_epochs)),
    )


def make_schedule(cfg: Config, steps_per_epoch: int):
    """Per-step LR: base_lr × epoch factor (epoch = step // steps_per_epoch)."""
    import jax.numpy as jnp

    warmup = cfg.warmup_epochs

    def schedule(count):
        epoch = count // max(1, steps_per_epoch)
        epoch = jnp.asarray(epoch, jnp.float32)
        warm = epoch / max(1, warmup)
        decay = jnp.maximum(
            0.0,
            (cfg.n_epochs - epoch) / max(1, cfg.n_epochs - warmup),
        )
        factor = jnp.where(epoch < warmup, warm, decay)
        return cfg.learning_rate * factor

    return schedule


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0),
        optax.scale_by_learning_rate(make_schedule(cfg, steps_per_epoch)),
    )
