"""The compiled training/eval step.

One jitted function replaces the reference's entire per-step Python choreography
(reference: utils/training_utils.py:56-91 single-device and :176-274 multi-GPU
— forward, backward, manual gradient unscale, cross-device grad averaging
loop, clip, step, parameter re-broadcast): under pjit/GSPMD the batch is
sharded over the 'data' mesh axis, the loss mean induces the gradient
all-reduce over ICI, and the optimizer update runs sharded in the same
program. bf16 mixed precision needs no GradScaler.

The pre-clip global gradient norm is returned every step, matching the
reference's calculate_gradient_norm logging (training_utils.py:72,349-357).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.models.loss import loss_fn
from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq, seq2seq_apply
from neurosync_trainer_lite_tpu.training.optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def init_train_state(cfg: Config, steps_per_epoch: int, *, rng=None,
                     params=None) -> tuple[TrainState, optax.GradientTransformation]:
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        params = init_seq2seq(rng, cfg)
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(params, tx.init(params)), tx


def state_shardings(cfg: Config, mesh,
                    tx: optax.GradientTransformation) -> TrainState:
    """TrainState-shaped pytree of NamedShardings: params get the TP/
    replication rules, optimizer state inherits the matching shardings
    (moments follow their parameters, counters replicate) via an ABSTRACT
    tx.init lowering — nothing is materialized. Used by shard_state, the
    collective checkpoint restore, and the flagship AOT-compile test."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neurosync_trainer_lite_tpu.parallel.mesh import param_shardings

    p_sh = param_shardings(cfg, mesh)
    abs_params = jax.tree.map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        jax.eval_shape(lambda: init_seq2seq(jax.random.PRNGKey(0), cfg)),
        p_sh)
    out_sh = jax.jit(tx.init).lower(abs_params).compile().output_shardings
    replicated = NamedSharding(mesh, P())

    def fix(sh):
        # constants created inside tx.init (step counters) come back on a
        # single default device; everything must live on the mesh
        if not (isinstance(sh, NamedSharding) and sh.mesh.shape == mesh.shape):
            return replicated
        return sh

    return TrainState(p_sh, jax.tree.map(fix, out_sh))


def shard_state(state: TrainState, cfg: Config, mesh,
                tx: optax.GradientTransformation) -> TrainState:
    """Place a TrainState onto a mesh per state_shardings' rules."""
    sh = state_shardings(cfg, mesh, tx)
    return TrainState(
        jax.device_put(state.params, sh.params),
        jax.tree.map(lambda v, s: jax.device_put(v, s),
                     state.opt_state, sh.opt_state))


def _compute_loss(params, src, trg, cfg: Config, rng, train: bool,
                  step_count=None, total_steps: int = 1):
    pred = seq2seq_apply(params, src, cfg, rng=rng, train=train)
    if cfg.loss_variant == "smoothness":
        from neurosync_trainer_lite_tpu.models.loss import smoothness_loss_fn

        return smoothness_loss_fn(
            pred, trg, delta=cfg.delta, w1=cfg.w1, w2=cfg.w2, w3=cfg.w3,
            w4=cfg.w4, current_step=step_count, total_steps=total_steps,
            anneal=cfg.smoothness_annealing,
        )
    return loss_fn(
        pred, trg, delta=cfg.delta, w1=cfg.w1, w2=cfg.w2, w3=cfg.w3,
        zero_penalty_weight=cfg.zero_penalty_weight,
    )


def make_train_step(cfg: Config, tx: optax.GradientTransformation,
                    *, donate: bool = True, total_steps: int = 1):
    """Returns jitted (state, src, trg, rng) → (state, loss, grad_norm)."""
    if cfg.loss_variant == "smoothness" and cfg.smoothness_annealing:
        # with total_steps=1 the phase would hit an integer multiple of 2π
        # at every step (alpha pinned to 1, beta to 0) — the schedule
        # silently never runs
        assert total_steps > 1, (
            "smoothness_annealing needs the real step count: pass "
            "total_steps=steps_per_epoch * n_epochs to make_train_step")

    def step(state: TrainState, src, trg, rng):
        step_count = None
        if cfg.loss_variant == "smoothness" and cfg.smoothness_annealing:
            # the Adam update counter doubles as the global step for the
            # annealed smoothness schedule (traced, stays in the program)
            step_count = opt_step_count(state.opt_state)

        if cfg.grad_accum_steps > 1:
            # Sequential micro-batches inside one compiled step: activations
            # exist only for one micro-batch at a time (lax.scan), gradients
            # accumulate fp32, a single optimizer update fires at the end.
            A = cfg.grad_accum_steps
            B = src.shape[0]
            assert B % A == 0, (B, A)
            srcs = src.reshape(A, B // A, *src.shape[1:])
            trgs = trg.reshape(A, B // A, *trg.shape[1:])
            keys = jax.random.split(rng, A)

            def micro(carry, xs):
                gacc, lacc = carry
                s, t, k = xs
                loss, grads = jax.value_and_grad(_compute_loss)(
                    state.params, s, t, cfg, k, True, step_count, total_steps)
                gacc = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), gacc, grads)
                return (gacc, lacc + loss), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (gsum, lsum), _ = jax.lax.scan(
                micro, (zeros, jnp.zeros((), jnp.float32)),
                (srcs, trgs, keys))
            grads = jax.tree.map(lambda g: g / A, gsum)
            loss = lsum / A
        else:
            loss, grads = jax.value_and_grad(_compute_loss)(
                state.params, src, trg, cfg, rng, True, step_count,
                total_steps)

        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss, grad_norm

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: Config, *, total_steps: int = 1):
    """Returns jitted (params, src, trg[, step_count]) → loss (dropout off).

    `step_count` matters only for loss_variant='smoothness' with annealing on:
    passing the optimizer's step counter keeps validation loss on the same
    annealed alpha/beta scale as the training loss (otherwise eval would use
    alpha=beta=1 and train/val curves would not be comparable)."""

    def step(params, src, trg, step_count=None):
        return _compute_loss(params, src, trg, cfg, None, False, step_count,
                             total_steps)

    return jax.jit(step)


def opt_step_count(opt_state):
    """The optimizer's global step counter (a traced/device scalar)."""
    counts = optax.tree_utils.tree_get_all_with_path(opt_state, "count")
    return counts[0][1]
