"""Compiled-program structure: DP gradient sync is XLA collectives.

The reference synchronizes gradients with a Python loop of ~500 per-parameter
device-to-device copies (reference: training_utils.py:229-257). Here the same
semantics must compile into a handful of fused all-reduce ops inside the one
train-step program — this test inspects the optimized HLO to prove it (and to
catch regressions that silently break sharding, e.g. a replicated batch that
makes XLA skip the reduction entirely).
"""

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import tiny_config
from neurosync_trainer_lite_tpu.parallel.mesh import batch_sharding, make_mesh
from neurosync_trainer_lite_tpu.training.step import (
    init_train_state,
    make_train_step,
    shard_state,
)


def _compiled_hlo(cfg, mesh):
    state, tx = init_train_state(cfg, steps_per_epoch=10)
    state = shard_state(state, cfg, mesh, tx)
    step = make_train_step(cfg, tx, donate=False)
    src = jax.device_put(jnp.zeros((cfg.batch_size, 16, cfg.input_dim)),
                         batch_sharding(mesh))
    trg = jax.device_put(jnp.zeros((cfg.batch_size, 16, cfg.output_dim)),
                         batch_sharding(mesh))
    lowered = step.lower(state, src, trg, jax.random.PRNGKey(0))
    return lowered.compile().as_text()


def test_dp_grad_sync_is_fused_all_reduce():
    cfg = tiny_config(batch_size=8, dp=8, tp=1)
    hlo = _compiled_hlo(cfg, make_mesh(cfg))
    n_allreduce = hlo.count("all-reduce(")
    n_allreduce += hlo.count("all-reduce-start(")
    assert n_allreduce > 0, "no all-reduce in the DP train step HLO"
    # fused: orders of magnitude fewer reductions than parameters (~50 leaves)
    assert n_allreduce <= 12, f"{n_allreduce} all-reduces — gradient fusion broke"


def test_tp_inserts_collectives():
    cfg = tiny_config(batch_size=8, dp=4, tp=2)
    hlo = _compiled_hlo(cfg, make_mesh(cfg))
    has_collective = any(op in hlo for op in
                        ("all-reduce(", "all-reduce-start(",
                         "reduce-scatter(", "all-gather("))
    assert has_collective, "no collectives in the dp×tp train step HLO"
