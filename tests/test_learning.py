"""Learning sanity: the model learns a deterministic audio→blendshape map.

Synthetic clips where blendshapes are a fixed nonlinear function of the audio
features; a tiny model trained for a few hundred steps must cut its loss by
>2x and produce predictions that correlate with held-out ground truth —
catching silent optimization bugs (wrong grads, dead RoPE, broken loss) that
shape-level tests cannot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import tiny_config
from neurosync_trainer_lite_tpu.data.windowing import WindowedDataset
from neurosync_trainer_lite_tpu.models.seq2seq import seq2seq_apply
from neurosync_trainer_lite_tpu.training.step import (
    init_train_state,
    make_train_step,
)


def _synthetic_clips(rng, n_clips=3, frames=400, in_dim=24, out_dim=61):
    w = rng.standard_normal((in_dim, out_dim)).astype(np.float32) * 0.5
    clips = []
    for _ in range(n_clips):
        a = rng.standard_normal((frames, in_dim)).astype(np.float32)
        # smooth the audio features over time so temporal terms are meaningful
        k = np.ones(5, np.float32) / 5
        a = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, a)
        f = np.tanh(a @ w).astype(np.float32)
        clips.append((a, f))
    return clips


@pytest.mark.slow
def test_model_learns_the_mapping():
    rng = np.random.default_rng(0)
    cfg = tiny_config(hidden_dim=64, n_layers=2, num_heads=4,
                      input_dim=24, batch_size=16, micro_batch_size=32,
                      learning_rate=3e-4, n_epochs=1)
    clips = _synthetic_clips(rng, in_dim=cfg.input_dim)
    ds = WindowedDataset(clips, window=cfg.micro_batch_size)
    train_view, val_view = ds.split(0.2, seed=0)

    state, tx = init_train_state(cfg, steps_per_epoch=100)
    step = make_train_step(cfg, tx, donate=False)

    losses = []
    key = jax.random.PRNGKey(0)
    n_steps = 0
    for epoch in range(8):
        for src, trg in train_view.batches(cfg.batch_size, shuffle=True,
                                           seed=epoch, drop_last=True):
            state, loss, _ = step(state, jnp.asarray(src), jnp.asarray(trg),
                                  jax.random.fold_in(key, n_steps))
            losses.append(float(loss))
            n_steps += 1

    assert losses[-1] < losses[0] / 2, (losses[0], losses[-1])

    # held-out correlation
    vsrc, vtrg = val_view.gather(np.arange(min(32, len(val_view))))
    pred = np.asarray(seq2seq_apply(state.params, jnp.asarray(vsrc), cfg))
    r = np.corrcoef(pred.ravel(), vtrg.ravel())[0, 1]
    assert r > 0.5, f"held-out correlation too low: {r:.3f}"
