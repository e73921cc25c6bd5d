"""Checkpoint/resume: roundtrip, backup rotation, model.pth interchange."""

import os

import numpy as np
import pytest

import jax

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.training.checkpoint import (
    load_checkpoint,
    load_model,
    save_checkpoint,
    save_final_model,
)
from neurosync_trainer_lite_tpu.training.step import init_train_state

CFG = Config(hidden_dim=32, n_layers=1, num_heads=2, input_dim=8,
             output_dim=4, dropout=0.0, use_amp=False)


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt" / "checkpoint")
    state, _ = init_train_state(CFG, steps_per_epoch=10,
                                rng=jax.random.PRNGKey(5))
    save_checkpoint(state, epoch=3, batch_step=42, cfg=CFG,
                    checkpoint_path=path)
    epoch, batch_step, restored = load_checkpoint(path, CFG, steps_per_epoch=10)
    assert (epoch, batch_step) == (3, 42)
    _trees_equal(state.params, restored.params)
    _trees_equal(state.opt_state, restored.opt_state)


def test_backup_rotation_keeps_five(tmp_path):
    path = str(tmp_path / "ckpt" / "checkpoint")
    state, _ = init_train_state(CFG, steps_per_epoch=10)
    for epoch in range(8):
        save_checkpoint(state, epoch, epoch * 10, CFG, checkpoint_path=path)
    parent = os.path.dirname(path)
    backups = [d for d in os.listdir(parent) if d.startswith("backup_")]
    assert len(backups) == 5
    # newest checkpoint is the live one
    epoch, _, _ = load_checkpoint(path, CFG, steps_per_epoch=10)
    assert epoch == 7


def test_model_pth_roundtrip(tmp_path):
    """Weights-only export is loadable by torch and by our loader."""
    import torch

    path = str(tmp_path / "model.pth")
    state, _ = init_train_state(CFG, steps_per_epoch=10,
                                rng=jax.random.PRNGKey(6))
    save_final_model(state.params, CFG, path)

    sd = torch.load(path, map_location="cpu", weights_only=True)
    assert "encoder.embedding.weight" in sd
    assert sd["encoder.embedding.weight"].shape == (32, 8)
    assert "decoder.transformer_decoder.0.multihead_attn.q_linear.weight" in sd

    back = load_model(path, CFG)
    _trees_equal(state.params, back)
