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


def test_load_model_accepts_checkpoint_dir_torch_free(tmp_path, monkeypatch):
    """load_model on an Orbax checkpoint DIRECTORY returns the params
    pytree without importing torch — the torch-free path that keeps
    neurosync-infer/-serve usable without the [interop] extra."""
    path = str(tmp_path / "ckpt" / "checkpoint")
    state, _ = init_train_state(CFG, steps_per_epoch=10,
                                rng=jax.random.PRNGKey(5))
    save_checkpoint(state, epoch=3, batch_step=42, cfg=CFG,
                    checkpoint_path=path)
    # prove the path never touches torch: make any torch import explode
    import builtins
    real_import = builtins.__import__

    def no_torch(name, *a, **kw):
        if name == "torch" or name.startswith("torch."):
            raise AssertionError("load_model(dir) imported torch")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    params = load_model(path, CFG)
    _trees_equal(state.params, params)


def test_save_final_model_skips_without_torch(tmp_path, monkeypatch, capsys):
    """Without torch the per-epoch .pth export degrades to a loud skip
    instead of crashing the training run (code-review r3)."""
    from neurosync_trainer_lite_tpu.utils import torch_interop

    state, _ = init_train_state(CFG, steps_per_epoch=10,
                                rng=jax.random.PRNGKey(5))
    monkeypatch.setattr(torch_interop, "torch_available", lambda: False)
    import neurosync_trainer_lite_tpu.training.checkpoint as ck
    monkeypatch.setattr(ck, "_warned_no_torch", False)
    out = str(tmp_path / "model.pth")
    save_final_model(state.params, CFG, out)
    assert not os.path.exists(out)
    assert "skipping the model.pth export" in capsys.readouterr().out


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


def test_async_save_restores_identically_and_rotates(tmp_path):
    """async_save=True must land an identical checkpoint + model.pth after
    wait_for_pending_saves(), and a following save must wait for it before
    rotating the directory into a backup."""
    from neurosync_trainer_lite_tpu.training.checkpoint import (
        wait_for_pending_saves)

    path = str(tmp_path / "ckpt")
    state, _ = init_train_state(CFG, steps_per_epoch=10,
                                rng=jax.random.PRNGKey(8))
    save_checkpoint(state, 1, 5, CFG, path, async_save=True)
    save_final_model(state.params, CFG, str(tmp_path / "model.pth"),
                     async_save=True)
    wait_for_pending_saves()

    epoch, batch_step, restored = load_checkpoint(path, CFG,
                                                  steps_per_epoch=10)
    assert (epoch, batch_step) == (1, 5)
    _trees_equal(state.params, restored.params)
    assert (tmp_path / "model.pth").exists()

    save_checkpoint(state, 2, 9, CFG, path, async_save=True)
    wait_for_pending_saves()
    assert any(d.name.startswith("backup_") for d in tmp_path.iterdir())
    epoch, batch_step, _ = load_checkpoint(path, CFG, steps_per_epoch=10)
    assert (epoch, batch_step) == (2, 9)


def test_loop_waits_for_pending_saves_before_donating(tmp_path, monkeypatch):
    """Async saves read the state buffers that the NEXT epoch's first train
    step DONATES — the loop must wait_for_pending_saves() before each epoch
    trains (real-TPU crash otherwise; CPU ignores donation, so only this
    ordering assertion can catch a regression here)."""
    import numpy as np

    from neurosync_trainer_lite_tpu.config import tiny_config
    from neurosync_trainer_lite_tpu.training import loop as L

    events = []
    real_wait = L.wait_for_pending_saves
    real_epoch = L.train_one_epoch
    monkeypatch.setattr(
        L, "wait_for_pending_saves",
        lambda: (events.append("wait"), real_wait())[1])
    monkeypatch.setattr(
        L, "train_one_epoch",
        lambda *a, **k: (events.append("train"), real_epoch(*a, **k))[1])

    cfg = tiny_config(
        hidden_dim=32, n_layers=1, num_heads=2, batch_size=4, n_epochs=2,
        micro_batch_size=16, frame_size=16, overlap=4, dp=1, tp=1,
        checkpoint_path=str(tmp_path / "ckpt"),
        model_path=str(tmp_path / "model.pth"),
        plots_dir=str(tmp_path / "plots"),
        audio_path=str(tmp_path / "missing.wav"),  # skip validation assets
        ground_truth_path=str(tmp_path / "missing.csv"))
    rng = np.random.default_rng(0)
    clips = [(rng.standard_normal((40, cfg.input_dim)).astype(np.float32),
              rng.standard_normal((40, cfg.output_dim)).astype(np.float32))]
    L.train_model(cfg, clips, verbose=False)

    # every train event must be preceded by a wait event (same count before)
    waits = 0
    for ev in events:
        if ev == "wait":
            waits += 1
        else:
            assert waits > 0, events  # a train ran without a prior wait
            waits -= 1


def test_metaless_checkpoint_falls_back_to_newest_backup(tmp_path):
    """A crash mid-async-save leaves the live dir meta-less AFTER the
    previous good checkpoint was rotated into backup_<ts>/; resume must fall
    back to that backup instead of raising (ADVICE r2, medium)."""
    path = str(tmp_path / "ckpt" / "checkpoint")
    state, _ = init_train_state(CFG, steps_per_epoch=10,
                                rng=jax.random.PRNGKey(7))
    save_checkpoint(state, epoch=4, batch_step=40, cfg=CFG,
                    checkpoint_path=path)
    save_checkpoint(state, epoch=5, batch_step=50, cfg=CFG,
                    checkpoint_path=path)
    # simulate the crash window: live checkpoint has state but no meta yet
    os.remove(os.path.join(path, "meta.json"))
    epoch, batch_step, restored = load_checkpoint(path, CFG,
                                                  steps_per_epoch=10)
    assert (epoch, batch_step) == (4, 40)
    _trees_equal(state.params, restored.params)

    # with no usable backup either, the error must say why
    import shutil
    parent = os.path.dirname(path)
    for d in os.listdir(parent):
        if d.startswith("backup_"):
            shutil.rmtree(os.path.join(parent, d))
    with pytest.raises(FileNotFoundError, match="meta"):
        load_checkpoint(path, CFG, steps_per_epoch=10)


def test_failed_async_export_raises_at_wait(tmp_path, monkeypatch):
    """A model.pth export that dies in its background thread (disk full,
    serialization error) must surface at wait_for_pending_saves(), not
    vanish into the thread excepthook (ADVICE r2)."""
    from neurosync_trainer_lite_tpu.training.checkpoint import (
        wait_for_pending_saves)
    from neurosync_trainer_lite_tpu.utils import torch_interop

    monkeypatch.setattr(
        torch_interop, "save_torch_model",
        lambda *a, **k: (_ for _ in ()).throw(OSError("disk full")))
    state, _ = init_train_state(CFG, steps_per_epoch=10)
    save_final_model(state.params, CFG, str(tmp_path / "model.pth"),
                     async_save=True)
    with pytest.raises(RuntimeError, match="export failed"):
        wait_for_pending_saves()
    # errors are cleared after raising; subsequent waits are clean
    wait_for_pending_saves()


def test_async_meta_written_only_after_state_lands(tmp_path):
    """meta.json present must imply state/ is complete: the async path
    defers the meta sidecar to wait_for_pending_saves(), so a crash during
    the in-flight save leaves a recognizably incomplete directory instead
    of a valid-looking meta over a half-written state."""
    from neurosync_trainer_lite_tpu.training.checkpoint import (
        wait_for_pending_saves)

    path = str(tmp_path / "ckpt")
    state, _ = init_train_state(CFG, steps_per_epoch=10)
    save_checkpoint(state, 1, 5, CFG, path, async_save=True)
    assert not os.path.exists(os.path.join(path, "meta.json"))
    wait_for_pending_saves()
    assert os.path.exists(os.path.join(path, "meta.json"))
    epoch, _, _ = load_checkpoint(path, CFG, steps_per_epoch=10)
    assert epoch == 1


def test_orbax_wait_failure_raises_collectively_and_drops_pending_meta(
        tmp_path, monkeypatch):
    """An exception from the async checkpointer's wait (Orbax write error)
    must surface as the fenced RuntimeError — not escape raw before the
    cross-process failure allgather — and the deferred meta sidecars for
    the possibly-incomplete saves must be DROPPED, keeping the invariant
    that meta.json present implies state/ is complete."""
    from neurosync_trainer_lite_tpu.training import checkpoint as C

    class _DyingCkptr:
        def wait_until_finished(self):
            raise OSError("orbax write failed")

    ckpt_dir = tmp_path / "ckpt"
    os.makedirs(ckpt_dir)
    monkeypatch.setattr(C, "_async_ckptr", _DyingCkptr())
    C._pending_meta.append((str(ckpt_dir), {"epoch": 0}))
    try:
        with pytest.raises(RuntimeError, match="failed"):
            C.wait_for_pending_saves()
    finally:
        C._pending_meta.clear()
    assert not os.path.exists(ckpt_dir / "meta.json")


def test_sync_final_model_save_is_atomic(tmp_path, monkeypatch):
    """The synchronous model.pth export (the guaranteed-good final write at
    the end of train_model) must not truncate the previous good export if
    torch.save dies midway — it writes to a tmp file and os.replace()s."""
    from neurosync_trainer_lite_tpu.utils import torch_interop

    path = tmp_path / "model.pth"
    path.write_bytes(b"previous good export")

    def dies_midway(params, cfg, out_path):
        with open(out_path, "wb") as f:
            f.write(b"half a st")
        raise OSError("disk full")

    monkeypatch.setattr(torch_interop, "save_torch_model", dies_midway)
    state, _ = init_train_state(CFG, steps_per_epoch=10)
    with pytest.raises(OSError, match="disk full"):
        save_final_model(state.params, CFG, str(path))
    assert path.read_bytes() == b"previous good export"
