"""Checkpoint/resume with rotating backups, plus reference-format export.

Matches the reference's checkpoint semantics (reference:
utils/checkpoint_utils.py:10-51): one bundle of {model, optimizer state,
epoch, batch_step, config}; on every save the previous checkpoint moves into
a timestamped ``backup_YYYYmmdd_HHMMSS`` directory and only the 5 newest
backups are kept; a bare weights-only ``model.pth`` (torch state dict — the
interchange format with the NeuroSync API/Player) is also written each epoch.

Storage is Orbax (async-capable, sharding-aware); metadata rides in a JSON
sidecar. Restore rebuilds the exact optax state structure from an abstract
template, so the LR schedule and Adam moments continue bit-exactly.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from datetime import datetime

import jax
import numpy as np
import orbax.checkpoint as ocp

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.training.step import TrainState, init_train_state

_STATE_SUBDIR = "state"
_META_FILE = "meta.json"
_KEEP_BACKUPS = 5

# async-save machinery: one persistent AsyncCheckpointer (its background
# serialization overlaps the device→host fetch + disk write with the next
# epoch's compute — JAX arrays are immutable, so the snapshot is consistent)
# plus background threads for the model.pth export
_async_ckptr: ocp.AsyncCheckpointer | None = None
_export_threads: list[threading.Thread] = []
_export_errors: list[BaseException] = []
_pending_meta: list[tuple[str, dict]] = []
_warned_no_torch = False


def _get_async_ckptr() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def _write_meta(path: str, meta: dict) -> None:
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2)


def wait_for_pending_saves() -> None:
    """Block until every async checkpoint save and model.pth export has
    landed on disk, THEN write the deferred meta sidecars. Called before
    the next save's backup rotation (the previous save must be complete
    before it is moved) and at loop end.

    The meta write is deferred so the sync path's crash invariant holds
    under async too: meta.json present ⇒ the state/ subdir is complete. A
    crash mid-async-save leaves a checkpoint directory without meta —
    recognizably incomplete, same as a crash mid-sync-save — instead of a
    valid-looking meta over a half-written state."""
    # the local completion work can itself raise (Orbax write error, disk
    # full during the meta write) — capture it so the failure still reaches
    # the cross-process fence below; letting it escape early would strand
    # the OTHER processes (whose saves succeeded) at the next collective
    # barrier forever, the exact wedge the fence exists to prevent
    local_exc: BaseException | None = None
    try:
        if _async_ckptr is not None:
            _async_ckptr.wait_until_finished()
        for t in _export_threads:
            t.join()
        _export_threads.clear()
        for path, meta in _pending_meta:
            _write_meta(path, meta)
        _pending_meta.clear()
    except BaseException as e:
        local_exc = e
        # do NOT write (or retry) the deferred metas for saves that may not
        # have completed — a meta-less dir stays recognizably incomplete and
        # resume falls back to the newest good backup
        _pending_meta.clear()
    failed = bool(_export_errors) or local_exc is not None
    if jax.process_count() > 1:
        # propagate the failure flag to EVERY process before raising:
        # exports run on process 0 only, and a lone process-0 raise would
        # leave the others blocked forever at the next collective barrier
        # (sync_global_devices) instead of failing the job fast
        from jax.experimental import multihost_utils

        any_failed = multihost_utils.process_allgather(
            np.asarray([1 if failed else 0], np.int32))
        failed = bool(any_failed.sum())
    if failed:
        # a failed model.pth export (disk full, serialization error) must not
        # pass silently — the per-epoch export would otherwise go stale with
        # only a stderr excepthook trace as evidence (ADVICE r2)
        err = local_exc or (_export_errors[0] if _export_errors else None)
        _export_errors.clear()
        raise RuntimeError("async checkpoint save or model.pth export failed"
                           + ("" if err is not None else
                              " on another process")) from err


def _barrier(tag: str) -> None:
    """Cross-process sync point for collective checkpoint phases (no-op
    single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _rotate_backups(checkpoint_path: str) -> None:
    """Move an existing checkpoint into backup_<ts>/ and prune to 5
    (reference: checkpoint_utils.py:22-36)."""
    if not os.path.exists(checkpoint_path):
        return
    parent = os.path.dirname(checkpoint_path) or "."
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    backup_dir = os.path.join(parent, f"backup_{timestamp}")
    while os.path.exists(backup_dir):  # same-second saves (tests)
        timestamp += "x"
        backup_dir = os.path.join(parent, f"backup_{timestamp}")
    os.makedirs(backup_dir)
    shutil.move(checkpoint_path,
                os.path.join(backup_dir, os.path.basename(checkpoint_path)))

    backups = sorted(
        (d for d in os.listdir(parent) if d.startswith("backup_")),
        key=lambda d: os.path.getmtime(os.path.join(parent, d)),
        reverse=True,
    )
    for old in backups[_KEEP_BACKUPS:]:
        shutil.rmtree(os.path.join(parent, old))


def save_checkpoint(state: TrainState, epoch: int, batch_step: int,
                    cfg: Config, checkpoint_path: str | None = None,
                    *, async_save: bool = False) -> None:
    """async_save=True returns as soon as the save is enqueued — the
    device→host fetch and disk write overlap the caller's read-only work
    (the loop's validation inference; TRAINING_DEMO.md measured the
    synchronous per-epoch save at minutes on the tunnel rig). CONTRACT: the
    caller must wait_for_pending_saves() before anything DONATES the saved
    state's buffers — the first train step of the next epoch does, and a
    donated-away array crashes the in-flight save ("Array has been
    deleted", observed on the real TPU). Rotation waits for any pending
    save first, and restore callers must wait_for_pending_saves().

    In a multi-process job (jax.process_count()>1) this is a COLLECTIVE:
    every process must call it with the same arguments (Orbax coordinates
    the sharded write — each process contributes the shards it addresses,
    so TP/DP-sharded state saves without any host holding the full state);
    rotation and the meta sidecar are process-0-only, fenced by barriers."""
    path = os.path.abspath(checkpoint_path or cfg.checkpoint_path)
    primary = jax.process_index() == 0
    if primary:
        os.makedirs(os.path.dirname(path), exist_ok=True)
    wait_for_pending_saves()  # the previous save must land before rotating
    _barrier("ckpt-pre-rotate")   # ...on EVERY process
    if primary:
        _rotate_backups(path)
        os.makedirs(path)
    _barrier("ckpt-post-rotate")  # nobody writes into path mid-rotation

    meta = {"epoch": epoch, "batch_step": batch_step,
            "config": cfg.to_dict()}
    if async_save:
        _get_async_ckptr().save(os.path.join(path, _STATE_SUBDIR), state)
        # meta is written by wait_for_pending_saves AFTER the state lands —
        # meta.json present must always imply state/ is complete
        if primary:
            _pending_meta.append((path, meta))
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(path, _STATE_SUBDIR), state)
        if primary:
            _write_meta(path, meta)
        _barrier("ckpt-saved")


def _resolve_complete_checkpoint(path: str) -> str:
    """Return a checkpoint dir that has meta.json — `path` itself, or the
    newest complete backup_<ts>/ sibling.

    A crash during an async save (whose meta write is deferred until the
    state lands — see wait_for_pending_saves) leaves `path` meta-less AFTER
    the previous good checkpoint was already rotated into backup_<ts>/;
    without this fallback, resume would crash on exactly the failure
    checkpointing exists to survive (ADVICE r2, medium)."""
    if os.path.exists(os.path.join(path, _META_FILE)):
        return path
    parent = os.path.dirname(path) or "."
    backups = sorted(
        (d for d in os.listdir(parent) if d.startswith("backup_")),
        key=lambda d: os.path.getmtime(os.path.join(parent, d)),
        reverse=True,
    ) if os.path.isdir(parent) else []
    base = os.path.basename(path)
    for b in backups:
        cand = os.path.join(parent, b, base)
        if os.path.exists(os.path.join(cand, _META_FILE)):
            print(f"Checkpoint at {path} is incomplete (no {_META_FILE}; "
                  f"likely a crash mid-async-save) — resuming from backup "
                  f"{cand}")
            return cand
    raise FileNotFoundError(
        f"No complete checkpoint: {path} lacks {_META_FILE} and no "
        f"backup_* sibling contains one")


def load_checkpoint(checkpoint_path: str, cfg: Config, steps_per_epoch: int,
                    shardings=None):
    """Returns (epoch, batch_step, TrainState)."""
    path = _resolve_complete_checkpoint(os.path.abspath(checkpoint_path))
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)

    # abstract template only — eval_shape avoids materializing ~2.7 GB of
    # random params + Adam moments on the chip just to throw them away
    template = jax.eval_shape(
        lambda: init_train_state(cfg, steps_per_epoch,
                                 rng=jax.random.PRNGKey(0))[0])
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    if shardings is not None:
        abstract = jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s)
            if hasattr(a, "shape") else a,
            abstract, shardings)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(path, _STATE_SUBDIR), abstract)
    return meta["epoch"], meta["batch_step"], TrainState(*state)


def save_final_model(params, cfg: Config, final_model_path: str | None = None,
                     *, async_save: bool = False) -> None:
    """Weights-only export in the reference's model.pth format
    (reference: model_utils.py:46-49). async_save=True runs the fetch +
    torch write in a background thread (params are immutable jax arrays, so
    the snapshot is consistent); join via wait_for_pending_saves().

    Without torch installed (pyproject's [interop] extra) the export is
    SKIPPED with a loud one-time warning instead of poisoning the run: the
    Orbax checkpoint already holds the full state, only the reference-format
    .pth interchange file is lost."""
    from neurosync_trainer_lite_tpu.utils.torch_interop import (
        save_torch_model, torch_available)

    if not torch_available():
        global _warned_no_torch
        if not _warned_no_torch:
            _warned_no_torch = True
            print("WARNING: torch is not installed — skipping the model.pth "
                  "export (the Orbax checkpoint is unaffected). Install the "
                  "[interop] extra for reference-format .pth files.")
        return
    path = final_model_path or cfg.model_path
    if async_save:
        # write-to-tmp + atomic replace, on a NON-daemon thread: an
        # interpreter exit mid-export then finishes the write instead of
        # killing it and leaving a truncated model.pth where the previous
        # epoch's good export used to be
        def _export():
            try:
                tmp = path + ".tmp"
                save_torch_model(params, cfg, tmp)
                os.replace(tmp, path)
            except BaseException as e:  # re-raised by wait_for_pending_saves
                _export_errors.append(e)

        t = threading.Thread(target=_export)
        t.start()
        _export_threads.append(t)
        return
    # same tmp + atomic-replace discipline as the async path: a crash or
    # ENOSPC mid-torch.save must not truncate the previous good export
    tmp = path + ".tmp"
    save_torch_model(params, cfg, tmp)
    os.replace(tmp, path)
    print(f"Final model saved to {path}")


def load_model(model_path: str, cfg: Config):
    """Load inference params from either a reference-format model.pth
    (reference: model_utils.py:29-44) or one of this framework's Orbax
    checkpoint directories (params only — optimizer state is dropped).

    Accepting the native checkpoint keeps `neurosync-infer`/`neurosync-serve`
    fully torch-free: .pth is the torch-interchange format, the Orbax dir is
    what training writes every epoch anyway."""
    if os.path.isdir(model_path):
        path = _resolve_complete_checkpoint(os.path.abspath(model_path))
        with open(os.path.join(path, _META_FILE)) as f:
            json.load(f)  # validates meta.json — state/ is complete
        abstract = jax.tree.map(
            ocp.utils.to_shape_dtype_struct,
            jax.eval_shape(lambda: init_train_state(cfg, 1,
                                                    rng=jax.random.PRNGKey(0)
                                                    )[0]))
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(os.path.join(path, _STATE_SUBDIR), abstract)
        return TrainState(*state).params

    from neurosync_trainer_lite_tpu.utils.torch_interop import (
        load_torch_model, torch_available)

    if not torch_available():
        raise RuntimeError(
            f"loading {model_path!r} requires torch (the .pth format is a "
            "torch state dict). Install the [interop] extra "
            "(pip install 'neurosync-trainer-lite-tpu[interop]') or pass a "
            "training checkpoint directory instead.")
    return load_torch_model(model_path, cfg)
