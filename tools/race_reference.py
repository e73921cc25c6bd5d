"""Head-to-head race: this repo's composed training loop vs the ACTUAL
reference trainer (/root/reference), same dataset, same init, same split,
same schedule — CPU, fp32, dropout 0.

Round-2 verdict gap #1: forward/loss/optimizer/chunked-inference parity are
each pinned piecewise against reference-executed fixtures, but the COMPOSED
training loops (data pipeline -> windowing -> split -> step -> scheduler ->
final model) had never been raced end to end. This script closes that loop.
Nothing from /root/reference is copied; its modules are imported and
executed at race time only.

Method — every choice below eliminates a NON-SEMANTIC divergence source:
- dataset: the committed capture folder. Its audio_features.csv cache means
  the reference's librosa extraction path is never CALLED
  (reference: dataset/data_processing.py:112-120); librosa itself is stubbed
  at import time since it is not installed here.
- window parity is asserted elementwise: the reference's materialized
  AudioFacialDataset examples (dataset/dataset.py:58-98) against our lazy
  WindowedDataset, index by index.
- the torch random_split indices drive BOTH sides
  (train_model(split_indices=...)) — split selection is an RNG artifact,
  not semantics.
- identical init: the reference model's post-init_weights state_dict
  (training_utils.py:336-341) is exported and warm-starts our trainer
  (train_model(init_params=...)).
- one batch per epoch (batch_size == train-window count): batch ORDER is a
  shuffle-RNG artifact neither framework can replicate of the other; with a
  single full batch the gradient is permutation-invariant, so the race
  compares semantics, not RNG streams.
- dropout 0 (cross-framework dropout RNG is incomparable), use_amp off,
  fp32 both sides, the same epoch-stepped LambdaLR schedule.
- the reference's per-epoch validation artifact call (librosa-needing,
  checkpoint_utils.py:57) is no-opped; checkpoints/plots still write.

Outputs:
  tests/fixtures/race/race_results.json — both loss trajectories, final val
      losses, golden-pair inference MSEs, and the relative gaps (committed;
      tests/test_race_fixture.py asserts the agreement bounds hold without
      needing /root/reference at test time)
  docs/PARITY.md gets the summary numbers (manually, from this output)

Usage:  python tools/race_reference.py [--epochs 20] [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.path.join(REPO, "dataset", "data")
TEST_WAV = os.path.join(REPO, "dataset", "test_set", "audio.wav")
TEST_CSV = os.path.join(REPO, "dataset", "test_set", "testset.csv")
OUT_FIXTURE = os.path.join(REPO, "tests", "fixtures", "race",
                           "race_results.json")

SEED = 1234
# tiny-but-structural: >1 layer, >1 head, even head_dim, real feature dims
GEOM = dict(hidden_dim=64, n_layers=2, num_heads=4, dropout=0.0,
            input_dim=256, output_dim=61)
WINDOW = 32        # micro_batch_size (window length) for a CPU-sized race
FRAME_SIZE = 32    # chunked-inference chunk length for the golden comparison
OVERLAP = 16       # reference default via config.get('overlap', 16)


def _stub_librosa():
    """The reference imports librosa at module top; its cache-hit training
    path never calls it. Any actual call raises loudly."""
    mod = types.ModuleType("librosa")

    def _missing(name):
        if name.startswith("__"):  # introspection (inspect/getmodule) must
            raise AttributeError(name)  # see a normal module, not a stub fn
        def f(*a, **k):
            raise RuntimeError(
                f"librosa.{name} was CALLED — the race must stay on the "
                f"audio_features.csv cache-hit path")
        return f

    mod.__getattr__ = _missing
    sys.modules["librosa"] = mod


def run_reference(workdir: str, n_epochs: int, batch_size: int,
                  reference: str, lr: float):
    """Execute the reference trainer; returns a dict of results."""
    os.makedirs(workdir, exist_ok=True)
    os.makedirs(os.path.join(workdir, "out", "checkpoints"), exist_ok=True)
    old_cwd = os.getcwd()
    os.chdir(workdir)  # the reference writes plots/out relative to cwd
    sys.path.insert(0, reference)
    try:
        import torch

        _stub_librosa()
        from config import training_config as ref_cfg
        import utils.checkpoint_utils as ref_ckpt
        import utils.training_utils as ref_tu
        from utils.model_utils import build_model, prepare_training_components
        from dataset.dataset import prepare_dataloader_with_split
        import train as ref_train

        ref_cfg.update(GEOM)
        ref_cfg.update({
            "mode": "scratch", "use_amp": False, "use_multi_gpu": False,
            "num_gpus": 1, "n_epochs": n_epochs, "warmup_epochs": 0,
            "learning_rate": lr,
            "batch_size": batch_size, "micro_batch_size": WINDOW,
            "frame_size": FRAME_SIZE,
            "root_dir": DATA_DIR,
            "model_path": os.path.join(workdir, "out", "model.pth"),
            "checkpoint_path": os.path.join(workdir, "out", "checkpoints",
                                            "checkpoint.pth"),
            "audio_path": TEST_WAV, "ground_truth_path": TEST_CSV,
        })

        # the per-epoch validation artifact needs librosa; no-op it (the
        # golden-pair comparison happens in main() on the final models)
        ref_ckpt.generate_and_save_facial_data = lambda *a, **k: None

        torch.manual_seed(SEED)
        train_ds, val_ds, train_dl, val_dl = prepare_dataloader_with_split(
            ref_cfg, val_split=0.1)

        device = torch.device("cpu")
        model = build_model(ref_cfg, device)
        model.apply(ref_tu.init_weights)
        init_sd = {k: v.clone() for k, v in model.state_dict().items()}
        torch.save(init_sd, os.path.join(workdir, "race_init.pth"))

        criterion, optimizer, scheduler = prepare_training_components(
            ref_cfg, model)

        rec = {"train": [], "val": []}
        orig_forward = criterion.forward

        def recording_forward(pred, targ, current_step=None, total_steps=None):
            loss = orig_forward(pred, targ, current_step=current_step,
                                total_steps=total_steps)
            key = "train" if current_step is not None else "val"
            rec[key].append(float(loss.detach()))
            return loss

        criterion.forward = recording_forward

        ref_train.train_model(
            ref_cfg, model, None, None, None, train_dl, val_dl, criterion,
            optimizer, scheduler, [device, None, None, None],
            use_multi_gpu=False)

        return dict(
            model=model, criterion=criterion,
            # copies: main() makes one more criterion call (the clean final
            # val loss), which must not leak into the recorded trajectory
            train_losses=list(rec["train"]), val_losses=list(rec["val"]),
            train_idx=np.asarray(train_ds.indices, dtype=np.int64),
            val_idx=np.asarray(val_ds.indices, dtype=np.int64),
            examples=train_ds.dataset.examples,
            init_pth=os.path.join(workdir, "race_init.pth"),
            torch=torch,
        )
    finally:
        os.chdir(old_cwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="both sides; higher than the reference's 5e-5 "
                         "because the race is full-batch (one batch/epoch) "
                         "— visible loss movement makes trajectory "
                         "agreement meaningful")
    ap.add_argument("--workdir", default="/tmp/race_ws")
    args = ap.parse_args()

    os.environ.setdefault("MPLBACKEND", "Agg")
    sys.path.insert(0, REPO)

    import jax
    jax.config.update("jax_platforms", "cpu")  # fp32 CPU race; must run
    #                                            before backend init (the
    #                                            axon plugin ignores env vars)

    from neurosync_trainer_lite_tpu.config import Config
    from neurosync_trainer_lite_tpu.data.processing import load_data
    from neurosync_trainer_lite_tpu.data.windowing import WindowedDataset

    # ---- our window table first (determines the one-batch batch_size) ----
    clips = load_data(DATA_DIR, 88200)
    ours_ds = WindowedDataset(clips, window=WINDOW)
    n = len(ours_ds)
    n_val = int(n * 0.1)
    batch_size = n - n_val
    print(f"race: {n} windows, train {batch_size}, val {n_val}, "
          f"{args.epochs} epochs (1 full batch each)")

    # ---------------- reference run ----------------
    ref = run_reference(os.path.join(args.workdir, "ref"), args.epochs,
                        batch_size, args.reference, args.lr)
    torch = ref["torch"]

    # ---- window parity: reference examples vs our table, elementwise ----
    assert len(ref["examples"]) == n, (len(ref["examples"]), n)
    win_err = 0.0
    for i in range(n):
        ra, rf = ref["examples"][i]
        oa, of = ours_ds[i]
        win_err = max(win_err,
                      float(np.max(np.abs(ra.numpy() - oa))),
                      float(np.max(np.abs(rf.numpy() - of))))
    print(f"window parity: {n} windows, max abs err {win_err:.2e}")

    # ---------------- our run ----------------
    ours_dir = os.path.join(args.workdir, "ours")
    os.makedirs(ours_dir, exist_ok=True)
    cfg = Config(
        **GEOM, micro_batch_size=WINDOW, frame_size=FRAME_SIZE,
        overlap=OVERLAP, batch_size=batch_size, n_epochs=args.epochs,
        learning_rate=args.lr,
        use_amp=False, seed=SEED, prng_impl="threefry2x32", auto_remat=False,
        root_dir=DATA_DIR,
        model_path=os.path.join(ours_dir, "model.pth"),
        checkpoint_path=os.path.join(ours_dir, "checkpoints", "checkpoint"),
        plots_dir=os.path.join(ours_dir, "plots"),
        # per-epoch golden artifacts are no-opped on the reference side
        # (librosa); skip ours too so both loops do the same per-epoch work
        audio_path=os.path.join(ours_dir, "missing.wav"),
        ground_truth_path=os.path.join(ours_dir, "missing.csv"))

    from neurosync_trainer_lite_tpu.training.loop import train_model
    from neurosync_trainer_lite_tpu.utils.torch_interop import (
        load_torch_model)

    init_params = load_torch_model(ref["init_pth"], cfg)
    history: dict = {}
    state, _ = train_model(cfg, clips, init_params=init_params,
                           split_indices=(ref["train_idx"], ref["val_idx"]),
                           history_out=history, verbose=False)

    # ---- remat+unroll leg (VERDICT r3 missing #2b) ----
    # The production step turns on decoder-scope partial remat with
    # Python-unrolled resident layers (CLAUDE.md / training/loop.py
    # _maybe_auto_remat picks remat_layers=2 on the 16GB v5e). Those are
    # pure memory/time levers — same math, different schedule — so this leg
    # must reproduce leg 1's trajectory to fp-noise. Run the SAME composed
    # loop with the production remat flags and record the gap.
    remat_dir = os.path.join(args.workdir, "ours_remat")
    cfg_remat = cfg.replace(
        remat=True, remat_scope="decoder", remat_layers=2,
        unroll_residents=True,
        model_path=os.path.join(remat_dir, "model.pth"),
        checkpoint_path=os.path.join(remat_dir, "checkpoints", "checkpoint"),
        plots_dir=os.path.join(remat_dir, "plots"),
        audio_path=os.path.join(remat_dir, "missing.wav"),
        ground_truth_path=os.path.join(remat_dir, "missing.csv"))
    history_remat: dict = {}
    # fresh init copy: leg 1's donated train step consumed the first one
    state_remat, _ = train_model(
        cfg_remat, clips, init_params=load_torch_model(ref["init_pth"], cfg),
        split_indices=(ref["train_idx"], ref["val_idx"]),
        history_out=history_remat, verbose=False)
    rl = np.asarray(history_remat["train_losses"])
    base = np.asarray(history["train_losses"])
    remat_rel = np.abs(rl - base) / np.abs(base)
    remat_param_mse = float(
        np.mean(np.concatenate([
            np.ravel(np.asarray(a, np.float64) - np.asarray(b, np.float64))
            for a, b in zip(jax.tree.leaves(state.params),
                            jax.tree.leaves(state_remat.params))]) ** 2))
    print(f"remat+unroll leg: max train-loss rel gap vs plain leg "
          f"{remat_rel.max():.2e}, final param MSE {remat_param_mse:.3e}")

    # ---------------- trajectory comparison ----------------
    rt = np.asarray(ref["train_losses"])
    ot = np.asarray(history["train_losses"])
    assert rt.shape == ot.shape, (rt.shape, ot.shape)
    rel = np.abs(ot - rt) / np.abs(rt)
    print("step |  reference |       ours |   rel gap")
    for i in range(len(rt)):
        print(f"{i:4d} | {rt[i]:10.6f} | {ot[i]:10.6f} | {rel[i]:.2e}")

    # ---------------- clean final val loss (unpadded, both sides) ----------
    from neurosync_trainer_lite_tpu.training.step import make_eval_step

    vsrc, vtrg = ours_ds.gather(ref["val_idx"])
    our_val = float(make_eval_step(cfg)(state.params, vsrc, vtrg))
    with torch.no_grad():
        ref["model"].eval()
        ref_val = float(ref["criterion"](
            ref["model"](torch.from_numpy(vsrc)), torch.from_numpy(vtrg)))
    val_rel = abs(our_val - ref_val) / abs(ref_val)
    print(f"final val loss: reference {ref_val:.6f}, ours {our_val:.6f}, "
          f"rel gap {val_rel:.2e}")

    # ---------------- golden-pair inference on the final models ------------
    from neurosync_trainer_lite_tpu.data.processing import (
        extract_audio_features)
    from neurosync_trainer_lite_tpu.inference.chunked import (
        process_audio_features)
    import importlib

    feats, _ = extract_audio_features(TEST_WAV, sr=88200, use_device=False)
    feats = np.asarray(feats, dtype=np.float32)
    ours_out = np.asarray(
        process_audio_features(feats, state.params, cfg), dtype=np.float64)
    ref_audio = importlib.import_module(
        "utils.audio.processing.audio_processing")
    ref_out = np.asarray(ref_audio.process_audio_features(
        feats.copy(), ref["model"], torch.device("cpu"),
        {"frame_size": FRAME_SIZE, "overlap": OVERLAP}), dtype=np.float64)

    import pandas as pd
    gt = pd.read_csv(TEST_CSV).drop(
        columns=["Timecode", "BlendshapeCount"]).values[:, :61]
    L = min(len(gt), len(ours_out), len(ref_out))
    mse_models = float(np.mean((ours_out[:L] - ref_out[:L]) ** 2))
    mse_ours_gt = float(np.mean((ours_out[:L] - gt[:L]) ** 2))
    mse_ref_gt = float(np.mean((ref_out[:L] - gt[:L]) ** 2))
    print(f"golden pair ({L} frames): model-vs-model MSE {mse_models:.3e}; "
          f"vs ground truth: ours {mse_ours_gt:.6f}, "
          f"reference {mse_ref_gt:.6f}")

    results = dict(
        seed=SEED, geometry=GEOM, learning_rate=args.lr,
        window=WINDOW, frame_size=FRAME_SIZE,
        overlap=OVERLAP, n_windows=n, n_train=batch_size, n_val=n_val,
        n_epochs=args.epochs,
        window_parity_max_abs_err=win_err,
        reference_train_losses=rt.tolist(),
        our_train_losses=ot.tolist(),
        train_rel_gaps=rel.tolist(),
        max_train_rel_gap=float(rel.max()),
        reference_val_losses=list(ref["val_losses"]),
        our_val_losses=[float(x) for x in history["val_losses"]],
        val_note=("interleaved val batches differ by design: the reference "
                  "evaluates the raw val set, ours pads the batch to "
                  "batch_size by cycling (static shapes for jit); the "
                  "final_val_* fields below are both computed UNPADDED on "
                  "the identical val windows"),
        final_val_loss_reference=ref_val,
        final_val_loss_ours=our_val,
        final_val_rel_gap=val_rel,
        remat_leg=dict(
            remat=True, remat_scope="decoder", remat_layers=2,
            unroll_residents=True,
            train_losses=rl.tolist(),
            max_train_rel_gap_vs_plain=float(remat_rel.max()),
            final_param_mse_vs_plain=remat_param_mse),
        golden_frames=L,
        golden_mse_model_vs_model=mse_models,
        golden_mse_ours_vs_gt=mse_ours_gt,
        golden_mse_reference_vs_gt=mse_ref_gt,
        torch_version=torch.__version__,
        jax_version=jax.__version__,
    )
    os.makedirs(os.path.dirname(OUT_FIXTURE), exist_ok=True)
    with open(OUT_FIXTURE, "w") as f:
        json.dump(results, f, indent=1)
    print(f"results written to {OUT_FIXTURE}")


if __name__ == "__main__":
    main()
