"""Typed training/inference configuration.

TPU-native re-design of the reference's plain config dict
(reference: config.py:26-55). Every reference key is preserved (including the
two implicit keys read via ``.get`` in the reference: ``use_amp``
(train.py:25) and ``overlap`` (utils/audio/processing/audio_processing.py:53)),
plus TPU-specific knobs (mesh shape, dtypes, seed) that have no reference
equivalent.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
from dataclasses import dataclass, field
from typing import Any


def _resolve_ffmpeg() -> str:
    """Locate an ffmpeg binary (reference: config.py:10-23).

    Unlike the reference we never raise at import time; media ingestion
    raises lazily if ffmpeg is actually needed and missing.
    """
    return shutil.which("ffmpeg") or "ffmpeg"


@dataclass(frozen=True)
class Config:
    # --- run mode -----------------------------------------------------------
    mode: str = "scratch"            # 'scratch' or 'resume'

    # --- audio / data geometry ---------------------------------------------
    sr: int = 88200                  # input sample rate
    frame_rate: int = 60             # output blendshape fps
    input_dim: int = 256             # 69 MFCC(+deltas) + 187 autocorr lags
    output_dim: int = 61             # ARKit blendshape count
    frame_size: int = 128            # inference chunk length (frames)
    micro_batch_size: int = 128      # training window length (frames) —
                                     # despite the name this is a sequence
                                     # length, not a grad-accum factor
                                     # (reference: dataset/dataset.py:66)
    overlap: int = 16                # inference chunk overlap (frames)

    # --- model --------------------------------------------------------------
    hidden_dim: int = 1024
    n_layers: int = 8
    num_heads: int = 16
    dropout: float = 0.3

    # --- optimization --------------------------------------------------------
    batch_size: int = 128
    learning_rate: float = 5e-5
    weight_decay: float = 1e-5
    n_epochs: int = 50
    warmup_epochs: int = 0
    grad_clip: float = 2.0           # global-norm clip (reference: train.py:44)
    delta: float = 1.0               # SmoothL1 beta
    w1: float = 1.0                  # reconstruction loss weight
    w2: float = 1.0                  # temporal consistency loss weight
    w3: float = 1.0                  # direction-cosine loss weight
    # NOTE (reference quirk, preserved): the reference's
    # prepare_training_components (model_utils.py:10) never forwards w3 to the
    # Loss, so the Loss default of 1.0 always applies regardless of config.
    zero_penalty_weight: float = 0.0  # >0 enables the zero-dim penalty loss
                                      # variant (reference: model.py:296-346,
                                      # commented-out research code)
    loss_variant: str = "standard"   # 'standard' (reference's active Loss) |
                                     # 'smoothness' (the Huber + L2/2nd-order
                                     # smoothness + cosine research variant,
                                     # reference model.py:377-485)
    w4: float = 1.0                  # 2nd-order smoothness weight (variant)
    smoothness_annealing: bool = False  # cosine-anneal the smoothness weights
    validation_interval: int = 20    # validate every N train steps
    val_split: float = 0.1
    max_steps_per_epoch: int = 0     # >0: cap each epoch at N optimizer steps
                                     # (bounded probe/smoke runs on very large
                                     # datasets — checkpoints/validation still
                                     # run at the epoch boundary; the LR
                                     # schedule keeps the full-epoch length)
    grad_accum_steps: int = 1        # >1: split each batch into N sequential
                                     # micro-batches inside the compiled step
                                     # (fp32 grad accumulation, one optimizer
                                     # update) — larger effective batches than
                                     # HBM allows. batch_size must be
                                     # divisible by N (and by N*dp when data-
                                     # parallel). NOTE: the reference's
                                     # 'micro_batch_size' is a window length,
                                     # not an accumulation factor
                                     # (SURVEY.md §2.3); this is the real thing.

    # --- mixed precision ------------------------------------------------------
    # The reference uses fp16 AMP + GradScaler ('use_amp', train.py:25-26).
    # On TPU, bf16 has fp32 exponent range so no loss scaling is needed.
    use_amp: bool = True             # True → bf16 compute, fp32 params/optimizer

    # --- parallelism ----------------------------------------------------------
    # The reference supports ≤4 replicated GPUs in one process
    # (use_multi_gpu/num_gpus, training_utils.py:131). Here parallelism is a
    # device mesh: data-parallel axis 'data', tensor-parallel axis 'model'.
    use_multi_gpu: bool = False      # kept for config-dict compat; ignored
    num_gpus: int = 1                # kept for config-dict compat; ignored
    dp: int = -1                     # data-parallel size; -1 → all devices
    tp: int = 1                      # tensor-parallel size

    # --- paths ----------------------------------------------------------------
    ffmpeg_path: str = field(default_factory=_resolve_ffmpeg)
    root_dir: str = "dataset/data"
    model_path: str = "out/model.pth"
    audio_path: str = "dataset/test_set/audio.wav"
    ground_truth_path: str = "dataset/test_set/testset.csv"
    checkpoint_path: str = "out/checkpoints/checkpoint"
    plots_dir: str = "dataset/validation_plots"

    # --- TPU-specific ----------------------------------------------------------
    seed: int = 0
    prng_impl: str = "rbg"           # dropout-key PRNG: 'rbg' uses the TPU
                                     # hardware RNG (measured: dropout-0.3
                                     # training 226→356 samples/s vs
                                     # threefry); 'threefry' for bitwise
                                     # cross-platform reproducibility
    remat: bool = False              # jax.checkpoint the encoder/decoder layers
    auto_remat: bool = True          # train_model may turn remat on by itself
                                     # when the activation estimate exceeds
                                     # device HBM (prints a notice); set False
                                     # to force the configured remat setting
    remat_policy: str = "full"       # 'full' | 'dots' — 'dots' saves MXU
                                     # results and recomputes only elementwise
                                     # work (cheaper bwd than full remat)
    remat_scope: str = "all"         # 'all' | 'decoder' | 'encoder' —
                                     # selective remat: recompute only one
                                     # half, keep the other's activations
                                     # resident (decoder layers are ~2x the
                                     # encoder's, so 'decoder' frees most of
                                     # the memory for ~60% of the recompute)
    remat_layers: int = -1           # within remat_scope, remat only the
                                     # FIRST K layers of the stack (-1 = all):
                                     # each non-rematted layer keeps its
                                     # activations resident (~1 GB at the
                                     # 228M batch-128 geometry) and skips its
                                     # recompute in the backward pass — dial
                                     # to the chip's spare HBM
    unroll_residents: bool = True    # Python-unroll the NON-rematerialized
                                     # (resident) layers in training instead
                                     # of lax.scan-ning them: scan stacks
                                     # every resident layer's backward
                                     # residuals into [L, ...] carry buffers
                                     # via dynamic-update-slice — the device
                                     # trace attributes ~52 ms/step of the
                                     # flagship step to those DUS fusions.
                                     # Unrolled residents keep residuals as
                                     # independent values XLA fuses into
                                     # their producers (measured 529.5→574.0
                                     # samples/s at dropout 0.3). Remat'd
                                     # layers keep lax.scan (their residuals
                                     # are recomputed, never stacked), as do
                                     # all inference paths (compact serving
                                     # programs / compile times).
    attention_impl: str = "auto"     # 'auto' | 'xla' | 'pallas'
    async_checkpoint: bool = True    # overlap the per-epoch checkpoint +
                                     # model.pth export (device→host fetch +
                                     # disk write) with the epoch's
                                     # validation inference; the loop waits
                                     # for pending saves before the next
                                     # epoch trains (its first step donates
                                     # the saved buffers) and at exit

    # ---------------------------------------------------------------------------
    @property
    def head_dim(self) -> int:
        assert self.hidden_dim % self.num_heads == 0
        return self.hidden_dim // self.num_heads

    @property
    def ffn_dim(self) -> int:
        return 4 * self.hidden_dim

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        """Build from a reference-style training_config dict; unknown keys ignored."""
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def tiny_config(**kw) -> Config:
    """BASELINE config #1: 4-layer/4-head, fp32, CPU-runnable."""
    base = dict(
        hidden_dim=128, n_layers=4, num_heads=4, dropout=0.0,
        batch_size=8, use_amp=False, n_epochs=2,
    )
    base.update(kw)
    return Config(**base)


def full_config(**kw) -> Config:
    """BASELINE config #2: the 228M-class 8-layer/16-head model, bf16."""
    return Config(**kw)
