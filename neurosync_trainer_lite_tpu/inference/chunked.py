"""Chunked long-audio inference with overlap blending.

Semantics match the reference exactly (reference:
utils/audio/processing/audio_processing.py:50-112): 128-frame chunks at
stride (frame_size - overlap), reflect-padding of short chunks (:14-23),
linear cross-fade of the trailing `overlap` frames between consecutive chunks
(:33-48), a tail fix-up pass so the output frame count matches the input
(:86-93), and the ÷100 output rescale (:102).

TPU-first design: the reference decodes chunks one-by-one through the model
with a host↔device round trip per chunk (:62-83). Chunk decodes are
independent (the blend is a post-hoc host op), so here ALL chunks are stacked
into one batch and decoded in a single jitted forward — one device call per
clip instead of one per chunk. Batch sizes are bucketed to powers of two to
bound recompilation; extra rows are discarded. The serial blend then runs on
host in vectorized numpy, reproducing the reference's order-dependent
accumulation bit-for-bit (tested against a literal serial oracle).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.data.processing import BLENDSHAPE_SCALE
from neurosync_trainer_lite_tpu.models.seq2seq import seq2seq_apply


def pad_audio_chunk(audio_chunk: np.ndarray, frame_length: int,
                    num_features: int) -> np.ndarray:
    """Append reflect-padding to reach frame_length rows
    (reference: audio_processing.py:14-23)."""
    if audio_chunk.shape[0] < frame_length:
        pad_length = frame_length - audio_chunk.shape[0]
        padding = np.pad(audio_chunk, ((0, pad_length), (0, 0)), mode="reflect")
        audio_chunk = np.vstack((audio_chunk, padding[-pad_length:, :num_features]))
    return audio_chunk


def blend_chunks(chunk1: np.ndarray, chunk2: np.ndarray,
                 overlap: int) -> np.ndarray:
    """Linear cross-fade of the overlapping region
    (reference: audio_processing.py:33-48), vectorized."""
    actual_overlap = min(overlap, len(chunk1), len(chunk2))
    if actual_overlap == 0:
        return np.vstack((chunk1, chunk2))
    blended = np.copy(chunk1)
    alpha = (np.arange(actual_overlap) / actual_overlap)[:, None]
    blended[-actual_overlap:] = (
        (1 - alpha) * chunk1[-actual_overlap:] + alpha * chunk2[:actual_overlap])
    return np.vstack((blended, chunk2[actual_overlap:]))


def zero_columns(data: np.ndarray) -> np.ndarray:
    """Zero the known-noise Lite dims on a copy (reference:
    audio_processing.py:114-121, unused research helper — kept for surface
    parity)."""
    from neurosync_trainer_lite_tpu.data.processing import SPECIFIED_COLUMNS

    columns_to_zero = list(SPECIFIED_COLUMNS)  # one source of truth
    modified = np.copy(data)
    modified[:, columns_to_zero] = 0
    return modified


def add_specified_dimensions_back(modified_data: np.ndarray) -> np.ndarray:
    """Re-expand reduced outputs to the original 68 dims with zeros in the
    removed columns (reference: audio_processing.py:123-140, unused research
    helper; note its column list differs from zero_columns' — preserved
    as-is)."""
    original_dim = 68
    columns_to_remove = [0, 1, 2, 3, 4, 7, 8, 9, 10, 11,
                         51, 52, 53, 54, 55, 56, 57, 58, 59, 60]
    new_data = np.zeros((modified_data.shape[0], original_dim))
    remaining = [c for c in range(original_dim) if c not in columns_to_remove]
    new_data[:, remaining] = modified_data
    return new_data


@functools.lru_cache(maxsize=8)
def _decode_fn(cfg: Config):
    """Jitted batched encoder→decoder forward (dropout off)."""

    @jax.jit
    def decode(params, chunks):  # chunks: [N, frame_size, input_dim]
        return seq2seq_apply(params, chunks, cfg)

    return decode


def decode_chunks_batched(params, chunks: np.ndarray, cfg: Config) -> np.ndarray:
    """[N, frame_size, input_dim] → [N, frame_size, output_dim] in one device call."""
    from neurosync_trainer_lite_tpu.ops.frontend import pow2_bucket

    n = chunks.shape[0]
    bucket = pow2_bucket(n)
    if bucket != n:
        chunks = np.concatenate(
            [chunks, np.zeros((bucket - n, *chunks.shape[1:]), chunks.dtype)])
    out = _decode_fn(cfg)(params, jnp.asarray(chunks))
    # download the whole bucket, slice on host: slicing on device would
    # compile + dispatch a tiny per-(bucket, n) program per new clip length
    return np.asarray(out, dtype=np.float64)[:n]


class MeshDecoder:
    """Serving decode sharded over a device mesh — the inference-side
    counterpart of the training comm backend (parallel/mesh.py).

    Parameters are placed ONCE at construction: Megatron column/row rules on
    the 'model' axis (TP), replicated over 'data'; each decode call shards
    its chunk batch over 'data' and XLA inserts the TP collectives. Matches
    the `decode_batched(params, chunks, cfg)` signature so it drops into
    `process_audio_features` and the streamers:

        mesh = make_mesh(cfg)
        dec = MeshDecoder(params, cfg, mesh)
        frames = process_audio_features(feats, params, cfg, decode_batched=dec)

    The `params` argument of __call__ is ignored (the constructor's placed
    copy is used) — it exists for signature compatibility.
    """

    def __init__(self, params, cfg: Config, mesh):
        from neurosync_trainer_lite_tpu.parallel.mesh import (
            batch_sharding,
            shard_params,
        )

        self.cfg = cfg
        self.mesh = mesh
        self._params = shard_params(params, cfg, mesh)
        self._batch_sharding = batch_sharding(mesh)
        self._dp = mesh.shape["data"]
        self._decode = jax.jit(
            lambda p, chunks: seq2seq_apply(p, chunks, cfg))

    def __call__(self, params, chunks: np.ndarray, cfg=None) -> np.ndarray:
        from neurosync_trainer_lite_tpu.ops.frontend import pow2_bucket

        n = chunks.shape[0]
        # bucket to a power of two AND a multiple of the data-axis size so
        # every device holds equal rows
        bucket = pow2_bucket(max(n, self._dp))
        if bucket % self._dp:
            bucket = -(-bucket // self._dp) * self._dp
        if bucket != n:
            chunks = np.concatenate(
                [chunks,
                 np.zeros((bucket - n, *chunks.shape[1:]), chunks.dtype)])
        placed = jax.device_put(jnp.asarray(chunks, jnp.float32),
                                self._batch_sharding)
        out = self._decode(self._params, placed)
        return np.asarray(out, dtype=np.float64)[:n]  # host-side slice


def _chunk_starts(num_frames: int, frame_length: int, overlap: int):
    starts, start = [], 0
    while start < num_frames:
        starts.append(start)
        start += frame_length - overlap
    return starts


def chunk_plan(num_frames: int, frame_length: int, overlap: int):
    """(starts, per-chunk valid lengths, tail `remaining` frames or 0).

    Simulates the reference's accumulated length (each chunk after the first
    loses min(overlap, acc, chunk) frames to blending) to decide whether the
    tail fix-up pass decodes one extra chunk (reference: :86-93).
    """
    starts = _chunk_starts(num_frames, frame_length, overlap)
    lengths = [min(s + frame_length, num_frames) - s for s in starts]
    acc_len = lengths[0] if lengths else 0
    for L in lengths[1:]:
        acc_len += L - min(overlap, acc_len, L)
    remaining = max(0, num_frames - acc_len)
    return starts, lengths, remaining


def blend_decoded_chunks(decoded, lengths, remaining: int, overlap: int,
                         num_frames: int) -> np.ndarray:
    """Serial overlap blend of decoded chunks, exactly as the reference
    accumulates it (:62-96), plus the tail concat and ÷100 rescale (:102).
    decoded: [N(+1 if remaining), frame_length, output_dim]."""
    acc = decoded[0][: lengths[0]]
    for i in range(1, len(lengths)):
        acc = blend_chunks(acc, decoded[i][: lengths[i]], overlap)
    outputs = [acc]
    if remaining > 0:
        outputs.append(decoded[-1][:remaining])

    final = np.concatenate(outputs, axis=0)[:num_frames]
    final[:, :61] /= BLENDSHAPE_SCALE  # back to LiveLink space (reference: :102)
    return final


def process_audio_features(audio_features: np.ndarray, params, cfg: Config,
                           *, decode_batched=decode_chunks_batched) -> np.ndarray:
    """features [T, input_dim] → blendshapes [T, output_dim]
    (reference: audio_processing.py:50-112)."""
    frame_length = cfg.frame_size
    overlap = cfg.overlap
    num_features = audio_features.shape[1]
    num_frames = audio_features.shape[0]

    starts, lengths, remaining = chunk_plan(num_frames, frame_length, overlap)

    chunk_list = [
        pad_audio_chunk(audio_features[s: s + frame_length], frame_length,
                        num_features)
        for s in starts
    ]
    if remaining > 0:
        chunk_list.append(
            pad_audio_chunk(audio_features[num_frames - remaining: num_frames],
                            frame_length, num_features))

    decoded = decode_batched(
        params, np.asarray(chunk_list, dtype=np.float32), cfg)

    return blend_decoded_chunks(decoded, lengths, remaining, overlap,
                                num_frames)
