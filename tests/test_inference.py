"""Chunked inference parity vs a literal serial oracle of the reference loop.

The oracle below re-implements the reference's serial chunk/decode/blend
control flow (reference: utils/audio/processing/audio_processing.py:50-112)
around an arbitrary decode function; our batched implementation must produce
identical outputs for any input length.
"""

import numpy as np
import pytest

import jax

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.inference.chunked import (
    blend_chunks,
    pad_audio_chunk,
    process_audio_features,
)
from neurosync_trainer_lite_tpu.inference.api import smooth_by_averaging_pairs

CFG = Config(hidden_dim=32, n_layers=1, num_heads=2, input_dim=12,
             output_dim=61, dropout=0.0, use_amp=False, frame_size=16,
             overlap=4)

# a deterministic fake "model": per-frame linear map input_dim -> output_dim
_W = np.random.default_rng(0).standard_normal((CFG.input_dim, CFG.output_dim))


def fake_decode(chunk2d: np.ndarray) -> np.ndarray:
    # position-dependent so chunk boundaries matter
    pos = np.arange(chunk2d.shape[0])[:, None] / chunk2d.shape[0]
    return chunk2d @ _W + 0.1 * pos


def fake_decode_batched(params, chunks, cfg):
    return np.stack([fake_decode(c) for c in chunks]).astype(np.float64)


def serial_oracle(audio_features, cfg):
    """Literal re-implementation of the reference's serial loop semantics."""
    frame_length, overlap = cfg.frame_size, cfg.overlap
    num_features = audio_features.shape[1]
    num_frames = audio_features.shape[0]
    all_out = []
    start = 0
    while start < num_frames:
        end = min(start + frame_length, num_frames)
        chunk = pad_audio_chunk(audio_features[start:end], frame_length,
                                num_features)
        dec = fake_decode(chunk)[: end - start]
        if all_out:
            last = all_out.pop()
            all_out.append(blend_chunks(last, dec, overlap))
        else:
            all_out.append(dec)
        start += frame_length - overlap
    current = sum(len(c) for c in all_out)
    if current < num_frames:
        remaining = num_frames - current
        chunk = pad_audio_chunk(audio_features[num_frames - remaining:],
                                frame_length, num_features)
        all_out.append(fake_decode(chunk)[:remaining])
    final = np.concatenate(all_out, axis=0)[:num_frames]
    final[:, :61] /= 100
    return final


@pytest.mark.parametrize("num_frames", [5, 16, 17, 30, 48, 100, 128, 131])
def test_batched_matches_serial_oracle(num_frames):
    rng = np.random.default_rng(num_frames)
    feats = rng.standard_normal((num_frames, CFG.input_dim)).astype(np.float32)
    ours = process_audio_features(feats.copy(), None, CFG,
                                  decode_batched=fake_decode_batched)
    oracle = serial_oracle(feats.astype(np.float64), CFG)
    assert ours.shape == (num_frames, CFG.output_dim)
    np.testing.assert_allclose(ours, oracle, atol=1e-10)


def test_blend_chunks_semantics():
    a = np.ones((8, 2))
    b = np.zeros((8, 2))
    out = blend_chunks(a, b, 4)
    assert out.shape == (12, 2)
    np.testing.assert_allclose(out[4:8, 0], [1.0, 0.75, 0.5, 0.25])
    np.testing.assert_array_equal(out[8:], 0)


def test_pad_audio_chunk_reflect():
    x = np.arange(10, dtype=float).reshape(5, 2)
    out = pad_audio_chunk(x, 8, 2)
    assert out.shape == (8, 2)
    np.testing.assert_array_equal(out[:5], x)
    # np.pad reflect appends rows 3, 2, 1 (no edge repeat)
    np.testing.assert_array_equal(out[5:], x[[3, 2, 1]])


def test_smooth_by_averaging_pairs():
    x = np.array([[0.0], [2.0], [4.0]])
    np.testing.assert_array_equal(smooth_by_averaging_pairs(x),
                                  [[1.0], [3.0], [4.0]])


def test_real_model_end_to_end():
    """Full path with the actual model: shapes, determinism, ÷100 rescale."""
    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq
    from neurosync_trainer_lite_tpu.inference.chunked import (
        decode_chunks_batched,
    )

    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    feats = np.random.default_rng(1).standard_normal(
        (40, CFG.input_dim)).astype(np.float32)
    out1 = process_audio_features(feats.copy(), params, CFG)
    out2 = process_audio_features(feats.copy(), params, CFG)
    assert out1.shape == (40, 61)
    np.testing.assert_array_equal(out1, out2)
    # outputs rescaled: raw model outputs are O(0.1-1), /100 makes them small
    assert np.abs(out1).max() < 1.0


def test_mesh_decoder_matches_single_device():
    """Serving decode sharded over the virtual mesh (data-parallel chunks,
    Megatron-TP params) must equal the single-device batched decode, both
    standalone and through the full chunked serving path."""
    from neurosync_trainer_lite_tpu.config import tiny_config
    from neurosync_trainer_lite_tpu.inference.chunked import (
        MeshDecoder,
        decode_chunks_batched,
        process_audio_features,
    )
    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq
    from neurosync_trainer_lite_tpu.parallel.mesh import make_mesh

    cfg = tiny_config(frame_size=32, overlap=8)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    feats = rng.standard_normal((150, cfg.input_dim)).astype(np.float32)

    want = process_audio_features(feats, params, cfg)
    for dp, tp in ((8, 1), (4, 2)):
        mesh = make_mesh(cfg.replace(dp=dp, tp=tp))
        dec = MeshDecoder(params, cfg, mesh)
        # standalone: odd chunk count exercises the dp-multiple bucketing
        chunks = rng.standard_normal(
            (5, cfg.frame_size, cfg.input_dim)).astype(np.float32)
        np.testing.assert_allclose(
            dec(params, chunks, cfg),
            decode_chunks_batched(params, chunks, cfg), atol=1e-5, rtol=1e-4)
        # full serving path
        got = process_audio_features(feats, params, cfg, decode_batched=dec)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
