"""Streaming inference: incremental pushes match the offline chunked path."""

import numpy as np
import pytest

from neurosync_trainer_lite_tpu.config import tiny_config
from neurosync_trainer_lite_tpu.inference.chunked import process_audio_features
from neurosync_trainer_lite_tpu.inference.streaming import BlendshapeStreamer
from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq

import jax


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(frame_size=32, overlap=8, input_dim=16, output_dim=61)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _feature_oracle(cfg):
    """Deterministic fake frontend: 60 fps features derived from samples."""
    def extract(y):
        n = len(y) // (cfg.sr // 60)
        if n == 0:
            return None
        t = np.arange(n, dtype=np.float32)[:, None]
        f = np.arange(cfg.input_dim, dtype=np.float32)[None, :]
        return np.sin(0.01 * t * (1 + f)).astype(np.float32)
    return extract


def test_streaming_matches_offline_core(setup):
    cfg, params = setup
    extract = _feature_oracle(cfg)
    samples_per_frame = cfg.sr // 60
    total = 100 * samples_per_frame
    audio = np.random.default_rng(0).standard_normal(total).astype(np.float32)

    offline = process_audio_features(extract(audio), params, cfg)

    streamer = BlendshapeStreamer(params, cfg, extract_features=extract)
    for i in range(0, total, 7 * samples_per_frame):
        streamer.push_audio(audio[i: i + 7 * samples_per_frame])
    streamer.flush()
    streamed = streamer.pop_frames()

    assert streamed.shape == offline.shape
    # all frames before the final chunk's blend window must agree exactly
    # (same chunk boundaries, same model, same blend math)
    core = len(offline) - cfg.frame_size
    np.testing.assert_allclose(streamed[:core], offline[:core],
                               atol=1e-5, rtol=1e-4)


def test_streaming_tail_divergence_quantified(setup):
    """The one semantic divergence from the offline path, bounded numerically.

    Offline, the tail fix-up chunk is CONCATENATED after the blend loop
    (reference audio_processing.py:86-93); the streamer CROSS-FADES its final
    chunk into the pending overlap instead. Both outputs are combinations of
    the same decoded chunks, so they agree exactly outside the final
    frame_size frames; inside, the streamed value is a convex combination of
    the previous chunk's decode and the new one, while offline takes the new
    decode alone. This test pins the divergence: zero on the core, and on the
    tail bounded by the inter-chunk decode disagreement scale (measured
    ~2e-3 of full blendshape range for a random-init model; asserted with
    margin).
    """
    cfg, params = setup
    extract = _feature_oracle(cfg)
    samples_per_frame = cfg.sr // 60
    # 100 frames with frame_size=32/overlap=8 → several chunks + a tail
    total = 100 * samples_per_frame
    audio = np.random.default_rng(3).standard_normal(total).astype(np.float32)

    offline = process_audio_features(extract(audio), params, cfg)
    streamer = BlendshapeStreamer(params, cfg, extract_features=extract)
    streamer.push_audio(audio)
    streamer.flush()
    streamed = streamer.pop_frames()

    assert streamed.shape == offline.shape
    core = len(offline) - cfg.frame_size
    np.testing.assert_allclose(streamed[:core], offline[:core],
                               atol=1e-6, rtol=1e-5)
    tail_div = np.max(np.abs(streamed[core:] - offline[core:]))
    # outputs live in LiveLink [0,1] space; the divergence is a fraction of
    # the inter-chunk decode disagreement, far below perceptual thresholds
    assert tail_div < 0.02, f"tail divergence {tail_div} exceeds bound"


def test_incremental_finality(setup):
    cfg, params = setup
    extract = _feature_oracle(cfg)
    spf = cfg.sr // 60
    audio = np.random.default_rng(1).standard_normal(200 * spf).astype(np.float32)

    streamer = BlendshapeStreamer(params, cfg, extract_features=extract)
    seen = []
    for i in range(0, len(audio), 25 * spf):
        got = streamer.push_audio(audio[i: i + 25 * spf])
        if got:
            seen.append(streamer.pop_frames())
    streamer.flush()
    seen.append(streamer.pop_frames())
    combined = np.concatenate(seen, axis=0)

    # one-shot stream of the same audio produces identical finalized frames
    ref = BlendshapeStreamer(params, cfg, extract_features=extract)
    ref.push_audio(audio)
    ref.flush()
    ref_frames = ref.pop_frames()
    assert combined.shape == ref_frames.shape
    np.testing.assert_allclose(combined, ref_frames, atol=1e-5, rtol=1e-4)


def test_empty_and_short_streams(setup):
    cfg, params = setup
    extract = _feature_oracle(cfg)
    s = BlendshapeStreamer(params, cfg, extract_features=extract)
    assert s.push_audio(np.zeros(10, np.float32)) == 0
    s.flush()
    assert s.pop_frames().shape[0] == 0

    # shorter than one chunk: flush still emits every frame
    spf = cfg.sr // 60
    s2 = BlendshapeStreamer(params, cfg, extract_features=extract)
    s2.push_audio(np.random.default_rng(2).standard_normal(10 * spf).astype(np.float32))
    s2.flush()
    assert s2.pop_frames().shape == (10, cfg.output_dim)


def test_extraction_lengths_converge_for_live_sessions(setup):
    """The device frontend jit-compiles per input length; a live session must
    not present an ever-growing set of lengths (each fresh length = a full
    XLA compile on real TPUs). With prefix quantization + buffer trimming,
    the set of lengths the extractor sees converges to a small steady state.
    """
    cfg, params = setup
    spf = cfg.sr // 60
    lengths_seen = []
    base_extract = _feature_oracle(cfg)

    def recording_extract(y):
        lengths_seen.append(len(y))
        return base_extract(y)

    s = BlendshapeStreamer(params, cfg, extract_features=recording_extract)
    s._can_trim = True
    s._frame_samples = spf
    s.TRIM_THRESHOLD_FRAMES = 64
    s.TRIM_MARGIN_FRAMES = 16
    # custom extractors opt into prefix quantization (the default bucketed
    # frontend no longer needs it — its compile cache is bounded by buckets)
    s.FEATURE_QUANT_FRAMES = 32
    audio = np.random.default_rng(5).standard_normal(2000 * spf).astype(np.float32)
    for i in range(0, len(audio), 9 * spf):
        s.push_audio(audio[i: i + 9 * spf])
    distinct = sorted(set(lengths_seen))
    # every length is a multiple of the quantization grid...
    quant = s.FEATURE_QUANT_FRAMES * spf
    assert all(n % quant == 0 for n in distinct)
    # ...and the steady-state set is small and REPEATS (compile-cache hits)
    assert len(distinct) <= 8, distinct
    tail = lengths_seen[len(lengths_seen) // 2:]
    assert len(set(tail)) <= 4, sorted(set(tail))


def test_trimming_bounds_buffer_and_preserves_output(setup):
    cfg, params = setup
    extract = _feature_oracle(cfg)
    spf = cfg.sr // 60

    def run(threshold):
        s = BlendshapeStreamer(params, cfg, extract_features=extract)
        # the oracle bypasses the real frontend, so opt trimming back in and
        # make the oracle position-independent over trims by deriving
        # features from absolute sample count fed so far
        s._can_trim = True
        s.TRIM_THRESHOLD_FRAMES = threshold
        s.TRIM_MARGIN_FRAMES = 16
        s._frame_samples = spf
        base = {"n": 0}

        def extract_abs(y):
            n = len(y) // spf
            if n == 0:
                return None
            # y may be a quantized PREFIX of the buffer; its absolute start
            # is the buffer's start (total fed minus what's still buffered)
            start = base["n"] - len(s._audio)
            t = (np.arange(n, dtype=np.float32) + start / spf)[:, None]
            f = np.arange(cfg.input_dim, dtype=np.float32)[None, :]
            return np.sin(0.01 * t * (1 + f)).astype(np.float32)

        s._extract = lambda y: extract_abs(y)
        audio = np.zeros(400 * spf, np.float32)
        out = []
        for i in range(0, len(audio), 20 * spf):
            chunk = audio[i: i + 20 * spf]
            base["n"] += len(chunk)
            s.push_audio(chunk)
            out.append(s.pop_frames())
        s.flush()
        out.append(s.pop_frames())
        return np.concatenate(out), len(s._audio)

    frames_trim, buf_trim = run(threshold=64)
    frames_none, buf_none = run(threshold=10**9)
    assert frames_trim.shape == frames_none.shape
    np.testing.assert_allclose(frames_trim, frames_none, atol=1e-5)
    assert buf_trim < buf_none, (buf_trim, buf_none)


def test_default_extractor_matches_offline_and_bounds_compiles():
    """The streamer's default frontend is the bucketed traced-length
    extractor: every pushed sample is visible immediately (no quantization
    latency), outputs match the offline path on the core, and the compile
    cache stays bounded across growing buffer lengths."""
    from neurosync_trainer_lite_tpu.data.processing import (
        extract_audio_features)
    from neurosync_trainer_lite_tpu.ops import frontend as fe

    cfg = tiny_config(hidden_dim=32, n_layers=1, num_heads=2)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    sr = cfg.sr
    audio = (np.random.default_rng(5).standard_normal(sr * 6) * 0.4
             ).astype(np.float32)

    feats, _ = extract_audio_features(audio, sr)
    offline = process_audio_features(np.asarray(feats), params, cfg)

    before = fe._extract_valid_jit._cache_size()
    streamer = BlendshapeStreamer(params, cfg)
    step = sr // 3  # uneven pushes: many distinct buffer lengths
    for i in range(0, len(audio), step):
        streamer.push_audio(audio[i: i + step])
    streamer.flush()
    streamed = streamer.pop_frames()
    # ~18 distinct buffer lengths, but compiles grow with log2 of the buffer:
    # a 6 s session spans the 2^17..2^20 sample buckets → ≤4 cache entries
    assert fe._extract_valid_jit._cache_size() <= before + 4

    assert streamed.shape == offline.shape
    core = len(offline) - cfg.frame_size
    # core equality up to the documented CMVN drift (features re-extracted
    # over a shifted, bounded buffer)
    np.testing.assert_allclose(streamed[:core], offline[:core],
                               atol=5e-4, rtol=5e-3)


def test_warmup_precompiles_all_session_buckets():
    """warmup() must walk every frontend bucket a trim-bounded session can
    reach plus the decode program, so a live session never compiles
    mid-stream: after warmup, pushes across growing buffer lengths add ZERO
    new frontend cache entries."""
    from neurosync_trainer_lite_tpu.ops import frontend as fe

    cfg = tiny_config(hidden_dim=32, n_layers=1, num_heads=2)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    streamer = BlendshapeStreamer(params, cfg)
    n_warmed = streamer.warmup(max_buffer_seconds=6.0)
    assert n_warmed >= 1

    after_warm = fe._extract_valid_jit._cache_size()
    audio = (np.random.default_rng(7).standard_normal(cfg.sr * 6) * 0.4
             ).astype(np.float32)
    step = cfg.sr // 3
    for i in range(0, len(audio), step):
        streamer.push_audio(audio[i: i + step])
    streamer.flush()
    assert streamer.pop_frames().shape[0] > 0
    assert fe._extract_valid_jit._cache_size() == after_warm


def test_streaming_smoothing_matches_offline_pair_average(setup):
    """smooth=True applies the reference API's pair-averaging to the live
    stream with one frame of lookahead: identical pushes through a smooth
    and a raw streamer must satisfy smooth == smooth_by_averaging_pairs(raw)
    exactly (same decodes, same math, just streamed)."""
    from neurosync_trainer_lite_tpu.inference.api import (
        smooth_by_averaging_pairs)

    cfg, params = setup
    extract = _feature_oracle(cfg)
    spf = cfg.sr // 60
    audio = np.random.default_rng(11).standard_normal(90 * spf
                                                      ).astype(np.float32)

    raw = BlendshapeStreamer(params, cfg, extract_features=extract)
    smooth = BlendshapeStreamer(params, cfg, extract_features=extract,
                                smooth=True)
    for i in range(0, len(audio), 11 * spf):
        chunk = audio[i: i + 11 * spf]
        raw.push_audio(chunk)
        smooth.push_audio(chunk)
        # lookahead: the smooth streamer may lag by exactly one frame
        assert raw.frames_ready - smooth.frames_ready in (0, 1)
    raw.flush()
    smooth.flush()

    np.testing.assert_allclose(
        smooth.pop_frames(), smooth_by_averaging_pairs(raw.pop_frames()),
        atol=1e-12)


def test_frame_assembler_two_phase_matches_serial_oracle():
    """Property test: plan()/windows()/apply() against a literal serial
    reimplementation of the original drain loop (decode-then-blend one
    window at a time), over randomized feature-arrival patterns, overlaps,
    and final flushes. The decode is a deterministic stand-in so equality
    is exact."""
    from neurosync_trainer_lite_tpu.inference.chunked import (
        blend_chunks, pad_audio_chunk)
    from neurosync_trainer_lite_tpu.inference.streaming import FrameAssembler
    from neurosync_trainer_lite_tpu.data.processing import BLENDSHAPE_SCALE

    rng = np.random.default_rng(21)

    def fake_decode(window):  # deterministic [take, out] "model"
        w = window @ np.linspace(0.1, 1.0, window.shape[1])[:, None]
        return np.repeat(w, 61, axis=1) * 0.01

    for trial in range(8):
        frame_len = int(rng.integers(6, 20))
        overlap = int(rng.integers(0, frame_len))  # incl. the frame_len-1 boundary
        cfg = tiny_config(frame_size=frame_len, overlap=overlap,
                          input_dim=5, output_dim=61)
        total = int(rng.integers(1, 150))  # incl. sub-frame-length clips
        feats = rng.standard_normal((total, 5)).astype(np.float32)

        # serial oracle: original one-window-at-a-time loop
        pending, emitted, consumed = None, [], 0

        def finalize(frames):
            if len(frames):
                out = np.array(frames, np.float64)
                out[:, :61] /= BLENDSHAPE_SCALE
                emitted.append(out)

        def serial_drain(n_feat, final):
            nonlocal pending, consumed
            while True:
                avail = n_feat - consumed
                if avail <= 0 or (avail < frame_len and not final):
                    break
                take = min(frame_len, avail)
                window = feats[consumed: consumed + take]
                dec = fake_decode(
                    pad_audio_chunk(window, frame_len, 5))[:take]
                merged = dec if pending is None else blend_chunks(
                    pending, dec, overlap)
                if final and take >= avail:
                    finalize(merged)
                    pending = None
                    consumed += take
                    break
                hold = min(overlap, len(merged))
                finalize(merged[: len(merged) - hold])
                pending = merged[len(merged) - hold:]
                consumed += take - hold

        # assembler under test, fed the same random arrival pattern
        asm = FrameAssembler(cfg)
        n_seen = 0
        while n_seen < total:
            n_seen = min(total, n_seen + int(rng.integers(1, 40)))
            asm.ingest(feats[:n_seen], base=0)
            plans = asm.plan(final=False)
            if plans:
                decoded = np.stack([
                    fake_decode(w) for w in asm.windows(plans)])
                asm.apply(plans, decoded)
            serial_drain(n_seen, final=False)
        plans = asm.plan(final=True)
        if plans:
            decoded = np.stack([fake_decode(w) for w in asm.windows(plans)])
            asm.apply(plans, decoded)
        serial_drain(total, final=True)

        got = asm.pop_frames()
        want = (np.concatenate(emitted) if emitted
                else np.zeros((0, 61)))
        assert got.shape == want.shape, (trial, frame_len, overlap, total)
        np.testing.assert_array_equal(got, want)
