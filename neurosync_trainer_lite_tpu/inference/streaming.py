"""Real-time streaming inference: incremental audio → incremental blendshapes.

The reference handles long audio only offline — all features first, then a
serial chunk/blend loop (reference: utils/audio/processing/audio_processing.py:
50-112). This streamer produces frames *incrementally* with the same
chunk/overlap-blend math, for live Player/API sessions (BASELINE config #5,
real-time 60 fps): feed raw audio samples as they arrive, pull blendshape
frames as they become final.

Protocol (identical blending semantics to the offline path):
- features accumulate in a ring; every `frame_size - overlap` new frames a
  128-frame window is decoded (one jitted call on a fixed shape — compiled
  exactly once);
- the first `overlap` frames of a new chunk cross-fade into the previous
  chunk's tail, so a chunk's last `overlap` frames stay *provisional* until
  the next chunk (or `flush()`) finalizes them;
- `flush()` decodes whatever remains (reflect-padded) and finalizes.

Latency: one chunk stride = (128-16) frames ≈ 1.87 s of audio at 60 fps by
default; lower `frame_size`/raise `overlap` for lower-latency interactive use
(quality parity holds — RoPE makes windows position-relative).

Feature-extraction caveat: the MFCC pipeline normalizes cepstra with
*clip-global* mean/variance (CMVN, reference extract_features_utils.py:5-8),
so feature rows are only exactly reproducible given the whole clip. The
streamer recomputes features over its buffered audio on each push (the
frontend is device-batched and cheap relative to the model) and decodes each
window with the freshest statistics; already-finalized frames are never
revised. Consumed audio beyond a context margin is dropped
(TRIM_THRESHOLD/MARGIN), so live sessions run in bounded memory with bounded
per-push work. Offline and streaming outputs therefore agree to CMVN-drift
tolerance, not bit-exactly — and tail frames use blended (not the offline
path's concatenated) semantics.

Structure: the feature→frame half lives in `FrameAssembler` (consumption
cursor, provisional tail, window planning, overlap blend). Its drain is
two-phase — `plan()` lists the windows a drain will decode WITHOUT decoding,
`apply()` blends the decoded results — so window decodes batch: across
catch-up windows within one session, and across sessions in
`MultiStreamer` (inference/multi_stream.py), where K live sessions share one
device program per tick.
"""

from __future__ import annotations

import numpy as np

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.data.processing import BLENDSHAPE_SCALE
from neurosync_trainer_lite_tpu.inference.chunked import (
    blend_chunks,
    decode_chunks_batched,
    pad_audio_chunk,
)


class FrameAssembler:
    """Features in → finalized blendshape frames out, overlap-blend continuity.

    Indices live in the owner's current buffer space: feature row i is the
    i-th 60 fps frame of the (possibly trimmed) audio buffer. `shift(m)`
    renumbers after the owner drops m frames of audio from the front.
    """

    def __init__(self, cfg: Config, *, smooth: bool = False):
        self.cfg = cfg
        self._features = np.zeros((0, cfg.input_dim), np.float32)
        self._base = 0                  # buffer-space row index of _features[0]
        self._pending: np.ndarray | None = None  # provisional tail frames
        self._emitted: list[np.ndarray] = []
        self._consumed = 0              # buffer-space rows already decoded
        #: streaming pair-average smoothing (reference
        #: generate_face_shapes.py:22-26): s[i] = (x[i] + x[i+1]) / 2, last
        #: frame as-is — implemented with ONE frame of lookahead so the live
        #: output equals smooth_by_averaging_pairs over the whole stream
        self._smooth = smooth
        self._smooth_hold: np.ndarray | None = None

    # -- feeding ------------------------------------------------------------

    @property
    def consumed(self) -> int:
        return self._consumed

    @property
    def n_features(self) -> int:
        """Highest feature row (buffer space) currently ingested."""
        return self._base + len(self._features)

    def ingest(self, feats: np.ndarray, base: int = 0) -> None:
        """Replace the feature window: rows [base, base+len) of buffer space.

        Skipped when it brings nothing new beyond the consumption point
        (CMVN makes earlier rows drift slightly as audio accrues — finalized
        frames are never revised, so stale earlier rows are harmless)."""
        if base + len(feats) > self._consumed:
            self._features = np.asarray(feats, np.float32)
            self._base = base

    def shift(self, m: int) -> None:
        """Owner dropped m frames of audio from the buffer front."""
        self._consumed -= m
        self._base -= m

    # -- two-phase drain ----------------------------------------------------

    def plan(self, *, final: bool) -> list[tuple[int, int, int, bool]]:
        """The windows the next drain will decode: (start, take, hold,
        is_final_tail) per window, WITHOUT decoding or mutating state.
        Mirrors the serial drain loop exactly — `hold` is the provisional
        tail the next window will cross-fade into."""
        cfg = self.cfg
        frame_len, overlap = cfg.frame_size, cfg.overlap
        plans = []
        consumed = self._consumed
        pend = 0 if self._pending is None else len(self._pending)
        n_feat = self.n_features
        while True:
            avail = n_feat - consumed
            if avail <= 0:
                break
            if avail < frame_len and not final:
                break
            take = min(frame_len, avail)
            if pend == 0:
                merged_len = take
            else:
                merged_len = pend + take - min(overlap, pend, take)
            if final and take >= avail:
                plans.append((consumed, take, 0, True))
                break
            hold = min(overlap, merged_len)
            plans.append((consumed, take, hold, False))
            consumed += take - hold
            pend = hold
        return plans

    def plan_next(self, n_feat_total: int, *,
                  final: bool) -> tuple[int, int, int, bool] | None:
        """The SINGLE next window (start, take, hold, is_final_tail) given a
        total feature-row count that need not be ingested — the fused-tick
        path (inference/multi_stream.py) decodes windows on device, so the
        assembler never holds features there. Same arithmetic as plan()'s
        first iteration."""
        cfg = self.cfg
        frame_len, overlap = cfg.frame_size, cfg.overlap
        avail = n_feat_total - self._consumed
        if avail <= 0 or (avail < frame_len and not final):
            return None
        take = min(frame_len, avail)
        pend = 0 if self._pending is None else len(self._pending)
        merged_len = (take if pend == 0
                      else pend + take - min(overlap, pend, take))
        if final and take >= avail:
            return (self._consumed, take, 0, True)
        return (self._consumed, take, min(overlap, merged_len), False)

    def windows(self, plans) -> np.ndarray:
        """[N, frame_size, input_dim] reflect-padded decode inputs."""
        cfg = self.cfg
        return np.stack([
            pad_audio_chunk(
                self._features[s - self._base: s - self._base + take],
                cfg.frame_size, cfg.input_dim)
            for (s, take, _, _) in plans
        ])

    def apply(self, plans, decoded: np.ndarray) -> None:
        """Blend + finalize the decoded windows (same serial accumulation as
        the offline path's reference math, audio_processing.py:33-48)."""
        overlap = self.cfg.overlap
        for (start, take, hold, is_tail), dec in zip(plans, decoded):
            dec = dec[:take]
            if self._pending is None:
                merged = dec
            else:
                merged = blend_chunks(self._pending, dec, overlap)
            if is_tail:
                self._finalize(merged)
                self._pending = None
                self._consumed = start + take
            else:
                self._finalize(merged[: len(merged) - hold])
                self._pending = merged[len(merged) - hold:]
                self._consumed = start + take - hold

    # -- reading ------------------------------------------------------------

    @property
    def frames_ready(self) -> int:
        return sum(len(e) for e in self._emitted)

    def pop_frames(self) -> np.ndarray:
        """All finalized frames since the last pop: [n, output_dim]."""
        if not self._emitted:
            return np.zeros((0, self.cfg.output_dim), np.float64)
        out = np.concatenate(self._emitted, axis=0)
        self._emitted = []
        return out

    def finish(self) -> None:
        """End of stream: release the smoothing lookahead frame (the last
        frame is emitted as-is, matching smooth_by_averaging_pairs)."""
        if self._smooth_hold is not None:
            self._emitted.append(self._smooth_hold)
            self._smooth_hold = None

    def _finalize(self, frames: np.ndarray) -> None:
        if len(frames) == 0:
            return
        out = np.array(frames, np.float64)
        out[:, :61] /= BLENDSHAPE_SCALE  # LiveLink space (reference: audio_processing.py:102)
        if self._smooth:
            block = (out if self._smooth_hold is None
                     else np.vstack([self._smooth_hold, out]))
            self._emitted.append((block[:-1] + block[1:]) / 2.0)
            self._smooth_hold = block[-1:]
            return
        self._emitted.append(out)


class BlendshapeStreamer:
    """Incremental wav→blendshape decoder with overlap-blend continuity."""

    #: drop consumed audio once this many finalized frames accumulate
    TRIM_THRESHOLD_FRAMES = 512
    #: frames of context kept behind the consumption point when trimming
    TRIM_MARGIN_FRAMES = 64
    #: legacy knob for CUSTOM extractors whose compile cost depends on the
    #: input length: feature extraction then runs on a prefix of the buffer
    #: quantized DOWN to a multiple of this many 60 fps frames, so the set
    #: of lengths converges (at up to that many frames of extra latency per
    #: push). The DEFAULT extractor no longer needs it — it is the bucketed
    #: traced-length frontend (ops/frontend.py:extract_audio_features_bucketed),
    #: which compiles per power-of-two sample bucket, not per length — so
    #: this defaults to 0 (off) and every pushed sample is visible
    #: immediately.
    FEATURE_QUANT_FRAMES = 0

    def __init__(self, params, cfg: Config, *, extract_features=None,
                 smooth: bool = False):
        from neurosync_trainer_lite_tpu.ops.frontend import (
            extract_audio_features_bucketed)

        self.params = params
        self.cfg = cfg
        self._default_extract = extract_features is None
        self._extract = extract_features or (
            lambda y: extract_audio_features_bucketed(y, cfg.sr))
        self._audio = np.zeros((0,), np.float32)      # buffered samples
        self._asm = FrameAssembler(cfg, smooth=smooth)
        # one 60 fps output frame spans exactly frame_length samples when the
        # frontend's two 120 fps hops tile it (frame_length even, the default
        # sr=88200 → 1470); trimming relies on that alignment
        self._frame_samples = int(0.01667 * cfg.sr)
        self._can_trim = (self._default_extract
                          and self._frame_samples % 2 == 0)

    def warmup(self, max_buffer_seconds: float | None = None) -> int:
        """Pre-compile every device program a live session will touch.

        The bucketed frontend compiles once per power-of-two sample bucket;
        without warmup the first push into each new bucket stalls a live
        session for a fresh XLA compile (measured 12.5 s mid-session on a
        real TPU — docs/PERF.md). Trimming bounds the audio buffer, so the
        set of buckets a session can reach is finite and known up front:
        this walks each bucket (plus the decode program) on noise before any
        real audio arrives. Returns the number of frontend buckets warmed.

        max_buffer_seconds: cap on the buffered-audio length to warm for;
        defaults to the trim bound (TRIM_THRESHOLD + margin + two chunks of
        slack). Only meaningful with the default extractor — a custom
        extractor is called once at the cap instead.
        """
        from neurosync_trainer_lite_tpu.ops.frontend import MIN_SAMPLE_BUCKET

        cfg = self.cfg
        if max_buffer_seconds is None:
            bound_frames = (self.TRIM_THRESHOLD_FRAMES
                            + self.TRIM_MARGIN_FRAMES + 2 * cfg.frame_size)
            max_samples = bound_frames * self._frame_samples
        else:
            max_samples = int(max_buffer_seconds * cfg.sr)

        # decode program at every bucket a session can hit: steady state is
        # one window per drain, but a catch-up push or a flush with leftover
        # rows plans several — decode_chunks_batched pads to power-of-two
        # row buckets, so warm 1, 2 and 4
        rng = np.random.default_rng(0)
        for m in (1, 2, 4):
            chunk = rng.standard_normal(
                (m, cfg.frame_size, cfg.input_dim)).astype(np.float32)
            decode_chunks_batched(self.params, chunk, cfg)

        if not self._default_extract:
            self._extract(rng.standard_normal(max_samples).astype(np.float32))
            return 1

        margin = self._frame_samples // 2 + 1  # autocorr reflected-tail room
        warmed, bucket = 0, MIN_SAMPLE_BUCKET
        while True:
            n = min(bucket - margin, max_samples)
            self._extract(rng.standard_normal(n).astype(np.float32) * 0.1)
            warmed += 1
            if n >= max_samples:
                return warmed
            bucket *= 2

    # -- feeding ------------------------------------------------------------

    def push_audio(self, samples: np.ndarray) -> int:
        """Append raw mono samples at cfg.sr; returns frames newly
        finalized. Integer PCM is widened by the dtype's full scale (no
        peak normalization — streaming surface; same policy as
        MultiStreamer.push_audio) instead of silently cast to raw-amplitude
        floats."""
        samples = np.asarray(samples).reshape(-1)
        if samples.dtype == np.int16:
            samples = samples.astype(np.float32) / 32768.0
        elif np.issubdtype(samples.dtype, np.integer):
            from neurosync_trainer_lite_tpu.ops.frontend import widen_int_pcm
            samples = widen_int_pcm(samples)
        samples = samples.astype(np.float32, copy=False)
        self._audio = np.concatenate([self._audio, samples])
        self._refresh_features()
        before = self.frames_ready
        self._drain(final=False)
        self._maybe_trim()
        return self.frames_ready - before

    def _maybe_trim(self) -> None:
        """Drop audio behind the consumption point so live sessions run in
        bounded memory with bounded per-push work. A margin of context frames
        stays so re-extracted features match (up to the documented CMVN
        drift); 60 fps frame i starts at sample i·frame_samples, so dropping
        m frames of audio shifts indices by exactly m."""
        if not self._can_trim:
            return
        excess = self._asm.consumed - self.TRIM_MARGIN_FRAMES
        if excess < self.TRIM_THRESHOLD_FRAMES:
            return
        self._audio = self._audio[excess * self._frame_samples:]
        self._asm.shift(excess)
        self._refresh_features()

    def flush(self) -> None:
        """Finalize everything buffered (end of stream)."""
        self._refresh_features(final=True)
        self._drain(final=True)
        self._asm.finish()

    # -- reading ------------------------------------------------------------

    @property
    def frames_ready(self) -> int:
        return self._asm.frames_ready

    def pop_frames(self) -> np.ndarray:
        """All finalized frames since the last pop: [n, output_dim]."""
        return self._asm.pop_frames()

    # -- internals ----------------------------------------------------------

    def _refresh_features(self, *, final: bool = False) -> None:
        """Re-extract features over the (bounded) audio buffer.

        CMVN makes early rows drift slightly as audio accrues (documented in
        the module docstring); the refresh is skipped only when extraction
        yields nothing new beyond the consumption point. With a custom
        extractor and FEATURE_QUANT_FRAMES > 0, extraction sees a
        length-quantized prefix of the buffer (pre-bucketed-frontend compile
        hygiene — see the class attribute); the remainder waits for the
        next push. The default bucketed extractor needs no quantization.
        """
        y = self._audio
        if not final and self.FEATURE_QUANT_FRAMES > 0:
            quant = self.FEATURE_QUANT_FRAMES * self._frame_samples
            y = y[: (len(y) // quant) * quant]
        if len(y) == 0:
            return
        feats = self._extract(y)
        if feats is None:
            return
        self._asm.ingest(feats)

    #: max windows per decode call: keeps every batch on a warmed bucket
    #: (warmup() compiles 1/2/4) and bounds device memory for giant catch-up
    #: pushes — a 10-minute push drains in bounded groups, not one
    #: [512, frame, 256] batch through the 228M model
    DECODE_GROUP = 4

    def _drain(self, *, final: bool) -> None:
        plans = self._asm.plan(final=final)
        for at in range(0, len(plans), self.DECODE_GROUP):
            group = plans[at: at + self.DECODE_GROUP]
            decoded = decode_chunks_batched(
                self.params, self._asm.windows(group), self.cfg)
            self._asm.apply(group, decoded)
