"""Multi-session live serving: K concurrent audio→blendshape streams, one
device program per tick.

Production serving means many simultaneous Player/API sessions per chip.
Driving K independent `BlendshapeStreamer`s costs K separate frontend
dispatches and K decode dispatches per push interval — K× the link
round-trips, with the MXU running at batch 1, and (in the host streamer's
design) the WHOLE audio buffer re-uploaded on every push. None of that is
how a TPU wants to serve.

TPU-first design — three ideas:

1. **Device-resident audio rings.** Each session owns a row of a
   `[K, S_cap]` waveform buffer that lives in HBM across ticks (the array is
   donated through the tick program). A push uploads ONLY the new samples;
   the ring is shifted (trim), appended, and re-extracted entirely on
   device. Upload per tick drops from O(buffer) to O(new audio).
2. **One fused tick program.** shift → append → masked frontend
   (`ops/frontend.py:extract_features_valid`, vmapped over sessions with
   per-session traced lengths) → per-session feature-window slice, all in a
   single jit. K sessions cost one dispatch and one bounded download
   (`[K, f_win, 256]` feature rows from each session's consumption point)
   instead of K full-feature downloads.
3. **Cross-session batched decode — over READY rows only.** At live
   cadence a 128-frame window completes only every ~1.9 s of audio, so on
   a decode tick typically ~K/8 sessions have one ready; the fused tick
   gathers just those rows into a small [D] sub-batch (D = bucket of the
   ready count, capped by `decode_bucket_cap`) for frontend + decode —
   the other rows pay only the ring update. The two-dispatch fallback
   instead stacks ready windows from all sessions into one
   `decode_chunks_batched` call (power-of-two row buckets).

Frame semantics are exactly `BlendshapeStreamer`'s (same `FrameAssembler`,
same overlap-blend math, same CMVN-drift contract — inference/streaming.py);
equality with independent single-session streamers is pinned in
tests/test_multi_stream.py.

Compile-cache shape: the tick program keys on the active-session bucket
(1, 2, 4, … ≤ max_sessions) only — S_cap, the push capacity, and f_win are
fixed at construction. `warmup()` walks the K buckets and decode buckets so
a live deployment never compiles mid-session.

Bounded per-tick work: at most `push_capacity` new samples per session are
taken per tick (the rest spill to the next tick), at most `f_win` feature
rows are downloaded per session, and trimming keeps each ring inside
`S_cap`. A session whose consumer lags simply catches up over several
ticks; a stalled intake backpressures `push_audio` into the host-side
pending queue.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.inference.chunked import decode_chunks_batched
from neurosync_trainer_lite_tpu.inference.streaming import FrameAssembler
from neurosync_trainer_lite_tpu.ops import frontend_np as F
from neurosync_trainer_lite_tpu.ops.frontend import (
    extract_features_valid,
    num_frames_60,
    num_frames_120,
    pow2_bucket,
)



def session_bucket(n: int) -> int:
    """Next session-count bucket ≥ n from the ladder
    1, 2, 4, 8, 16, 24, 32, 48, … (pow2 plus a midpoint above 8).

    Per-tick cost is bucket-shaped — every live session count inside a
    bucket pays the whole bucket's program (measured: K=12 and K=16 cost
    the same in the pow2-16 bucket, and K=17-24 all paid the pow2-32
    bucket's p95 896 ms, well past the 500 ms budget — docs/PERF.md).
    The 24 midpoint softens the 16→32 jump (K=20 measured p95 566 vs
    bucket-32's 896). A 12 midpoint was probed and REJECTED: 12 rows are
    not a sublane multiple and the bucket-12 program measured SLOWER than
    bucket-16 with fewer live sessions (p95 477 vs 397 under the same
    tunnel conditions) — midpoints must stay 8-aligned. Deployments with
    max_sessions ≤ 16 see the identical pow2 set."""
    b = 1
    while True:
        if n <= b:
            return b
        if b >= 16 and n <= b + b // 2:
            return b + b // 2
        b *= 2


def _validate_formats(name: str, formats) -> tuple:
    """Shared validation for the constructor's push_formats and warmup's
    push_dtypes — one copy so the accepted-format set can't silently
    diverge between the two sites."""
    bad = set(formats) - {"f32", "s16"}
    if bad or not formats:
        raise ValueError(
            f"{name}={formats!r}: must be a non-empty subset "
            f"of ('f32', 's16')")
    return tuple(formats)


def _ring_update(b, nw, sh, bl, nl):
    """Shared per-row ring update for every tick variant: trim-shift, clear
    rolled-in garbage, widen int16 pushes, clamp-free roll-append.
    Returns (buffer, total valid samples). The subtle invariants live HERE
    only: the /32768 widening is a power-of-two multiply (exact in fp32,
    matching the device pipeline's capture-format path), and the append
    places the new chunk via roll — a dynamic_update_slice would clip its
    start near the ring end and overwrite valid audio; everything beyond nl
    in nw is zero and the host guarantees bl + nl <= S_avail, so any
    wrapped tail is zeros landing on zeros."""
    S = b.shape[0]
    b = jnp.roll(b, -sh)
    bl = bl - sh
    b = jnp.where(jnp.arange(S) < bl, b, 0.0)
    if nw.dtype == jnp.int16:
        nw = nw.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    nw_full = jnp.roll(jnp.concatenate([nw, jnp.zeros(S - nw.shape[0],
                                                      nw.dtype)]), bl)
    return b + nw_full, bl + nl


@functools.partial(jax.jit, donate_argnums=(0,))
def _tick_ring_only(buf, idx, new, shift, buf_len, new_len):
    """Intake-only tick: update the rings, extract/decode nothing. Used on
    the (majority of) fused-mode ticks where no session has a window ready
    — a window only completes every ~1.9 s of audio, so decoding garbage on
    every push tick would waste MXU time and download bytes."""
    def one(b, nw, sh, bl, nl):
        b, _ = _ring_update(b, nw, sh, bl, nl)
        return b

    rows = jax.vmap(one)(buf[jnp.clip(idx, 0, buf.shape[0] - 1)],
                         new, shift, buf_len, new_len)
    return buf.at[idx].set(rows, mode="drop")


@functools.partial(jax.jit, static_argnames=("sr", "f_win", "feat_dtype"),
                   donate_argnums=(0,))
def _tick_program(buf, idx, new, shift, buf_len, new_len, feat_start, *,
                  sr: int, f_win: int, feat_dtype=jnp.float32):
    """One serving tick over the gathered session rows.

    buf: [K_cap, S] device rings (donated); idx: [K] row ids;
    new: [K, P] new samples (zero beyond new_len); shift/buf_len/new_len/
    feat_start: [K] i32. Returns (updated buf, [K, f_win, n_features]
    feature windows starting at feat_start, downloaded as feat_dtype —
    bf16 when the model computes in bf16: the decode's first op casts its
    input to bf16 anyway, so the rounded download decodes BIT-identically
    while halving the dominant per-tick transfer).
    """
    def one(b, nw, sh, bl, nl, fs):
        b, total = _ring_update(b, nw, sh, bl, nl)
        feats = extract_features_valid(b, total, sr)      # [T60_cap, 256]
        win = jax.lax.dynamic_slice(feats, (fs, 0), (f_win, feats.shape[1]))
        return b, win.astype(feat_dtype)

    # padding rows carry idx == K_cap (out of range): the gather clamps to
    # the last row (harmless read) and the scatter DROPS the write — they
    # must never race a real session's row
    rows, wins = jax.vmap(one)(buf[jnp.clip(idx, 0, buf.shape[0] - 1)],
                               new, shift, buf_len, new_len, feat_start)
    return buf.at[idx].set(rows, mode="drop"), wins


@functools.partial(jax.jit, static_argnames=("sr", "cfg"),
                   donate_argnums=(1,))
def _tick_fused(params, buf, idx, new, shift, buf_len, new_len,
                dec_idx, win_start, win_take, *, sr: int, cfg):
    """v3 serving tick: ring update over every gathered session row →
    frontend + traced-window gather + batched decode over ONLY the [D]
    rows that actually have a window ready, ONE program — no feature
    download and no second dispatch (the decode rides the same
    round-trip).

    At live cadence a window completes only every ~1.9 s of audio per
    session, so on a decode tick typically ~K/8 sessions are ready; the
    v2 program ran the frontend AND the 228M decode over all K bucket
    rows regardless (the device-trace knee attribution charged the whole
    vmapped frontend + batch-K decode to every decode tick). D is a
    separate (small) bucket: ready rows are gathered post-ring-update and
    only they pay frontend + decode.

    dec_idx: [D] i32 indices into THIS TICK's gathered row batch (not
    ring rows); padding entries point at row 0 with win_take == 0 and
    decode garbage the host discards. win_start/win_take: [D] i32
    single-window plans computed host-side pre-tick. Returns
    (buf, [D, frame, 61] fp32 decoded windows)."""
    from neurosync_trainer_lite_tpu.models.seq2seq import seq2seq_apply

    frame_len = cfg.frame_size

    def ring_one(b, nw, sh, bl, nl):
        return _ring_update(b, nw, sh, bl, nl)

    rows, totals = jax.vmap(ring_one)(
        buf[jnp.clip(idx, 0, buf.shape[0] - 1)],
        new, shift, buf_len, new_len)

    def win_one(b, total, ws, wt):
        feats = extract_features_valid(b, total, sr)      # [T60_cap, 256]
        # reflect-padded window at traced (start, take): row j maps to
        # min(m, p-m), m = j mod p, p = 2(take-1) — numpy's multi-
        # reflection rule, matching pad_audio_chunk bit-for-bit (short
        # takes reflect repeatedly, take==1 repeats the single row)
        j = jnp.arange(frame_len)
        p = jnp.maximum(2 * (wt - 1), 1)
        m = j % p
        rel = jnp.minimum(m, p - m)
        return feats[ws + rel]                            # [frame, 256]

    sel = jnp.clip(dec_idx, 0, rows.shape[0] - 1)
    wins = jax.vmap(win_one)(rows[sel], totals[sel], win_start, win_take)
    decoded = seq2seq_apply(params, wins, cfg)
    return buf.at[idx].set(rows, mode="drop"), decoded.astype(jnp.float32)


@dataclass
class _Session:
    row: int                      # ring row in the device buffer
    asm: FrameAssembler
    buf_len: int = 0              # valid samples in the ring
    pending: list = field(default_factory=list)  # host-queued new audio
    #: decode-fairness stamp: the _dec_seq value of this session's last
    #: fused decode (-1 = never). When decode_bucket_cap binds, ready rows
    #: are served least-recently-decoded first — plain work order would
    #: starve late-opened sessions under sustained overload.
    last_dec: int = -1
    #: host mirror of the ring content — the recovery source when a device
    #: fault (tunnel flap, preemption) loses the HBM rings. Costs only a
    #: bounded memcpy per tick: the samples are already on host at push time.
    shadow: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.float32))


class MultiStreamer:
    """K concurrent `BlendshapeStreamer`-equivalent sessions on one chip.

    Usage::

        ms = MultiStreamer(params, cfg, max_sessions=8)
        ms.warmup()
        a = ms.open(); b = ms.open()
        ms.push_audio(a, samples_a); ms.push_audio(b, samples_b)
        ms.tick()                      # one device program for everyone
        frames_a = ms.pop_frames(a)
        ms.flush(b); tail_b = ms.pop_frames(b); ms.close(b)
    """

    def __init__(self, params, cfg: Config, *, max_sessions: int = 8,
                 f_win: int = 256, trim_threshold: int = 256,
                 trim_margin: int = 64, max_buffer_seconds: float | None = None,
                 fused_decode: bool = True,
                 stall_watchdog_s: float | None = 30.0,
                 decode_bucket_cap: int | None | str = "auto",
                 push_seconds: float | None = None,
                 push_formats: tuple = ("f32", "s16")):
        self.params = params
        self.cfg = cfg
        self.max_sessions = max_sessions
        self.trim_threshold = trim_threshold
        self.trim_margin = trim_margin
        #: upload formats this deployment pushes — "f32" (float32) and/or
        #: "s16" (raw int16 PCM). Drives warmup()'s default program family
        #: (a single-format deployment warms half of it — the dominant
        #: cold-start cost) and the dtype of the EMPTY upload buffer on
        #: ticks with no queued audio (idle/flush ticks, the most common
        #: kind — they must ride a warmed signature too). Pushing an
        #: unlisted format still works: its first tick compiles lazily and
        #: the watchdog exempts a signature's first use.
        self.push_formats = _validate_formats("push_formats", push_formats)
        self._empty_i16 = "f32" not in self.push_formats
        #: stall watchdog: if a fused tick exceeds this wall-time budget,
        #: the streamer logs loudly and switches itself to the two-dispatch
        #: family for all subsequent ticks — bounding the damage to ONE
        #: slow tick (+ a one-time compile of the fallback programs, which
        #: the persistent XLA cache usually absorbs). The historical
        #: 39 s–13 min "rare fused stalls" this guarded against were
        #: root-caused in late r3 to warmup never forcing its dispatches
        #: (see warmup()) and are fixed, but the watchdog stays as the
        #: safety net on an unreliable link. None disables the fallback.
        #: 30 s is ~100× the fused p95 at K=12.
        self.stall_watchdog_s = stall_watchdog_s
        #: fused tick (the default): window gather + decode run INSIDE the
        #: tick program — one dispatch and no feature download per tick, at
        #: most one decoded window per session per tick (catch-up spreads
        #: over ticks). Steady-state p50 ~15 ms vs ~106 ms two-dispatch,
        #: and the scalable family past the ~14-stream knee (per-tick cost
        #: is dispatch/transfer-bound — docs/PERF.md knee attribution).
        #: Was opt-in for most of r3 while the family showed rare
        #: multi-minute single-tick stalls; those were root-caused to
        #: warmup's unforced dispatches (fixed in warmup()) and 1000+
        #: post-fix fused soak ticks ran stall-free (max 208.7 ms).
        #: fused_decode=False selects the two-dispatch family
        #: (feature-window download + separate batched decode), which
        #: decodes multiple windows per session per tick — still the right
        #: choice for offline catch-up-heavy feeds.
        self.fused = fused_decode
        #: fused program signatures (bucket × dtype × decode/ring) whose
        #: first execution already happened (warmup or a live tick) — the
        #: watchdog exempts a signature's first use so an uncovered
        #: bucket's cold XLA compile isn't misread as a stall
        self._fused_seen: set = set()
        self._dec_seq = 0  # fused-decode clock for last_dec fairness stamps

        self._frame_samples = int(0.01667 * cfg.sr)
        if self._frame_samples % 2:
            raise ValueError("MultiStreamer needs an even frame length "
                             "(sr=88200 default); use BlendshapeStreamer")
        if max_buffer_seconds is None:
            bound = (trim_threshold + trim_margin + 2 * cfg.frame_size
                     ) * self._frame_samples
        else:
            bound = int(max_buffer_seconds * cfg.sr)
        tail_room = self._frame_samples // 2 + 1  # autocorr reflected tail
        self._s_cap = pow2_bucket(bound + tail_room)
        self._s_avail = self._s_cap - tail_room
        # Liveness floor: once a backlogged session's ring is full, progress
        # needs EITHER a full decode window (frame_size unconsumed frames)
        # OR an eligible trim (threshold+margin consumed frames) to free
        # intake room. A ring that can't hold both deadlocks: no room to
        # intake, no window to decode, no trim to free room (found by
        # driving flush() with max_buffer_seconds=4.0 at the production
        # trim settings).
        floor_frames = trim_threshold + trim_margin + cfg.frame_size
        cap_frames = num_frames_60(self._s_avail, self._frame_samples)
        if cap_frames < floor_frames:
            need_s = (floor_frames * self._frame_samples + tail_room
                      ) / cfg.sr
            raise ValueError(
                f"max_buffer_seconds={max_buffer_seconds} gives a ring of "
                f"{cap_frames} frames < trim_threshold + trim_margin + "
                f"frame_size = {floor_frames}; a backlogged session would "
                f"deadlock. Use max_buffer_seconds >= {need_s:.2f} or "
                f"lower the trim settings.")
        #: per-tick new-sample capacity per session. The tick uploads a
        #: dense [K_bucket, push_capacity] array every tick regardless of
        #: how much audio is actually queued, so this width is the
        #: dominant per-tick upload cost. The default (≈1.5 s at 88.2 kHz)
        #: favors backlog catch-up; live deployments pushing every ~0.25 s
        #: can pass push_seconds≈0.5 for ~3× fewer upload bytes per tick
        #: (a backlogged session then catches up at push_seconds per tick).
        if push_seconds is None:
            self.push_capacity = min(1 << 17, self._s_cap // 2)
        else:
            # a non-positive width silently degrades to 1 sample of intake
            # per tick (a 128-frame window would need ~164k ticks) — reject
            # it here; callers meaning "default" pass None
            if push_seconds <= 0:
                raise ValueError(
                    f"push_seconds={push_seconds} must be > 0 "
                    f"(or None for the default ≈1.5 s width)")
            self.push_capacity = min(
                pow2_bucket(max(1, int(push_seconds * cfg.sr))),
                self._s_cap // 2)
        #: fused-tick decode bucket cap: a decode tick gathers the rows
        #: with a ready window into a [D] sub-batch (D = bucket of the
        #: ready count) instead of running frontend+decode over all K
        #: bucket rows. The cap bounds the program family (D walks the
        #: bucket ladder up to it) and per-tick decode latency; rows past
        #: the cap simply stay ready and decode on the next tick (live
        #: cadence self-balances: a decoded session isn't ready again for
        #: ~1.9 s). None = decode every ready row in one tick (D up to the
        #: session bucket). "auto" sizes the cap so decode keeps pace with
        #: window production at a live 0.5 s push cadence (one window per
        #: ~3.8 ticks per session → cap ≥ K/3, rounded to the bucket
        #: ladder, floor 8): 8 through max_sessions=24, 16 at 32 —
        #: measured K=32/cap-16 p99 415 ms, zero backlog (docs/PERF.md).
        if decode_bucket_cap == "auto":
            decode_bucket_cap = max(8, session_bucket(-(-max_sessions // 3)))
        elif isinstance(decode_bucket_cap, str):
            raise ValueError(
                f"decode_bucket_cap={decode_bucket_cap!r}: the only string "
                f"value is 'auto' (or pass an int >= 1, or None for no cap)")
        elif decode_bucket_cap is not None and (
                not isinstance(decode_bucket_cap, int)
                or isinstance(decode_bucket_cap, bool)
                or decode_bucket_cap < 1):
            # 0 would mean "no cap" via the `or k` fallback at tick time
            # (the opposite of what it reads as), a negative cap slices
            # dec_entries from the wrong end (deferring a ready window
            # forever), and a float (e.g. max_sessions/3 unrounded) raises
            # TypeError inside the tick, which the retry path misreads as
            # a device fault — fail here instead
            raise ValueError(
                f"decode_bucket_cap={decode_bucket_cap!r} must be an int "
                f">= 1, None (no cap), or 'auto'")
        self.decode_bucket_cap = decode_bucket_cap

        # rows the device feature array actually has: the bucket's 120 fps
        # frame count pair-reduced with the odd frame DROPPED
        # (ops/frontend.py:_reduce_features_valid trims static-odd buckets;
        # num_frames_60 would count the odd-tail row that only exists for
        # the traced VALID length — one row past the array)
        self._t60_cap = num_frames_120(self._s_cap, self._frame_samples) // 2
        self.f_win = min(f_win, self._t60_cap)

        kcap = session_bucket(max_sessions)
        self._kcap = kcap
        # bf16 feature download when the model computes bf16 (bit-identical
        # decode, half the bytes of the dominant per-tick transfer)
        self._feat_dtype = jnp.bfloat16 if cfg.use_amp else jnp.float32
        self._buf = jnp.zeros((kcap, self._s_cap), jnp.float32)
        self._free_rows = list(range(kcap - 1, -1, -1))
        self._sessions: dict[int, _Session] = {}
        self._next_id = 0

        #: ops counters + a rolling window of recent tick wall-times —
        #: cheap enough to be always-on; surfaced by the HTTP server's
        #: GET /metrics (inference/server.py) and readable directly in
        #: embedded deployments via metrics_snapshot()
        from collections import deque
        import threading
        self._counters = {"ticks": 0, "decode_ticks": 0, "frames_out": 0,
                          "watchdog_flips": 0, "ring_recoveries": 0}
        self._tick_times: deque[float] = deque(maxlen=512)
        # guards _tick_times/_counters between a serving thread's tick()
        # and a metrics scrape from another thread (ThreadingHTTPServer,
        # embedded dashboards): deque iteration raises RuntimeError if the
        # deque is appended-to mid-snapshot
        self._metrics_lock = threading.Lock()

    # -- session lifecycle ---------------------------------------------------

    def open(self, *, smooth: bool = False) -> int:
        """Allocate a session; returns its id. smooth=True applies the
        reference API's pair-average smoothing to the live stream (one
        frame of lookahead — inference/streaming.py:FrameAssembler)."""
        # cap at max_sessions, not the pow2 ring capacity rounded above it
        if not self._free_rows or len(self._sessions) >= self.max_sessions:
            raise RuntimeError(f"all {self.max_sessions} session slots busy")
        sid = self._next_id
        self._next_id += 1
        self._sessions[sid] = _Session(
            row=self._free_rows.pop(),
            asm=FrameAssembler(self.cfg, smooth=smooth))
        return sid

    def close(self, sid: int) -> None:
        """Release the session's ring row (call `flush` first to finalize)."""
        st = self._sessions.pop(sid)
        self._free_rows.append(st.row)

    @property
    def n_active(self) -> int:
        return len(self._sessions)

    def has_session(self, sid: int) -> bool:
        return sid in self._sessions

    # -- feeding / reading ---------------------------------------------------

    def push_audio(self, sid: int, samples: np.ndarray) -> None:
        """Queue raw mono samples at cfg.sr (uploaded at the next tick).

        int16 PCM (the LiveLink capture format) is kept as int16 and
        uploaded raw — half the bytes of fp32, widened exactly on device —
        whenever every session's queued audio that tick is int16; float
        input is taken as already-normalized [-1, 1] samples; other integer
        PCM (int32, uint8, ...) is widened by its dtype's full scale (a
        silent float32 cast fed ±2^31-amplitude garbage — ADVICE r2)."""
        samples = np.asarray(samples)
        if np.issubdtype(samples.dtype, np.integer) and \
                samples.dtype != np.int16:
            from neurosync_trainer_lite_tpu.ops.frontend import widen_int_pcm
            samples = widen_int_pcm(samples)
        elif samples.dtype != np.int16:
            samples = samples.astype(np.float32)
        samples = samples.reshape(-1)
        if samples.size:
            self._sessions[sid].pending.append(samples)

    def frames_ready(self, sid: int) -> int:
        return self._sessions[sid].asm.frames_ready

    def pop_frames(self, sid: int) -> np.ndarray:
        """Finalized frames since the last pop: [n, output_dim]."""
        return self._sessions[sid].asm.pop_frames()

    # -- the tick ------------------------------------------------------------

    def _t60_valid(self, n_samples: int) -> int:
        """60 fps feature rows a ring of n_samples yields (0 below the
        frontend minimum — reference: extract_features.py:14-20)."""
        fl = self._frame_samples
        if n_samples < fl or (n_samples - fl) // (fl // 2) + 1 < F.MIN_FRAMES:
            return 0
        return num_frames_60(n_samples, fl)

    def _needs_tick(self, st: _Session, final: bool) -> bool:
        if st.pending:
            return True
        avail = self._t60_valid(st.buf_len) - st.asm.consumed
        return avail >= (1 if final else self.cfg.frame_size)

    def tick(self, *, final_ids=(), _retry: bool = True) -> dict[int, int]:
        """Run one serving tick; returns {sid: newly finalized frames}.

        Sessions in final_ids drain to the very end (flush semantics) —
        `flush()` wraps this with the catch-up loop. A device failure
        (tunnel flap, preemption) loses the HBM rings; the tick then
        rebuilds every session from its host shadow and retries once —
        no audio and no emitted-frame continuity is lost.
        """
        t0 = time.perf_counter()
        try:
            out = self._tick_impl(final_ids=final_ids, _retry=_retry)
        finally:
            # count FAILED ticks too (retry exhausted): a /metrics scrape
            # after a device fault must show the tick and its (worst-case)
            # latency, not just the ring_recoveries side effect
            with self._metrics_lock:
                self._tick_times.append(time.perf_counter() - t0)
                self._counters["ticks"] += 1
        n = sum(out.values())
        if n:
            with self._metrics_lock:
                self._counters["decode_ticks"] += 1
                self._counters["frames_out"] += n
        return out

    def metrics_snapshot(self) -> dict:
        """Ops counters + recent tick-latency percentiles (last ≤512 ticks).

        decode_ticks counts ticks that finalized ≥1 frame; watchdog_flips
        counts fused→two-dispatch fallbacks; ring_recoveries counts device
        failures survived by the host-shadow rebuild. Served over HTTP as
        GET /metrics (inference/server.py)."""
        with self._metrics_lock:
            times = np.asarray(self._tick_times, dtype=float) * 1e3
            snap = dict(self._counters)
        snap.update(
            live_sessions=self.n_active,
            max_sessions=self.max_sessions,
            fused_decode=self.fused,
            tick_p50_ms=round(float(np.percentile(times, 50)), 2)
            if times.size else None,
            tick_p95_ms=round(float(np.percentile(times, 95)), 2)
            if times.size else None,
            tick_max_ms=round(float(times.max()), 2) if times.size else None,
        )
        return snap

    def _tick_impl(self, *, final_ids=(), _retry: bool = True
                   ) -> dict[int, int]:
        final_ids = set(final_ids)
        # snapshot: the watchdog below may flip self.fused for FUTURE ticks;
        # this tick's branching must stay consistent throughout
        fused = self.fused
        work = [(sid, st) for sid, st in self._sessions.items()
                if self._needs_tick(st, sid in final_ids)]
        if not work:
            return {}

        k = session_bucket(len(work))
        P = self.push_capacity
        # upload dtype: raw int16 (half the bytes; widened on device) when
        # every queued piece this tick is int16, else fp32 with int16 pieces
        # widened on host — one program variant per dtype, both warmed
        pieces = [p for _, st in work for p in st.pending]
        # an EMPTY upload's dtype is semantically irrelevant (zeros widen to
        # zeros) but picks the program variant — an s16-only deployment must
        # ride its warmed int16 signatures on idle/flush ticks too
        use_i16 = (all(p.dtype == np.int16 for p in pieces) if pieces
                   else self._empty_i16)
        if not use_i16:
            for _, st in work:
                st.pending = [
                    p.astype(np.float32) / 32768.0 if p.dtype == np.int16
                    else p for p in st.pending]
        new = np.zeros((k, P), np.int16 if use_i16 else np.float32)
        # padding rows (i >= len(work)) target row K_cap — out of range, so
        # the tick program's scatter drops their (all-zero) writes
        idx = np.full(k, len(self._buf), np.int32)
        shift = np.zeros(k, np.int32)
        buf_len = np.zeros(k, np.int32)
        new_len = np.zeros(k, np.int32)
        feat_start = np.zeros(k, np.int32)
        offsets, takes = [], []
        # fused decode entries: (work-row index, sid, plan) per ready window
        dec_entries: list[tuple[int, int, tuple]] = []

        for i, (sid, st) in enumerate(work):
            # trim first (frees intake room; renumbers the assembler)
            excess = st.asm.consumed - self.trim_margin
            sh = 0
            if excess >= self.trim_threshold:
                sh = excess * self._frame_samples
                st.asm.shift(excess)
            # intake: what fits this tick; the rest stays queued
            room = self._s_avail - (st.buf_len - sh)
            take = 0
            if st.pending:
                queued = np.concatenate(st.pending)
                take = min(len(queued), P, max(0, room))
                if take:
                    new[i, :take] = queued[:take]
                st.pending = [queued[take:]] if take < len(queued) else []
            fs_req = max(0, st.asm.consumed)
            fs_eff = min(fs_req, self._t60_cap - self.f_win)
            idx[i] = st.row
            shift[i] = sh
            buf_len[i] = st.buf_len
            new_len[i] = take
            feat_start[i] = fs_eff
            offsets.append(fs_req - fs_eff)
            takes.append(take)
            # keep the host shadow identical to the post-tick ring content
            # (intake already matches asm.shift above, so a recovery rebuild
            # preserves buffer-space indices and emitted-frame continuity);
            # the shadow always holds WIDENED floats — the ring's dtype
            if sh or take:
                taken = new[i, :take]
                if taken.dtype == np.int16:
                    taken = taken.astype(np.float32) / 32768.0
                st.shadow = np.concatenate([st.shadow[sh:], taken])
            if fused:
                # single-window plan from post-intake state, decoded ON
                # DEVICE this tick (the assembler holds no features)
                t60_new = self._t60_valid(st.buf_len - sh + take)
                plan = st.asm.plan_next(
                    t60_new, final=(sid in final_ids and not st.pending))
                if plan is not None:
                    dec_entries.append((i, sid, plan))

        # decode-row sub-batch: bucket the ready count, bounded by the cap —
        # rows past the cap stay ready and decode next tick (plan_next is
        # pure; nothing was consumed for a deferred row)
        d = 0
        if fused and dec_entries:
            dcap = min(self.decode_bucket_cap or k, k)
            if len(dec_entries) > dcap:
                # fairness under sustained overload (ready rate > cap):
                # serve least-recently-decoded sessions first. The stable
                # sort keeps open-order among equal stamps, so this is
                # round-robin in steady state; truncating raw work order
                # instead would starve late-opened sessions forever.
                dec_entries.sort(key=lambda e: work[e[0]][1].last_dec)
                dec_entries = dec_entries[:dcap]
            d = session_bucket(len(dec_entries))
            dec_idx = np.zeros(d, np.int32)
            win_start = np.zeros(d, np.int32)
            win_take = np.zeros(d, np.int32)
            for j, (i, _sid, plan) in enumerate(dec_entries):
                dec_idx[j] = i
                win_start[j], win_take[j] = plan[0], plan[1]

        before = {sid: st.asm.frames_ready for sid, st in work}
        t0 = time.perf_counter()
        try:
            if fused and not dec_entries:
                # intake-only tick (the common case at live cadence: a
                # window completes only every ~1.9 s of audio) — update the
                # rings, skip the frontend+decode entirely
                self._buf = _tick_ring_only(
                    self._buf, jnp.asarray(idx), jnp.asarray(new),
                    jnp.asarray(shift), jnp.asarray(buf_len),
                    jnp.asarray(new_len))
                decoded = None
            elif fused:
                self._buf, decoded = _tick_fused(
                    self.params, self._buf, jnp.asarray(idx),
                    jnp.asarray(new), jnp.asarray(shift),
                    jnp.asarray(buf_len), jnp.asarray(new_len),
                    jnp.asarray(dec_idx), jnp.asarray(win_start),
                    jnp.asarray(win_take), sr=self.cfg.sr, cfg=self.cfg)
                decoded = np.asarray(decoded, dtype=np.float64)
            else:
                self._buf, wins = _tick_program(
                    self._buf, jnp.asarray(idx), jnp.asarray(new),
                    jnp.asarray(shift), jnp.asarray(buf_len),
                    jnp.asarray(new_len), jnp.asarray(feat_start),
                    sr=self.cfg.sr, f_win=self.f_win,
                    feat_dtype=self._feat_dtype)
                wins = np.asarray(wins)
        except Exception as e:
            if not _retry:
                raise
            print(f"serving tick failed ({e!r}) — rebuilding device rings "
                  "from host shadows and retrying")
            self._recover_rings()
            # _tick_impl, not tick: the retry stays inside the caller's
            # timing/counter window instead of double-counting a tick
            return self._tick_impl(final_ids=final_ids, _retry=False)

        dt = time.perf_counter() - t0
        # first use of a fused program signature (session bucket × upload
        # dtype) legitimately pays its XLA compile when warmup() didn't
        # cover it (--no_warmup, or a bucket outside the warmed set) —
        # exempt it so a 30 s+ cold compile isn't misread as a stall and
        # doesn't permanently downgrade the streamer the operator chose.
        # (Intake-only ticks don't fetch, so a stall there surfaces at —
        # and is bounded by — the next decode tick's fetch; the budget
        # applies to fetch-bearing ticks by design.)
        sig = (k, new.dtype.str, d)
        first_use = fused and sig not in self._fused_seen
        if fused:
            self._fused_seen.add(sig)
        # While the background warmup ramp is alive, a warmed tick can
        # legitimately queue behind one in-flight warmup execution (20-50 s
        # for a big program through the tunnel) — that is contention, not a
        # stall of the fused family, so don't let it permanently downgrade
        # the streamer the ramp is trying to speed up.
        ramp_alive = self._bg_warmer is not None and self._bg_warmer.is_alive()
        if (fused and not first_use and self.stall_watchdog_s is not None
                and dt > self.stall_watchdog_s and ramp_alive):
            print(f"serving tick took {dt:.1f} s (watchdog budget "
                  f"{self.stall_watchdog_s:.0f} s) during background warmup "
                  "— attributed to warmup contention, watchdog exempted "
                  "while the ramp runs")
        elif (fused and not first_use and self.stall_watchdog_s is not None
                and dt > self.stall_watchdog_s):
            print(f"serving tick took {dt:.1f} s (watchdog budget "
                  f"{self.stall_watchdog_s:.0f} s) — switching this streamer "
                  "to the two-dispatch tick family (fused_decode=False) for "
                  "subsequent ticks; the stall family is the fused program "
                  "(docs/PERF.md rare-stall note)")
            self._counters["watchdog_flips"] += 1
            self.fused = False

        if fused:
            for i, (sid, st) in enumerate(work):
                st.buf_len = int(buf_len[i]) - int(shift[i]) + takes[i]
            if dec_entries:
                self._dec_seq += 1
            for j, (i, sid, plan) in enumerate(dec_entries):
                work[i][1].asm.apply([plan], decoded[j][None])
                work[i][1].last_dec = self._dec_seq
            return {sid: st.asm.frames_ready - before[sid]
                    for sid, st in work}

        # unfused: ingest the feature windows + plan per session, then ONE
        # cross-session batched decode
        all_windows, plan_of = [], []
        for i, (sid, st) in enumerate(work):
            st.buf_len = int(buf_len[i]) - int(shift[i]) + takes[i]
            t60 = self._t60_valid(st.buf_len)
            fs_req = int(feat_start[i]) + offsets[i]
            rows = min(self.f_win - offsets[i], t60 - fs_req)
            if rows > 0:
                st.asm.ingest(wins[i][offsets[i]: offsets[i] + rows],
                              base=fs_req)
            plans = st.asm.plan(final=(sid in final_ids
                                       and not st.pending
                                       and t60 - fs_req <= rows))
            if plans:
                all_windows.append(st.asm.windows(plans))
                plan_of.append((st, plans))

        if all_windows:
            decoded = decode_chunks_batched(
                self.params, np.concatenate(all_windows), self.cfg)
            at = 0
            for (st, plans), w in zip(plan_of, all_windows):
                st.asm.apply(plans, decoded[at: at + len(w)])
                at += len(w)
        return {sid: st.asm.frames_ready - before[sid] for sid, st in work}

    def _recover_rings(self) -> None:
        """Rebuild after a device fault lost the HBM rings: fresh zero
        buffer; every session's shadow (== its exact pre-fault ring content,
        so buffer-space indices and the consumption cursor stay valid) is
        re-queued ahead of any still-pending audio and re-uploaded over the
        following ticks through the normal intake path."""
        self._counters["ring_recoveries"] += 1
        self._buf = jnp.zeros((self._kcap, self._s_cap), jnp.float32)
        for st in self._sessions.values():
            if len(st.shadow):
                st.pending = [st.shadow] + st.pending
                st.shadow = np.zeros(0, np.float32)
            st.buf_len = 0

    def flush(self, sid: int, *, max_ticks: int = 1000) -> int:
        """Finalize everything the session buffered; returns frames added."""
        st = self._sessions[sid]
        before = st.asm.frames_ready
        for _ in range(max_ticks):
            self.tick(final_ids=(sid,))
            if (not st.pending
                    and self._t60_valid(st.buf_len) <= st.asm.consumed):
                break
        else:
            raise RuntimeError("flush did not converge")
        ready_pre_finish = st.asm.frames_ready
        st.asm.finish()
        # frames released by finish() (e.g. a smooth session's held-back
        # lookahead frame) bypass tick()'s return dict — count them here or
        # the frames_out metric permanently undercounts per smooth stream
        self._counters["frames_out"] += st.asm.frames_ready - ready_pre_finish
        return st.asm.frames_ready - before

    # -- warmup --------------------------------------------------------------

    def warmup(self, warm_fallback: bool = True, parallel: int = 1,
               push_dtypes: tuple | None = None,
               background_fallback: bool = False,
               serve_buckets: int | None = None) -> int:
        """Pre-compile AND pre-execute every program a deployment can touch:
        the tick program at each active-session bucket (× each warmed push
        dtype × each reachable decode bucket, plus the ring-only intake
        tick), plus the decode program at each window bucket for the
        two-dispatch family. Returns the number of executables warmed.

        push_dtypes: which upload-dtype program variants to warm — "f32"
        (float32 pushes) and/or "s16" (raw int16 PCM pushes); None uses
        the constructor's push_formats. A deployment that accepts one
        format (server --audio_format) halves the fused family (e.g.
        ~50 → ~28 programs at max_sessions=40 — the dominant cold-start
        cost, docs/SERVING.md). A push in an unwarmed dtype still works:
        its first tick compiles lazily and the watchdog exempts a
        signature's first use.

        warm_fallback (fused mode only): also warm the two-dispatch family
        the stall watchdog falls back to, so a mid-session flip costs one
        slow tick — not a live session stalled behind fresh XLA compiles of
        the whole fallback program set. False trades that safety for a
        faster warmup (the persistent cache usually absorbs the flip cost
        on a machine that has ever run two-dispatch mode).

        serve_buckets (opt-in; server --serve_buckets N — fused mode only,
        ignored with a note otherwise): PROGRESSIVE warmup. Eagerly warm
        only the session-bucket rungs a fresh deployment can reach first
        (k ≤ bucket(N), with their full decode ladders and ring ticks) and
        return — then ramp the remaining rungs ASCENDING on the daemon
        thread while traffic runs, committing each rung's signatures as
        its programs are forced. Capacity grows as the warmer climbs; a
        burst of opens that outruns it degrades to the lazy-compile path
        every unwarmed signature already tolerates (first-use watchdog
        exemption above). Measured cold at max_sessions=32/s16/cap-16:
        full eager warmup is 1192 s time-to-serve; the first rungs are
        minutes (docs/PERF.md r4). Implies the fallback family is also
        deferred (after the last rung).

        background_fallback (opt-in; server --background_warmup): return
        as soon as the FUSED family — everything live ticks can touch —
        is warmed and forced, and warm the fallback family on a daemon
        thread while traffic runs. The fallback programs are pure
        insurance (used only after a watchdog flip, which by design
        already costs one slow tick), so deferring them off the
        time-to-serve path is free of live-path compile risk; a flip that
        races the warmer simply waits for it (`wait_background_warmup`)
        or pays the lazy compile the flip path always tolerated. The
        D-ladder itself is NOT prunable: every warmed (k-bucket,
        push-dtype, d-bucket ≤ decode_bucket_cap) signature is reachable
        by a live tick (d = bucket(ready rows), ready ≤ min(cap, k), and
        each d ≤ dmax has a ready count mapping to it).

        parallel: cold-start compiles are client-CPU-bound (~10-20 s of XLA
        per big program, serialized by a single dispatch thread); >1 runs
        the warm thunks on a thread pool to overlap the compiles across
        cores (jit is thread-safe; each thunk builds its own buffers, so no
        donated array is shared — exercised at 4 by the CPU test suite).
        The default stays SERIAL: the one attempt to validate parallel
        warmup through the axon tunnel coincided with a multi-hour tunnel
        wedge, so its RPC concurrency remains unproven on that backend.

        The scalar fetches (the `pending` force pass) are LOAD-BEARING, not
        debris: a jit dispatch through this rig's remote-execution tunnel
        defers the real first-execution cost (~20-50 s per big program)
        until a result is actually demanded. Warmup used to dispatch the
        fused family without ever fetching, so the process's FIRST real
        decode fetch paid the entire warmup backlog — the long-mysterious
        "rare fused stall" (39-806 s observed; reproduced 3/3 at 184-395 s
        once the trigger was understood, docs/PERF.md r3). The two-dispatch
        family never stalled precisely because its warmup fetches
        synchronously. Each thunk returns only a scalar GATHER of its
        program's output (retaining every [K_cap, S_cap] ring output until
        the drain would hold ~GBs of HBM at large max_sessions); the drain
        pass then forces the gathers — executions on one device retire in
        dispatch order, so the whole backlog lands before warmup returns."""
        if push_dtypes is None:
            push_dtypes = self.push_formats
        push_dtypes = _validate_formats("push_dtypes", push_dtypes)
        rng = np.random.default_rng(0)
        kcap = self._kcap
        cfg = self.cfg
        #: fused mode: one (k_bucket, thunks, sigs) group per ladder rung,
        #: so progressive warmup can cut the ladder at serve_buckets and
        #: ramp the rest ascending. Each thunk dispatches one program and
        #: returns a scalar gather.
        groups = []
        thunks = []   # two-dispatch mode: the (flat) live family
        #: fallback-family thunks (two-dispatch ticks + decode buckets) —
        #: deferred to a daemon thread when background_fallback or
        #: serve_buckets is set and the live family is fused; in
        #: two-dispatch mode these ARE the live family and always stay eager
        fb_thunks = []
        #: fused signatures are committed to _fused_seen only AFTER a drain
        #: pass proves their programs actually executed. Marking at
        #: thunk-build time would, on a warmup that dies partway (a tunnel
        #: flap) with a caller that catches and serves anyway, flag
        #: still-cold signatures as warmed — their first live tick then
        #: pays the 20-50 s cold compile WITH the watchdog armed, and the
        #: compile is misread as a stall (a permanent fused→two-dispatch
        #: flip: exactly what the first-use exemption exists to prevent).
        k = 1
        while True:
            g_thunks, g_sigs = [], []
            # the requested upload-dtype variants: fp32 and/or raw-int16
            noise = rng.standard_normal((k, self.push_capacity))
            variants = []
            if "f32" in push_dtypes:
                variants.append(np.asarray(noise * 0.1, np.float32))
            if "s16" in push_dtypes:
                variants.append(np.asarray(noise * 3000, np.int16))
            for new in variants:
                if self.fused:
                    # decode-bucket ladder this k bucket can hit live:
                    # D = bucket(ready rows) ≤ bucket(min(cap, k))
                    dmax = session_bucket(
                        min(self.decode_bucket_cap or k, k))
                    dl = 1
                    while True:
                        def _warm_fused(k=k, new=new, d=dl):
                            _, dec = _tick_fused(
                                self.params,
                                jnp.zeros((kcap, self._s_cap), jnp.float32),
                                jnp.arange(k, dtype=jnp.int32),
                                jnp.asarray(new), jnp.zeros(k, jnp.int32),
                                jnp.zeros(k, jnp.int32),
                                jnp.full(k, self.push_capacity, jnp.int32),
                                jnp.arange(d, dtype=jnp.int32) % k,
                                jnp.zeros(d, jnp.int32),
                                jnp.full(d, cfg.frame_size, jnp.int32),
                                sr=cfg.sr, cfg=cfg)
                            return dec[0, 0, 0]

                        g_thunks.append(_warm_fused)
                        # warmed signatures get full watchdog protection
                        # from their very first live tick
                        g_sigs.append((k, new.dtype.str, dl))
                        if dl >= dmax:
                            break
                        dl = session_bucket(dl + 1)

                    # intake-only variant (most live ticks decode nothing)
                    def _warm_ring(k=k, new=new):
                        rb = _tick_ring_only(
                            jnp.zeros((kcap, self._s_cap), jnp.float32),
                            jnp.arange(k, dtype=jnp.int32), jnp.asarray(new),
                            jnp.zeros(k, jnp.int32), jnp.zeros(k, jnp.int32),
                            jnp.full(k, self.push_capacity, jnp.int32))
                        return rb[0, 0]

                    g_thunks.append(_warm_ring)
                    g_sigs.append((k, new.dtype.str, 0))
                if not self.fused or warm_fallback:
                    def _warm_tick(k=k, new=new):
                        _, wins = _tick_program(
                            jnp.zeros((kcap, self._s_cap), jnp.float32),
                            jnp.arange(k, dtype=jnp.int32),
                            jnp.asarray(new),
                            jnp.zeros(k, jnp.int32),
                            jnp.zeros(k, jnp.int32),
                            jnp.full(k, self.push_capacity, jnp.int32),
                            jnp.zeros(k, jnp.int32),
                            sr=cfg.sr, f_win=self.f_win,
                            feat_dtype=self._feat_dtype)
                        return wins[0, 0, 0]

                    (fb_thunks if self.fused else thunks).append(_warm_tick)
            if self.fused:
                groups.append((k, g_thunks, g_sigs))
            if k >= kcap:
                break
            k = session_bucket(k + 1)  # walk the ladder, not just pow2

        if not self.fused or warm_fallback:
            # worst case per session per tick: a full f_win backlog during a
            # flush plans ceil((f_win - overlap) / stride) windows plus the
            # final tail (3 at the 256/128/16 defaults) — warm every
            # power-of-two decode bucket up to all sessions hitting it at once
            stride = cfg.frame_size - cfg.overlap
            per_session = max(1, -(-(self.f_win - cfg.overlap) // stride) + 1)
            m = 1
            while m <= pow2_bucket(kcap * per_session):
                chunk = rng.standard_normal(
                    (m, cfg.frame_size, cfg.input_dim)).astype(np.float32)

                def _warm_decode(chunk=chunk):
                    # sync by construction (returns np)
                    decode_chunks_batched(self.params, chunk, cfg)
                    return None

                (fb_thunks if self.fused else thunks).append(_warm_decode)
                m *= 2

        def _run(batch):
            workers = max(1, min(parallel, len(batch), os.cpu_count() or 1))
            if workers > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(workers) as ex:
                    pending = [g for g in ex.map(lambda f: f(), batch)
                               if g is not None]
            else:
                pending = [g for g in (f() for f in batch) if g is not None]
            for g in pending:
                float(g)  # force the deferred execution chain behind it

        # split the fused ladder at serve_buckets (progressive warmup)
        eager_upto = None
        if serve_buckets is not None:
            if not isinstance(serve_buckets, int) or serve_buckets < 1:
                raise ValueError(
                    f"serve_buckets={serve_buckets!r}: must be a positive "
                    "int (the session count to warm eagerly)")
            if self.fused:
                eager_upto = session_bucket(min(serve_buckets, kcap))
            else:
                print("warmup: serve_buckets ignored — the two-dispatch "
                      "family is the live family and warms eagerly")
        deferred_groups = []
        eager_sigs = []
        for gk, g_thunks, g_sigs in groups:
            if eager_upto is not None and gk > eager_upto:
                deferred_groups.append((gk, g_thunks, g_sigs))
            else:
                thunks.extend(g_thunks)
                eager_sigs.extend(g_sigs)
        defer_fb = bool((background_fallback or deferred_groups)
                        and self.fused and fb_thunks)
        if not defer_fb:
            thunks = thunks + fb_thunks
        _run(thunks)
        # every eager thunk demonstrably executed — NOW the signatures warm.
        # The frozen snapshot is what warmed EAGERLY (taken before the
        # background thread can race more commits into _fused_seen) —
        # tests/operators inspect it to verify the progressive contract.
        self._fused_seen.update(eager_sigs)
        self.last_eager_sigs = frozenset(eager_sigs)
        if deferred_groups or defer_fb:
            import threading

            def _bg():
                # remaining fused rungs ASCENDING — capacity ramps in the
                # order real session counts grow; each rung's signatures
                # commit only after its drain pass, same contract as eager.
                # Each thunk is dispatched AND forced before the next one
                # starts (_run of a single thunk): executions retire in
                # dispatch order and a big program's first execution costs
                # 20-50 s through the tunnel (docs/PERF.md r3), so batching
                # a whole rung's dispatches would let a live tick's fetch
                # queue behind the entire rung's deferred-execution backlog;
                # serializing bounds that queue to at most one warmup
                # execution (and tick() additionally exempts the watchdog
                # while this thread is alive).
                for gk, g_thunks, g_sigs in deferred_groups:
                    if not self.fused:
                        # a watchdog flip mid-ramp means the streamer can no
                        # longer use fused programs — stop spending device
                        # time on them and go straight to the two-dispatch
                        # family the live ticks now run on
                        print("background warmup: fused ticks disabled — "
                              f"skipping session buckets ≥ {gk}")
                        break
                    try:
                        for f in g_thunks:
                            _run([f])
                    except Exception as e:  # noqa: BLE001 — ramp warming
                        # must never kill serving; this rung's first live
                        # tick pays the lazy compile it already tolerated
                        print(f"background warmup of session bucket {gk} "
                              f"failed: {e!r}")
                        continue
                    self._fused_seen.update(g_sigs)
                if defer_fb:
                    try:
                        for f in fb_thunks:
                            _run([f])
                    except Exception as e:  # noqa: BLE001 — insurance
                        print(f"background fallback warmup failed: {e!r}")

            self._bg_warmer = threading.Thread(
                target=_bg, name="neurosync-fallback-warmup", daemon=True)
            self._bg_warmer.start()
        return len(thunks)

    #: background fallback-warmup thread (None until warmup(...,
    #: background_fallback=True) starts one)
    _bg_warmer = None
    #: frozen snapshot of the signatures the last warmup() committed
    #: EAGERLY (before any background ramp) — None until warmup() runs
    last_eager_sigs = None

    def wait_background_warmup(self, timeout: float | None = None) -> bool:
        """Join the background fallback warmer; True when it has finished
        (or never ran). Soaks/tests use this to assert the fallback family
        is warm before injecting a watchdog flip."""
        if self._bg_warmer is not None:
            self._bg_warmer.join(timeout)
            return not self._bg_warmer.is_alive()
        return True
