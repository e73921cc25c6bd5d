"""Multi-session serving: K batched live streams == K independent streamers."""

import numpy as np
import pytest

import jax

from neurosync_trainer_lite_tpu.config import tiny_config
from neurosync_trainer_lite_tpu.inference.multi_stream import MultiStreamer
from neurosync_trainer_lite_tpu.inference.streaming import BlendshapeStreamer
from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq

TRIM_THRESHOLD, TRIM_MARGIN = 64, 16


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(hidden_dim=32, n_layers=1, num_heads=2)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _single(params, cfg):
    s = BlendshapeStreamer(params, cfg)
    s.TRIM_THRESHOLD_FRAMES = TRIM_THRESHOLD
    s.TRIM_MARGIN_FRAMES = TRIM_MARGIN
    return s


def _multi(params, cfg, **kw):
    kw.setdefault("trim_threshold", TRIM_THRESHOLD)
    kw.setdefault("trim_margin", TRIM_MARGIN)
    kw.setdefault("max_buffer_seconds", 4.0)
    return MultiStreamer(params, cfg, **kw)


@pytest.mark.parametrize("fused", [True, False])
def test_multi_matches_independent_single_streamers(setup, fused):
    """K batched sessions must produce what K independent BlendshapeStreamers
    produce from the same pushes at the same cadence (identical buffer
    contents at every extraction → near-identical features/frames; tolerance
    covers the different pad-bucket reduction orders) — in BOTH tick modes
    (fused on-device window decode and the two-dispatch path)."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    seconds = [5.0, 6.0, 4.2]
    audios = [(rng.standard_normal(int(cfg.sr * s)) * 0.4).astype(np.float32)
              for s in seconds]

    ms = _multi(params, cfg, max_sessions=4, fused_decode=fused)
    sids = [ms.open() for _ in audios]
    singles = [_single(params, cfg) for _ in audios]

    step = cfg.sr // 3
    n_rounds = max(len(a) for a in audios) // step + 1
    for r in range(n_rounds):
        for sid, single, audio in zip(sids, singles, audios):
            chunk = audio[r * step: (r + 1) * step]
            if chunk.size:
                ms.push_audio(sid, chunk)
                single.push_audio(chunk)
        ms.tick()
    for sid, single in zip(sids, singles):
        ms.flush(sid)
        single.flush()

    for sid, single in zip(sids, singles):
        got = ms.pop_frames(sid)
        want = single.pop_frames()
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_decode_bucket_cap_defers_to_next_tick_and_matches_oracle(setup):
    """Fused decode ticks gather only the ready rows into a [D] sub-batch,
    D capped by decode_bucket_cap; when more sessions are ready than the
    cap, the surplus must simply decode on a LATER tick (plan_next is pure
    — nothing is consumed for a deferred row) and the final streams must
    still equal independent single streamers."""
    cfg, params = setup
    rng = np.random.default_rng(31)
    n = 5
    audios = [(rng.standard_normal(int(cfg.sr * 3.0)) * 0.4
               ).astype(np.float32) for _ in range(n)]

    ms = _multi(params, cfg, max_sessions=8, fused_decode=True,
                decode_bucket_cap=2)
    sids = [ms.open() for _ in audios]
    singles = [_single(params, cfg) for _ in audios]

    # feed EVERY session a full window's worth before the first tick, so
    # all 5 are ready simultaneously and the cap must defer 3 of them
    for sid, single, audio in zip(sids, singles, audios):
        ms.push_audio(sid, audio)
        single.push_audio(audio)
    out = ms.tick()
    assert sum(1 for v in out.values() if v > 0) <= 2, \
        "a capped tick decoded more sessions than decode_bucket_cap"
    # deferred sessions drain over subsequent ticks with NO new audio
    for _ in range(6):
        if not ms.tick():
            break
    for sid, single in zip(sids, singles):
        ms.flush(sid)
        single.flush()
        got = ms.pop_frames(sid)
        want = single.pop_frames()
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_decode_cap_is_fair_under_sustained_overload(setup):
    """When every session has a window ready on EVERY tick and the cap binds
    (ready rate > decode_bucket_cap), service must rotate least-recently-
    decoded-first — truncating raw work order would let the earliest-opened
    session(s) monopolize the decode sub-batch and starve the rest."""
    cfg, params = setup
    rng = np.random.default_rng(7)
    n = 4
    ms = _multi(params, cfg, max_sessions=8, fused_decode=True,
                decode_bucket_cap=1)
    sids = [ms.open() for _ in range(n)]

    # preload a deep backlog everywhere so every session stays ready for
    # the whole run (8 s of audio >> 1 window per ~2 s)
    for sid in sids:
        ms.push_audio(
            sid, (rng.standard_normal(int(cfg.sr * 8.0)) * 0.4
                  ).astype(np.float32))

    decodes = {sid: 0 for sid in sids}
    for _ in range(2 * n):
        out = ms.tick()
        assert sum(1 for v in out.values() if v > 0) <= 1
        for sid, v in out.items():
            if v > 0:
                decodes[sid] += 1
    # 8 capped ticks at cap 1 over 4 equally-backlogged sessions: LRU
    # rotation serves everyone ~equally (a decoded window can finalize 0
    # NEW frames when the blend holds back the overlap tail, so allow ±1);
    # work-order truncation would give (8, 0, 0, 0)
    assert all(v >= 1 for v in decodes.values()), decodes
    assert max(decodes.values()) - min(decodes.values()) <= 1, decodes


def test_buffer_below_liveness_floor_is_rejected(setup):
    """A ring too small to hold trim_threshold + trim_margin + frame_size
    frames deadlocks a backlogged session (full ring: no intake room, no
    complete window, trim not yet eligible) — constructing one must raise
    instead of wedging flush() at runtime."""
    cfg, params = setup
    with pytest.raises(ValueError, match="deadlock"):
        MultiStreamer(params, cfg, max_sessions=4,
                      trim_threshold=256, trim_margin=64,
                      max_buffer_seconds=4.0)


def test_invalid_decode_cap_and_push_seconds_rejected(setup):
    """Constructor-time validation: 0/negative caps would silently mean
    'no cap' / truncate from the wrong end (deferring a ready window
    forever), a non-'auto' string would TypeError at tick time, and a
    non-positive push_seconds degrades intake to 1 sample/tick."""
    cfg, params = setup
    # 2.5 (e.g. max_sessions/3 unrounded) would TypeError inside the tick,
    # which the retry path misreads as a device fault; True is an int
    # subclass that reads as cap=1 by accident
    for bad in (0, -1, 2.5, True, "Auto", "none"):
        with pytest.raises(ValueError, match="decode_bucket_cap"):
            MultiStreamer(params, cfg, max_sessions=4,
                          decode_bucket_cap=bad)
    for bad_push in (0.0, -0.5):
        with pytest.raises(ValueError, match="push_seconds"):
            MultiStreamer(params, cfg, max_sessions=4,
                          push_seconds=bad_push)


def test_auto_decode_cap_scales_with_session_count(setup):
    """'auto' sizes the cap to keep decode pace with window production
    (>= K/3.8 at live cadence, bucket-laddered, floor 8) — the measured
    sizing rule from the K=32 capacity soak (docs/PERF.md)."""
    cfg, params = setup
    for k, want in ((4, 8), (8, 8), (16, 8), (24, 8), (32, 16)):
        ms = MultiStreamer(params, cfg, max_sessions=k)
        assert ms.decode_bucket_cap == want, (k, ms.decode_bucket_cap)


def test_deep_backlog_flush_converges_under_decode_cap(setup):
    """The scenario that exposed the liveness floor: sessions accumulate a
    deep host-side backlog (pushes far ahead of ticks), then flush — with a
    floor-respecting ring this must converge and deliver every frame."""
    cfg, params = setup
    rng = np.random.default_rng(11)
    ms = _multi(params, cfg, max_sessions=8, fused_decode=True,
                decode_bucket_cap=2)
    sids = [ms.open() for _ in range(3)]
    for sid in sids:
        # ~12 s queued at once: many ring-fulls' worth of pending audio
        ms.push_audio(sid, (rng.standard_normal(int(cfg.sr * 12.0)) * 0.4
                            ).astype(np.float32))
    for _ in range(4):
        ms.tick()
    for sid in sids:
        ms.flush(sid)
        f = ms.pop_frames(sid)
        # 12 s at 60 fps, minus sub-frame tail rounding
        assert f.shape[0] >= 12 * 60 - 2, f.shape
        ms.close(sid)


def test_push_seconds_shrinks_upload_width_and_matches_oracle(setup):
    """push_seconds bounds the per-tick upload width; queued audio past it
    spills to later ticks through the normal backpressure path, leaving
    the decoded stream identical to a single streamer's."""
    cfg, params = setup
    wide = _multi(params, cfg, max_sessions=2)
    narrow = _multi(params, cfg, max_sessions=2, push_seconds=0.5)
    assert narrow.push_capacity < wide.push_capacity
    assert narrow.push_capacity >= int(0.5 * cfg.sr)

    rng = np.random.default_rng(33)
    audio = (rng.standard_normal(int(cfg.sr * 4.0)) * 0.4).astype(np.float32)
    sid = narrow.open()
    single = _single(params, cfg)
    narrow.push_audio(sid, audio)  # one push ≫ the narrow capacity
    # mirror the multi's actual per-tick intake into the oracle (same
    # pattern as the oversized-push test: identical buffer evolution)
    fed = 0
    for _ in range(100):
        counts = narrow.tick(final_ids=(sid,) if fed >= len(audio) else ())
        pending = narrow._sessions[sid].pending
        taken = len(audio) - (len(pending[0]) if pending else 0)
        assert taken - fed <= narrow.push_capacity
        if taken > fed:
            single.push_audio(audio[fed:taken])
        fed = taken
        if not counts and fed >= len(audio):
            break
    narrow.flush(sid)
    single.flush()
    got = narrow.pop_frames(sid)
    want = single.pop_frames()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("seed", [21, 22])
def test_randomized_schedule_matches_oracle(setup, seed):
    """Fuzz the serving surface: random push sizes (including empty ticks),
    mixed int16/fp32 pushes, and mid-run session churn — every session's
    final stream must match its own BlendshapeStreamer oracle fed the same
    (widened) samples at the same cadence."""
    cfg, params = setup
    rng = np.random.default_rng(seed)
    ms = _multi(params, cfg, max_sessions=3)

    active = {}   # sid -> (oracle, remaining ticks before close)
    done = []
    done_frames = []  # popped counts of closed sessions (metrics check)

    def open_session():
        sid = ms.open()
        active[sid] = (_single(params, cfg), int(rng.integers(6, 14)))

    open_session()
    open_session()
    for r in range(26):
        for sid in list(active):
            single, ttl = active[sid]
            n = int(rng.integers(0, cfg.sr // 2))
            if n:
                if rng.random() < 0.5:   # int16 capture-format push
                    chunk = (rng.standard_normal(n) * 9000).astype(np.int16)
                    ms.push_audio(sid, chunk)
                    single.push_audio(chunk.astype(np.float32) / 32768.0)
                else:
                    chunk = (rng.standard_normal(n) * 0.3).astype(np.float32)
                    ms.push_audio(sid, chunk)
                    single.push_audio(chunk)
            active[sid] = (single, ttl - 1)
        ms.tick()
        for sid in [s for s, (_, ttl) in active.items() if ttl <= 0]:
            single, _ = active.pop(sid)
            ms.flush(sid)
            single.flush()
            got, want = ms.pop_frames(sid), single.pop_frames()
            ms.close(sid)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)
            done.append(sid)
            done_frames.append(len(got))
            if len(active) < 2:
                open_session()
    popped = 0
    for sid, (single, _) in active.items():
        ms.flush(sid)
        single.flush()
        got, want = ms.pop_frames(sid), single.pop_frames()
        popped += len(got)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)
    assert done, "no session completed its lifecycle in the fuzz run"

    # metrics bookkeeping must agree with what the surface delivered:
    # every frame popped (incl. flush-finish tails) was counted, no fault
    # paths fired, and latency percentiles exist for a run this size
    m = ms.metrics_snapshot()
    assert m["frames_out"] == popped + sum(done_frames)
    assert m["decode_ticks"] <= m["ticks"] and m["decode_ticks"] > 0
    assert m["watchdog_flips"] == 0 and m["ring_recoveries"] == 0
    assert m["tick_p95_ms"] >= m["tick_p50_ms"] > 0


def test_stall_watchdog_switches_to_two_dispatch_mid_session(setup):
    """A fused tick over the watchdog budget must flip the streamer to the
    two-dispatch family for subsequent ticks — and the live sessions must
    continue seamlessly (overlap continuity lives in the assembler's pending
    decoded tail, which both families share). Output is compared against an
    untouched fused run."""
    cfg, params = setup
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(int(cfg.sr * 6.0)) * 0.4).astype(np.float32)

    # stall_watchdog_s=-1: every fused tick "breaches", so the very first
    # decoding tick flips the mode — the rest of the stream runs two-dispatch
    ms = _multi(params, cfg, max_sessions=2, fused_decode=True,
                stall_watchdog_s=-1.0)
    ref = _multi(params, cfg, max_sessions=2, fused_decode=True,
                 stall_watchdog_s=None)
    sid, rid = ms.open(), ref.open()

    step = cfg.sr // 3
    for r in range(len(audio) // step + 1):
        chunk = audio[r * step: (r + 1) * step]
        if chunk.size:
            ms.push_audio(sid, chunk)
            ref.push_audio(rid, chunk)
        ms.tick()
        ref.tick()
    assert ms.fused is False      # the watchdog flipped it
    assert ref.fused is True
    # ops counters see the flip (GET /metrics surfaces these)
    m, mr = ms.metrics_snapshot(), ref.metrics_snapshot()
    assert m["watchdog_flips"] == 1 and mr["watchdog_flips"] == 0
    assert m["ticks"] > 0 and m["tick_p50_ms"] is not None
    ms.flush(sid)
    ref.flush(rid)
    got, want = ms.pop_frames(sid), ref.pop_frames(rid)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_stall_watchdog_exempts_first_use_of_a_program_signature(setup):
    """The first tick on a fused program signature (bucket × dtype ×
    decode/ring) may legitimately pay a cold XLA compile when warmup()
    didn't cover it — the watchdog must not read that as a stall; the
    SECOND breach on a now-seen signature must still flip. warmup()
    pre-marks its signatures so warmed deployments keep full protection
    from the first live tick."""
    cfg, params = setup
    rng = np.random.default_rng(11)
    chunk = (rng.standard_normal(cfg.sr // 2) * 0.4).astype(np.float32)

    # no warmup, watchdog -1: every fused tick "breaches" the budget
    ms = _multi(params, cfg, max_sessions=1, fused_decode=True,
                stall_watchdog_s=-1.0)
    sid = ms.open()
    ms.push_audio(sid, chunk)
    ms.tick()  # first use of this tick-program signature → exempt
    assert ms.fused is True, (
        "watchdog flipped on a first-use signature (cold-compile misread)")
    ms.push_audio(sid, chunk)
    ms.tick()  # same signature, second breach → flips
    assert ms.fused is False

    # warmed streamer: signatures pre-marked → the FIRST live breach flips
    ms2 = _multi(params, cfg, max_sessions=1, fused_decode=True,
                 stall_watchdog_s=-1.0)
    ms2.warmup(warm_fallback=False)
    sid2 = ms2.open()
    ms2.push_audio(sid2, chunk)
    ms2.tick()
    assert ms2.fused is False, "warmed signature must keep full protection"


def test_stall_watchdog_exempt_while_background_ramp_alive(setup):
    """While the progressive-warmup ramp thread is alive, a warmed tick can
    queue behind one in-flight warmup execution (dispatch-order retirement)
    — the watchdog must attribute the breach to warmup contention and NOT
    permanently flip the streamer; once the ramp is done, the same breach
    flips as usual."""
    cfg, params = setup
    rng = np.random.default_rng(13)
    chunk = (rng.standard_normal(cfg.sr // 2) * 0.4).astype(np.float32)

    class _Ramp:
        alive = True

        def is_alive(self):
            return self.alive

    ms = _multi(params, cfg, max_sessions=1, fused_decode=True,
                stall_watchdog_s=-1.0)
    ms.warmup(warm_fallback=False)  # signatures pre-marked: no first-use
    ms._bg_warmer = _Ramp()
    sid = ms.open()
    ms.push_audio(sid, chunk)
    ms.tick()  # breach during the ramp → exempt
    assert ms.fused is True, "watchdog flipped during the warmup ramp"
    assert ms.metrics_snapshot()["watchdog_flips"] == 0
    ms._bg_warmer.alive = False
    ms.push_audio(sid, chunk)
    ms.tick()  # ramp done, same breach → flips
    assert ms.fused is False


def test_stall_watchdog_disabled_with_none(setup):
    cfg, params = setup
    ms = _multi(params, cfg, max_sessions=1, fused_decode=True,
                stall_watchdog_s=None)
    sid = ms.open()
    rng = np.random.default_rng(6)
    ms.push_audio(sid, (rng.standard_normal(cfg.sr * 3) * 0.4
                        ).astype(np.float32))
    ms.tick()
    ms.flush(sid)
    assert ms.fused is True


def test_session_rows_are_isolated_and_reused(setup):
    """Closing a session frees its ring row; a new session reusing the row
    must see none of the old audio."""
    cfg, params = setup
    rng = np.random.default_rng(2)
    ms = _multi(params, cfg, max_sessions=2)

    a = ms.open()
    b = ms.open()
    with pytest.raises(RuntimeError):
        ms.open()
    audio_a = (rng.standard_normal(cfg.sr * 3) * 0.4).astype(np.float32)
    audio_b = (rng.standard_normal(cfg.sr * 3) * 0.4).astype(np.float32)
    ms.push_audio(a, audio_a)
    ms.push_audio(b, audio_b)
    ms.tick()
    ms.flush(a)
    frames_a = ms.pop_frames(a)
    row_a = ms._sessions[a].row
    ms.close(a)

    c = ms.open()                       # reuses a's ring row
    assert ms._sessions[c].row == row_a
    ms.push_audio(c, audio_a)
    ms.tick()
    ms.flush(c)
    frames_c = ms.pop_frames(c)
    np.testing.assert_allclose(frames_c, frames_a, atol=2e-4, rtol=2e-3)

    # b was untouched throughout
    ms.flush(b)
    single_b = _single(params, cfg)
    single_b.push_audio(audio_b)
    single_b.flush()
    np.testing.assert_allclose(ms.pop_frames(b), single_b.pop_frames(),
                               atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("fused", [True, False])
def test_oversized_push_backpressures_and_catches_up(setup, fused):
    """A push far beyond the per-tick intake capacity spills to the host
    queue and drains over ticks; the final output equals a single streamer
    fed the same audio in capacity-sized pushes (identical buffer windows).
    The fused tick consumes at most one window per tick, so catch-up takes
    more ticks — the final output must still match."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(cfg.sr * 12) * 0.4).astype(np.float32)

    ms = _multi(params, cfg, max_sessions=2, fused_decode=fused)
    sid = ms.open()
    ms.push_audio(sid, audio)           # ~12 s at once; capacity ≈ 1.5 s
    assert len(audio) > ms.push_capacity

    single = _single(params, cfg)
    fed = 0
    for _ in range(200):
        counts = ms.tick()
        # mirror the multi-streamer's actual intake into the single streamer
        pending = ms._sessions[sid].pending
        taken = len(audio) - (len(pending[0]) if pending else 0)
        assert taken - fed <= ms.push_capacity  # per-tick intake is bounded
        single.push_audio(audio[fed:taken])
        fed = taken
        if not counts and fed >= len(audio):
            break
    ms.flush(sid)
    single.flush()

    got = ms.pop_frames(sid)
    want = single.pop_frames()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("fused", [True, False])
def test_tick_program_cache_bounded_and_warmup_covers_it(setup, fused):
    """The tick program compiles per active-session bucket only; warmup()
    pre-walks every bucket — including, in unfused mode, the decode buckets
    that flush-tail multi-window plans hit — so live ticks never compile."""
    from neurosync_trainer_lite_tpu.inference import multi_stream as M
    from neurosync_trainer_lite_tpu.inference.chunked import _decode_fn

    cfg, params = setup
    ms = _multi(params, cfg, max_sessions=4, fused_decode=fused)
    ms.warmup()
    prog = M._tick_fused if fused else M._tick_program
    after_warm = prog._cache_size()
    decode_after_warm = _decode_fn(cfg)._cache_size()

    rng = np.random.default_rng(4)
    sids = [ms.open() for _ in range(3)]
    for r in range(6):
        for i, sid in enumerate(sids):
            n = cfg.sr // 3 + 997 * (r + i)   # uneven push sizes
            ms.push_audio(
                sid, (rng.standard_normal(n) * 0.4).astype(np.float32))
        ms.tick()
    for sid in sids:
        ms.flush(sid)
        assert ms.pop_frames(sid).shape[1] == cfg.output_dim
    assert prog._cache_size() == after_warm
    assert _decode_fn(cfg)._cache_size() == decode_after_warm


def test_single_format_deployment_warms_half_and_never_compiles_live(setup):
    """An s16-only deployment (server --audio_format s16 → constructor
    push_formats) warms exactly the int16 half of the fused family — the
    dominant cold-start cost — and its live traffic INCLUDING idle/flush
    ticks (whose empty upload buffer must also pick the int16 variant)
    stays inside the warmed program set. Bad format sets are rejected."""
    from neurosync_trainer_lite_tpu.inference import multi_stream as M

    cfg, params = setup
    ms_both = _multi(params, cfg, max_sessions=4)
    n_both = ms_both.warmup(warm_fallback=False)
    seen_both = set(ms_both._fused_seen)

    ms = _multi(params, cfg, max_sessions=4, push_formats=("s16",))
    n_s16 = ms.warmup(warm_fallback=False)
    assert n_s16 == n_both // 2
    # the warmed signatures are exactly the int16 half of the full set
    assert set(ms._fused_seen) == {s for s in seen_both if s[1] == "<i2"}

    # live int16 traffic — pushes, idle ticks (no queued audio), flush —
    # stays inside the warmed program set
    after_warm = M._tick_fused._cache_size()
    sid = ms.open()
    rng = np.random.default_rng(3)
    for i in range(6):
        if i % 3 != 2:  # two pushes, then one idle tick
            pcm = (rng.standard_normal(cfg.sr // 2) * 8000).astype(np.int16)
            ms.push_audio(sid, pcm)
        ms.tick()
    ms.flush(sid)
    assert ms.pop_frames(sid).shape[1] == cfg.output_dim
    assert M._tick_fused._cache_size() == after_warm

    for bad in ((), ("f32", "int16"), ("i2",)):
        with pytest.raises(ValueError, match="push_formats"):
            _multi(params, cfg, max_sessions=4, push_formats=bad)
        with pytest.raises(ValueError, match="push_dtypes"):
            ms.warmup(push_dtypes=bad)


def test_failed_warmup_does_not_mark_signatures_warm(setup):
    """A warmup that dies partway (tunnel flap) must leave _fused_seen
    unchanged: signatures marked warm before their program actually
    executed would lose the watchdog's first-use cold-compile exemption —
    a live cold compile would then be misread as a stall and permanently
    flip the streamer to the two-dispatch family."""
    from neurosync_trainer_lite_tpu.inference import multi_stream as M

    cfg, params = setup
    ms = _multi(params, cfg, max_sessions=4)
    real = M._tick_ring_only
    calls = {"n": 0}

    def dies_on_second(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected tunnel flap")
        return real(*a, **kw)

    M._tick_ring_only = dies_on_second
    try:
        with pytest.raises(RuntimeError, match="injected"):
            ms.warmup(warm_fallback=False)
    finally:
        M._tick_ring_only = real
    assert ms._fused_seen == set()

    # a subsequent successful warmup marks the full family
    n = ms.warmup(warm_fallback=False)
    assert len(ms._fused_seen) == n


def test_warmup_covers_the_watchdog_fallback_family(setup):
    """Fused warmup() warms the two-dispatch family too by default, so a
    stall-watchdog flip mid-session compiles nothing new; warm_fallback=
    False warms only the fused family. The program counts must tile:
    full fused warmup == lean fused warmup + a two-dispatch warmup."""
    cfg, params = setup
    n_full = _multi(params, cfg, max_sessions=2, fused_decode=True).warmup()
    n_lean = _multi(params, cfg, max_sessions=2,
                    fused_decode=True).warmup(warm_fallback=False)
    n_unfused = _multi(params, cfg, max_sessions=2,
                       fused_decode=False).warmup()
    assert 0 < n_lean < n_full
    assert n_full == n_lean + n_unfused


def test_background_fallback_warmup_defers_insurance_compiles(setup):
    """warmup(background_fallback=True) blocks only on the fused (live)
    family — same eager count as warm_fallback=False — and warms the
    two-dispatch fallback family on a daemon thread; once joined, a
    watchdog-style flip to two-dispatch ticks compiles nothing new
    (VERDICT r3 item #7: the fallback set is pure insurance, so it comes
    off the cold time-to-serve path)."""
    from neurosync_trainer_lite_tpu.inference import multi_stream as M
    from neurosync_trainer_lite_tpu.inference.chunked import _decode_fn

    cfg, params = setup
    n_lean = _multi(params, cfg, max_sessions=2,
                    fused_decode=True).warmup(warm_fallback=False)

    ms = _multi(params, cfg, max_sessions=2, fused_decode=True)
    n_eager = ms.warmup(background_fallback=True)
    assert n_eager == n_lean          # fallback family not on the eager path
    assert ms._bg_warmer is not None
    assert ms.wait_background_warmup(120.0)

    # post-join: the fallback programs are compiled — flipping mid-session
    # (what the stall watchdog does) adds no cache entries
    before_tick = M._tick_program._cache_size()
    before_dec = _decode_fn(cfg)._cache_size()
    ms.fused = False
    rng = np.random.default_rng(7)
    sid = ms.open()
    for _ in range(4):
        ms.push_audio(sid, (rng.standard_normal(cfg.sr // 2) * 0.4
                            ).astype(np.float32))
        ms.tick()
    ms.flush(sid)
    assert ms.pop_frames(sid).shape[1] == cfg.output_dim
    assert M._tick_program._cache_size() == before_tick
    assert _decode_fn(cfg)._cache_size() == before_dec

    # degenerate cases: nothing to background
    ms2 = _multi(params, cfg, max_sessions=2, fused_decode=True)
    ms2.warmup(warm_fallback=False, background_fallback=True)
    assert ms2._bg_warmer is None and ms2.wait_background_warmup()
    ms3 = _multi(params, cfg, max_sessions=2, fused_decode=False)
    n3 = ms3.warmup(background_fallback=True)  # two-dispatch IS the live set
    assert ms3._bg_warmer is None and n3 > 0


def test_device_fault_recovers_from_host_shadows(setup, monkeypatch):
    """A device failure mid-session (tunnel flap, preemption) loses the HBM
    rings; the tick must rebuild every session from its host shadow and
    continue — the final stream equals an uninterrupted run."""
    from neurosync_trainer_lite_tpu.inference import multi_stream as M

    cfg, params = setup
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal(cfg.sr * 6) * 0.4).astype(np.float32)
    step = cfg.sr // 2

    def run(fail_at=None):
        real = M._tick_fused   # the default (fused) tick program
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == fail_at:
                raise RuntimeError("simulated device fault")
            return real(*a, **k)

        if fail_at is not None:
            monkeypatch.setattr(M, "_tick_fused", flaky)
        try:
            ms = _multi(params, cfg, max_sessions=2)
            sid = ms.open()
            for i in range(0, len(audio), step):
                ms.push_audio(sid, audio[i: i + step])
                ms.tick()
            ms.flush(sid)
            return ms.pop_frames(sid)
        finally:
            monkeypatch.setattr(M, "_tick_fused", real)

    want = run()
    got = run(fail_at=5)  # mid-stream, after frames have been emitted
    assert got.shape == want.shape
    # CMVN-drift tolerance: windows decoded while the ring is still being
    # re-uploaded see clip stats over the partial buffer (same documented
    # contract as the streamer's buffered-stats drift) — measured max
    # divergence 3.3e-4 on 0.17% of elements
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


def test_int16_pushes_match_widened_float_pushes(setup):
    """int16 PCM pushes (uploaded raw, widened /32768 on device) must equal
    the same audio pushed as pre-widened float32 — including when a float
    push forces the mixed-dtype host-widening path mid-session."""
    cfg, params = setup
    rng = np.random.default_rng(10)
    pcm = (rng.standard_normal(cfg.sr * 4) * 8000).astype(np.int16)
    widened = pcm.astype(np.float32) / 32768.0
    step = cfg.sr // 2

    def run(as_int16, mix_at=None):
        ms = _multi(params, cfg, max_sessions=2)
        sid = ms.open()
        for j, i in enumerate(range(0, len(pcm), step)):
            chunk = pcm[i: i + step] if as_int16 else widened[i: i + step]
            if mix_at is not None and j == mix_at:
                chunk = widened[i: i + step]  # float piece amid int16 ones
            ms.push_audio(sid, chunk)
            ms.tick()
        ms.flush(sid)
        return ms.pop_frames(sid)

    want = run(as_int16=False)
    np.testing.assert_allclose(run(as_int16=True), want,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(run(as_int16=True, mix_at=3), want,
                               atol=1e-5, rtol=1e-4)


def test_open_caps_at_max_sessions_not_ring_capacity(setup):
    """max_sessions=3 rounds its ring to 4 rows; the 4th open() must still
    be refused at the configured limit."""
    cfg, params = setup
    ms = _multi(params, cfg, max_sessions=3)
    for _ in range(3):
        ms.open()
    with pytest.raises(RuntimeError):
        ms.open()


def test_session_smoothing_matches_pair_average(setup):
    """A smooth=True session equals smooth_by_averaging_pairs over the raw
    session's frames — including through the HTTP open flag's semantics."""
    from neurosync_trainer_lite_tpu.inference.api import (
        smooth_by_averaging_pairs)

    cfg, params = setup
    rng = np.random.default_rng(12)
    audio = (rng.standard_normal(cfg.sr * 4) * 0.4).astype(np.float32)
    step = cfg.sr // 2

    ms = _multi(params, cfg, max_sessions=2)
    raw = ms.open()
    smooth = ms.open(smooth=True)
    for i in range(0, len(audio), step):
        ms.push_audio(raw, audio[i: i + step])
        ms.push_audio(smooth, audio[i: i + step])
        ms.tick()
    ms.flush(raw)
    ms.flush(smooth)
    np.testing.assert_allclose(
        ms.pop_frames(smooth),
        smooth_by_averaging_pairs(ms.pop_frames(raw)), atol=1e-12)


def test_bf16_feature_download_is_decode_identical():
    """With a bf16-compute model the tick downloads features as bf16 (half
    the dominant transfer). The decode casts its input to bf16 anyway, so
    bf16(f32(bf16(x))) == bf16(x): a session must match a single
    BlendshapeStreamer (fp32 feature path) to the usual tolerance."""
    cfg = tiny_config(hidden_dim=32, n_layers=1, num_heads=2, use_amp=True)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(13)
    audio = (rng.standard_normal(cfg.sr * 4) * 0.4).astype(np.float32)
    step = cfg.sr // 2

    # the bf16 download exists only on the two-dispatch path — fused ticks
    # never download features at all
    ms = _multi(params, cfg, max_sessions=2, fused_decode=False)
    import jax.numpy as jnp
    assert ms._feat_dtype == jnp.bfloat16
    sid = ms.open()
    single = _single(params, cfg)
    for i in range(0, len(audio), step):
        ms.push_audio(sid, audio[i: i + step])
        single.push_audio(audio[i: i + step])
        ms.tick()
    ms.flush(sid)
    single.flush()
    got, want = ms.pop_frames(sid), single.pop_frames()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_intake_only_ticks_skip_decode(setup, monkeypatch):
    """Most live ticks have no window ready; fused mode must route them
    through the ring-update-only program (no frontend/decode) and still
    produce identical final output."""
    from neurosync_trainer_lite_tpu.inference import multi_stream as M

    cfg, params = setup
    rng = np.random.default_rng(14)
    audio = (rng.standard_normal(cfg.sr * 5) * 0.4).astype(np.float32)
    # tiny pushes: far fewer windows than ticks
    step = cfg.sr // 4

    calls = {"full": 0, "ring": 0}
    real_fused, real_ring = M._tick_fused, M._tick_ring_only
    monkeypatch.setattr(M, "_tick_fused", lambda *a, **k: (
        calls.__setitem__("full", calls["full"] + 1), real_fused(*a, **k))[1])
    monkeypatch.setattr(M, "_tick_ring_only", lambda *a, **k: (
        calls.__setitem__("ring", calls["ring"] + 1), real_ring(*a, **k))[1])

    ms = _multi(params, cfg, max_sessions=2, fused_decode=True)
    sid = ms.open()
    for i in range(0, len(audio), step):
        ms.push_audio(sid, audio[i: i + step])
        ms.tick()
    ms.flush(sid)
    got = ms.pop_frames(sid)

    assert calls["ring"] > calls["full"] > 0, calls

    single = _single(params, cfg)
    single.push_audio(audio)
    single.flush()
    want = single.pop_frames()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


def test_progressive_warmup_serves_small_buckets_first(setup):
    """warmup(serve_buckets=N) blocks only on the session-bucket rungs
    k ≤ bucket(N) — their signatures are watchdog-protected immediately —
    and ramps the remaining rungs ascending on the daemon thread; once
    joined, the warmed-signature set equals a full eager warmup's. Sessions
    opened past the eager rungs before the ramp finishes still serve (the
    lazy first-use path every unwarmed signature already tolerates)."""
    cfg, params = setup

    full = _multi(params, cfg, max_sessions=4, fused_decode=True)
    n_full = full.warmup(warm_fallback=False)
    full_sigs = set(full._fused_seen)

    ms = _multi(params, cfg, max_sessions=4, fused_decode=True)
    n_eager = ms.warmup(warm_fallback=False, serve_buckets=1)
    assert 0 < n_eager < n_full
    # assert on the frozen eager snapshot, not the live _fused_seen set —
    # the background ramp (already running) races commits into the latter
    assert ms.last_eager_sigs  # the first rung is committed…
    assert all(sig[0] <= 1 for sig in ms.last_eager_sigs)  # …and only it
    assert ms._bg_warmer is not None

    # a 3-session burst outruns the ramp: still serves via the lazy path
    rng = np.random.default_rng(11)
    sids = [ms.open() for _ in range(3)]
    for _ in range(4):
        for sid in sids:
            ms.push_audio(sid, (rng.standard_normal(cfg.sr // 2) * 0.4
                                ).astype(np.float32))
        ms.tick()
    for sid in sids:
        ms.flush(sid)
        assert ms.pop_frames(sid).shape[1] == cfg.output_dim
        ms.close(sid)

    # after the ramp joins, coverage equals the full eager warmup
    assert ms.wait_background_warmup(300.0)
    assert full_sigs <= set(ms._fused_seen)

    # validation + degenerate cases
    with pytest.raises(ValueError, match="serve_buckets"):
        _multi(params, cfg, max_sessions=2,
               fused_decode=True).warmup(serve_buckets=0)
    ms2 = _multi(params, cfg, max_sessions=2, fused_decode=False)
    n2 = ms2.warmup(serve_buckets=1)  # two-dispatch: ignored with a note
    assert ms2._bg_warmer is None and n2 > 0
