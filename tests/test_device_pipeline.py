"""Device-resident serving pipeline == host serving path, over many lengths.

The device pipeline (inference/device_pipeline.py) fuses upload → frontend →
chunk gather → decode → overlap blend → ÷100 into one jit program; the host
path (inference/chunked.py + inference/api.py) is the reference-exact oracle
(itself pinned against a literal serial reimplementation of the reference
loop in test_inference.py).
"""

import io
import wave

import numpy as np
import pytest

import jax

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.data.processing import extract_audio_features
from neurosync_trainer_lite_tpu.inference.api import (
    generate_facial_data_from_bytes,
)
from neurosync_trainer_lite_tpu.inference.chunked import process_audio_features
from neurosync_trainer_lite_tpu.inference.device_pipeline import (
    generate_facial_data_from_bytes_device,
    infer_waveform_device,
)
from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq
from neurosync_trainer_lite_tpu.utils.audio_io import audio_to_bytes

CFG = Config(hidden_dim=64, n_layers=1, num_heads=2, dropout=0.0,
             use_amp=False)


@pytest.fixture(scope="module")
def params():
    return init_seq2seq(jax.random.PRNGKey(0), CFG)


def _host_path(y: np.ndarray, params) -> np.ndarray:
    feats, _ = extract_audio_features(y, CFG.sr)
    return process_audio_features(np.asarray(feats), params, CFG)


@pytest.mark.parametrize("seconds", [0.3, 1.0, 2.2, 3.5, 6.0])
def test_device_pipeline_matches_host_path(params, seconds):
    rng = np.random.default_rng(int(seconds * 10))
    y = rng.standard_normal(int(CFG.sr * seconds)).astype(np.float32)
    y /= np.max(np.abs(y))

    host = _host_path(y, params)
    dev = infer_waveform_device(y, params, CFG, normalized=True)
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-6)


def test_device_pipeline_too_short_returns_none(params):
    y = np.zeros(100, np.float32)
    assert infer_waveform_device(y, params, CFG) is None


def test_int16_upload_matches_host_loader(params):
    rng = np.random.default_rng(7)
    i16 = (rng.standard_normal(int(CFG.sr * 1.5)) * 12000).astype(np.int16)

    # host loader semantics: /32768 then peak-normalize (utils/audio_io.py)
    y = i16.astype(np.float32) / 32768.0
    y /= np.max(np.abs(y))
    host = _host_path(y, params)

    dev = infer_waveform_device(i16, params, CFG)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-6)


def test_bytes_entry_fast_path_matches_api(params):
    rng = np.random.default_rng(3)
    y = rng.standard_normal(int(CFG.sr * 1.2)).astype(np.float32) * 0.5
    wav = audio_to_bytes(y, CFG.sr)  # 16-bit mono WAV at sr → int16 fast path

    host = generate_facial_data_from_bytes(wav, params, CFG)
    dev = generate_facial_data_from_bytes_device(wav, params, CFG)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-6)

    host_s = generate_facial_data_from_bytes(wav, params, CFG,
                                             use_smoothing=True)
    dev_s = generate_facial_data_from_bytes_device(wav, params, CFG,
                                                   use_smoothing=True)
    np.testing.assert_allclose(dev_s, host_s, rtol=2e-4, atol=2e-6)


def test_bytes_entry_resample_fallback_matches_api(params):
    # a 44.1 kHz WAV is not the capture rate → decodes through the host
    # loader (resample) before the device program
    rng = np.random.default_rng(4)
    y = rng.standard_normal(44100).astype(np.float32) * 0.5
    pcm = np.clip(y * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(pcm.tobytes())
    wav = buf.getvalue()

    host = generate_facial_data_from_bytes(wav, params, CFG)
    dev = generate_facial_data_from_bytes_device(wav, params, CFG)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-6)


def test_decode_program_reuses_compile_cache_across_lengths(params):
    """The expensive decode program must cache on shape buckets, not on the
    clip length: many distinct lengths inside one (feature-bucket,
    chunk-bucket) pair → exactly one new cache entry."""
    from neurosync_trainer_lite_tpu.inference import device_pipeline as dp

    before = dp._infer_bucketed._cache_size()
    rng = np.random.default_rng(0)
    # 3.0–3.6 s: same sample bucket (2^19) and chunk bucket (2 chunks)
    for seconds in (3.0, 3.2, 3.4, 3.6):
        y = rng.standard_normal(int(CFG.sr * seconds)).astype(np.float32)
        out = dp.infer_waveform_device(y, params, CFG, normalized=True)
        assert out is not None
    assert dp._infer_bucketed._cache_size() <= before + 1


def test_bad_input_does_not_trip_device_breaker(params):
    """A malformed request is an INPUT error: it must surface to the caller
    without permanently disabling the (3x faster) device pipeline for the
    process — the sticky breaker is for DEVICE failures only."""
    from neurosync_trainer_lite_tpu.inference import api

    api._device_pipeline_broken = False
    with pytest.raises(Exception):
        generate_facial_data_from_bytes(b"definitely not audio", params, CFG)
    assert api._device_pipeline_broken is False


def test_transient_device_fault_does_not_trip_breaker(params, monkeypatch):
    """One transient device failure (link flap, preemption) serves that
    request via the host path and RETRIES the device path next request;
    only repeated consecutive failures trip the sticky breaker."""
    from neurosync_trainer_lite_tpu.inference import api
    from neurosync_trainer_lite_tpu.inference import device_pipeline as dp

    api._device_pipeline_broken = False
    api._device_failures = 0
    y = np.random.default_rng(4).standard_normal(CFG.sr * 3).astype(np.float32)
    wav = audio_to_bytes(y * 0.3, CFG.sr)

    calls = {"n": 0}
    real = dp.infer_waveform_device

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient link flap")
        return real(*a, **k)

    monkeypatch.setattr(dp, "infer_waveform_device", flaky)
    try:
        out = generate_facial_data_from_bytes(wav, params, CFG)  # host serves
        assert len(out) > 0
        assert not api._device_pipeline_broken
        out = generate_facial_data_from_bytes(wav, params, CFG)  # device again
        assert calls["n"] == 2 and not api._device_pipeline_broken
        assert api._device_failures == 0  # success reset the counter

        monkeypatch.setattr(
            dp, "infer_waveform_device",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("dead")))
        generate_facial_data_from_bytes(wav, params, CFG)
        assert not api._device_pipeline_broken
        generate_facial_data_from_bytes(wav, params, CFG)
        assert api._device_pipeline_broken  # consecutive failures trip it
    finally:
        api._device_pipeline_broken = False
        api._device_failures = 0


def test_tripped_breaker_half_opens_and_recovers(params, monkeypatch):
    """A tripped breaker must not be permanent: after N host-served
    requests it half-opens, retries the device path, and closes again on
    success (ADVICE r2 — the tunnel is flappy; two transient faults in a
    row shouldn't 3x-slow a long-lived server forever)."""
    from neurosync_trainer_lite_tpu.inference import api

    y = np.random.default_rng(5).standard_normal(CFG.sr * 3).astype(np.float32)
    wav = audio_to_bytes(y * 0.3, CFG.sr)
    monkeypatch.setattr(api, "_RETRY_AFTER_N_REQUESTS", 3)
    api._device_pipeline_broken = True
    api._device_failures = api._DEVICE_FAILURE_LIMIT
    api._requests_since_break = 0
    try:
        for i in range(2):  # host-served, breaker still open
            generate_facial_data_from_bytes(wav, params, CFG)
            assert api._device_pipeline_broken
        out = generate_facial_data_from_bytes(wav, params, CFG)  # half-open
        assert len(out) > 0
        assert not api._device_pipeline_broken  # device succeeded → closed
        assert api._device_failures == 0
    finally:
        api.reset_device_pipeline_breaker()


def test_non_int16_integer_pcm_is_full_scale_widened():
    """int32/uint8 PCM must be widened by the dtype's full scale, not
    silently cast to float32 at raw amplitude (ADVICE r2)."""
    from neurosync_trainer_lite_tpu.ops.frontend import (
        extract_audio_features_jax, widen_int_pcm)

    rng = np.random.default_rng(6)
    y16 = (rng.standard_normal(CFG.sr * 2) * 9000).astype(np.int16)
    y32 = (y16.astype(np.int64) << 16).astype(np.int32)  # same signal, int32
    np.testing.assert_allclose(widen_int_pcm(y32),
                               y16.astype(np.float32) / 32768.0, atol=1e-7)
    u8 = np.array([0, 128, 255], np.uint8)  # offset-binary full scale
    np.testing.assert_allclose(widen_int_pcm(u8),
                               [-1.0, 0.0, 127 / 128], atol=1e-7)

    f16, _ = extract_audio_features_jax(y16, CFG.sr)
    f32, _ = extract_audio_features_jax(y32, CFG.sr)
    np.testing.assert_allclose(f32, f16, rtol=1e-3, atol=2e-3)


def test_push_audio_widens_non_int16_integer_pcm():
    """MultiStreamer.push_audio with int32 input must queue [-1,1] floats
    equal to the widened int16 signal, not raw-amplitude casts."""
    from neurosync_trainer_lite_tpu.inference.multi_stream import MultiStreamer

    ms = MultiStreamer(None, CFG, max_sessions=1)
    sid = ms.open()
    rng = np.random.default_rng(7)
    y16 = (rng.standard_normal(1000) * 9000).astype(np.int16)
    y32 = (y16.astype(np.int64) << 16).astype(np.int32)
    ms.push_audio(sid, y32)
    queued = ms._sessions[sid].pending[-1]
    assert queued.dtype == np.float32
    np.testing.assert_allclose(queued, y16.astype(np.float32) / 32768.0,
                               atol=1e-7)
    ms.close(sid)
