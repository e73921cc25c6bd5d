"""HTTP serving front-end and the offline inference CLI, driven for real."""

import io
import json
import os
import threading
import urllib.request
import wave

import numpy as np
import pytest

import jax

from neurosync_trainer_lite_tpu.config import tiny_config
from neurosync_trainer_lite_tpu.inference.server import serve
from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq
from neurosync_trainer_lite_tpu.training.checkpoint import save_final_model


def _wav_bytes(sr, seconds=1.5):
    t = np.arange(int(sr * seconds)) / sr
    y = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((y * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def cfg_params():
    cfg = tiny_config(frame_size=32, overlap=8)
    return cfg, init_seq2seq(jax.random.PRNGKey(0), cfg)


def test_http_server_roundtrip(cfg_params):
    cfg, params = cfg_params
    httpd = serve(params, cfg, port=0)  # ephemeral port
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.load(r) == {"ok": True}

        # batch-only server: /metrics must answer WITHOUT instantiating the
        # lazy MultiStreamer (that would compile serving programs for free)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
            assert json.load(r) == {"live_sessions": 0,
                                    "streamer_started": False}

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/audio_to_blendshapes",
            data=_wav_bytes(cfg.sr), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.load(r)
        frames = np.asarray(payload["blendshapes"])
        assert frames.shape[1] == cfg.output_dim
        assert payload["fps"] == 60
        assert 80 <= frames.shape[0] <= 100  # ~90 frames of 1.5 s at 60 fps

        # too-short clip (under the frontend's 9-frame minimum) → 200 with an
        # empty frame list, not a crash on the API's empty tuple signature
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/audio_to_blendshapes",
            data=_wav_bytes(cfg.sr, seconds=0.02), method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.load(r)["blendshapes"] == []

        # bad request → 400, server stays up
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/audio_to_blendshapes",
            data=b"not audio", method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 400
        assert raised

        # oversized or negative Content-Length → 413 before the body is read
        # (negative would make rfile.read block to EOF and wedge the server)
        for bad_len in (str(10 ** 12), "-1"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/audio_to_blendshapes",
                data=b"x", method="POST",
                headers={"Content-Length": bad_len})
            try:
                urllib.request.urlopen(req, timeout=60)
                raised = False
            except urllib.error.HTTPError as e:
                raised = e.code == 413
            except urllib.error.URLError:
                raised = True  # server cut the connection after rejecting
            assert raised, bad_len
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.load(r)["ok"]  # server still alive
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.load(r)["ok"]
    finally:
        httpd.shutdown()


def test_infer_cli(cfg_params, tmp_path):
    cfg, params = cfg_params
    model_path = str(tmp_path / "model.pth")
    save_final_model(params, cfg, model_path)
    wav_path = str(tmp_path / "in.wav")
    with open(wav_path, "wb") as f:
        f.write(_wav_bytes(cfg.sr))
    out_path = str(tmp_path / "out.csv")

    from neurosync_trainer_lite_tpu import infer as infer_cli

    infer_cli.main(["--wav", wav_path, "--model", model_path,
                    "--out", out_path, "--tiny",
                    "--frame_size", str(cfg.frame_size),
                    "--overlap", str(cfg.overlap)])

    assert os.path.exists(out_path)
    import pandas as pd

    df = pd.read_csv(out_path)
    assert df.shape[1] == 2 + 61  # Timecode, BlendshapeCount, 61 dims
    assert len(df) > 0


def test_infer_cli_from_checkpoint_dir(cfg_params, tmp_path):
    """--model accepts an Orbax training checkpoint DIRECTORY (the
    torch-free path) and produces the same CSV as the .pth route."""
    cfg, params = cfg_params
    from neurosync_trainer_lite_tpu.training.checkpoint import save_checkpoint
    from neurosync_trainer_lite_tpu.training.step import init_train_state

    state, _ = init_train_state(cfg, steps_per_epoch=4, params=params)
    ckpt = str(tmp_path / "ckpt" / "checkpoint")
    save_checkpoint(state, epoch=0, batch_step=1, cfg=cfg,
                    checkpoint_path=ckpt)
    wav_path = str(tmp_path / "in.wav")
    with open(wav_path, "wb") as f:
        f.write(_wav_bytes(cfg.sr))
    pth_out, dir_out = str(tmp_path / "pth.csv"), str(tmp_path / "dir.csv")
    model_path = str(tmp_path / "model.pth")
    save_final_model(params, cfg, model_path)

    from neurosync_trainer_lite_tpu import infer as infer_cli

    common = ["--wav", wav_path, "--tiny",
              "--frame_size", str(cfg.frame_size),
              "--overlap", str(cfg.overlap)]
    infer_cli.main(common + ["--model", model_path, "--out", pth_out])
    infer_cli.main(common + ["--model", ckpt, "--out", dir_out])
    import pandas as pd

    a, b = pd.read_csv(pth_out), pd.read_csv(dir_out)
    assert len(b) > 0 and b.shape[1] == 2 + 61
    np.testing.assert_allclose(a.iloc[:, 2:].to_numpy(),
                               b.iloc[:, 2:].to_numpy(), atol=1e-6)


def test_live_session_endpoints(cfg_params):
    """MultiStreamer-backed live sessions over HTTP: open → pushes return
    incrementally finalized frames → flush returns the tail → close frees
    the slot. The full stream must match the one-shot batch endpoint's
    frame count."""
    cfg, params = cfg_params
    httpd = serve(params, cfg, port=0, max_sessions=2)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, data=b"", headers=None):
        req = urllib.request.Request(base + path, data=data, method="POST",
                                     headers=headers or {})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.load(r)

    try:
        sid = post("/session/open")["session"]
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(cfg.sr * 4) * 0.4).astype(np.float32)
        got, step = [], cfg.sr // 2
        for i in range(0, len(audio), step):
            r = post(f"/session/{sid}/audio",
                     audio[i: i + step].tobytes())
            got.extend(r["blendshapes"])
        r = post(f"/session/{sid}/flush")
        got.extend(r["blendshapes"])
        assert post(f"/session/{sid}/close") == {"ok": True}

        # s16 ingestion widens /32768
        sid2 = post("/session/open")["session"]
        pcm = (audio[:step] * 32768).clip(-32768, 32767).astype("<i2")
        r = post(f"/session/{sid2}/audio", pcm.tobytes(),
                 {"X-Audio-Format": "s16"})
        assert r["n"] >= 0
        post(f"/session/{sid2}/close")

        # frame count parity with the one-shot batch path on the same audio
        frames = np.asarray(got)
        assert frames.shape[1] == cfg.output_dim
        t120 = (len(audio) + 2 * (1470 // 2)) // (1470 // 2) - 1
        assert frames.shape[0] == t120 // 2 + t120 % 2

        # unknown session → 404
        try:
            post("/session/99999/audio", b"\x00" * 8)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 404
        assert raised

        # /metrics reflects the traffic above: ticks ran, frames came out,
        # latency percentiles populated, no fault-path counters tripped
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            m = json.load(r)
        assert m["streamer_started"] is True
        assert m["ticks"] > 0 and m["decode_ticks"] > 0
        assert m["frames_out"] >= frames.shape[0]
        assert m["tick_p50_ms"] is not None and m["tick_p95_ms"] >= m["tick_p50_ms"]
        assert m["watchdog_flips"] == 0 and m["ring_recoveries"] == 0
        assert m["live_sessions"] == 0  # both sessions closed
    finally:
        httpd.shutdown()


def test_single_format_server_rejects_other_format(cfg_params):
    """--audio_format s16 servers warm only the int16 program family, so a
    float32 push must be rejected with 415 (not lazily compiled), while
    s16 traffic works end-to-end."""
    cfg, params = cfg_params
    httpd = serve(params, cfg, port=0, max_sessions=2, audio_format="s16")
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, data=b"", headers=None):
        req = urllib.request.Request(base + path, data=data, method="POST",
                                     headers=headers or {})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.load(r)

    try:
        sid = post("/session/open")["session"]
        rng = np.random.default_rng(0)
        pcm = (rng.standard_normal(cfg.sr) * 8000).astype("<i2")
        r = post(f"/session/{sid}/audio", pcm.tobytes(),
                 {"X-Audio-Format": "s16"})
        assert r["n"] >= 0

        # f32 (the default header) → 415, session unaffected
        try:
            post(f"/session/{sid}/audio",
                 np.zeros(100, "<f4").tobytes())
            code = None
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 415

        post(f"/session/{sid}/flush")
        assert post(f"/session/{sid}/close") == {"ok": True}
    finally:
        httpd.shutdown()


def test_server_serve_buckets_plumbs_through(cfg_params, monkeypatch):
    """--serve_buckets / --background_warmup reach MultiStreamer.warmup as
    serve_buckets= / background_fallback= (plumbing only — the progressive
    mechanics themselves are pinned in test_multi_stream.py)."""
    from neurosync_trainer_lite_tpu.inference import multi_stream as M
    from neurosync_trainer_lite_tpu.inference.server import warmup_handler

    cfg, params = cfg_params
    seen = {}

    def fake_warmup(self, **kw):
        seen.update(kw)
        return 7

    monkeypatch.setattr(M.MultiStreamer, "warmup", fake_warmup)
    httpd = serve(params, cfg, port=0, max_sessions=4,
                  serve_buckets=2, background_warmup=True)
    try:
        assert warmup_handler(httpd) == 7
        assert seen == {"background_fallback": True, "serve_buckets": 2}
    finally:
        httpd.server_close()
