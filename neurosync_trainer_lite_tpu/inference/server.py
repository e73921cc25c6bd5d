"""Minimal HTTP serving front-end for the audio→blendshape path.

The reference Lite repo exposes only the Python function and defers serving
to the separate NeuroSync_Local_API flask app (reference: README.md:109-112,
utils/generate_face_shapes.py). This is a dependency-free stdlib equivalent
so the framework is servable out of the box:

    python -m neurosync_trainer_lite_tpu.inference.server \
        --model out/model.pth --port 8200

    POST /audio_to_blendshapes   body: audio bytes (wav/anything ffmpeg reads)
        → {"blendshapes": [[...61 floats...], ...]}   (60 fps frames)
    GET  /healthz                → {"ok": true}
    GET  /metrics                → ops counters + tick-latency percentiles
        (live_sessions, decode_ticks, frames_out, watchdog_flips,
        ring_recoveries, tick_p50/p95/max_ms — MultiStreamer.metrics_snapshot)

Live sessions (MultiStreamer-backed — K concurrent streams batched into one
device program per tick, inference/multi_stream.py):

    POST /session/open           → {"session": id}
    POST /session/<id>/audio     body: raw mono PCM at cfg.sr — float32 LE
        by default, 16-bit LE with header `X-Audio-Format: s16`
        → {"blendshapes": [...], "n": k}   (frames finalized by this push)
    POST /session/<id>/flush     → remaining frames (finalizes the stream)
    POST /session/<id>/close     → {"ok": true}   (frees the session slot)

One jitted decode graph is compiled at startup; requests run sequentially
(the model call is device-bound — parallel HTTP handlers would only queue on
the chip anyway). Every /audio request runs one serving tick, which also
advances OTHER sessions' pending audio — their frames are returned on their
own next request.
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

from neurosync_trainer_lite_tpu.config import Config

#: reject request bodies larger than this before reading them. Sized so a
#: full hour of 88.2 kHz 16-bit mono WAV (~635 MB) fits with headroom while
#: a runaway upload still can't exhaust host memory.
MAX_BODY_BYTES = 1024 * 1024 * 1024


def make_handler(params, cfg: Config, *, max_sessions: int = 8,
                 fused_ticks: bool = True, push_seconds: float | None = None,
                 audio_format: str = "both", background_warmup: bool = False,
                 serve_buckets: int | None = None):
    import numpy as np

    from neurosync_trainer_lite_tpu.inference.api import (
        generate_facial_data_from_bytes)

    if audio_format not in ("both", "f32", "s16"):
        raise ValueError(
            f"audio_format={audio_format!r}: must be 'both', 'f32' or 's16'")
    #: formats this deployment accepts — a single-format server warms half
    #: the fused program family (the dominant cold-start cost) and rejects
    #: the other format with 415 instead of lazily compiling its programs
    accepted = ("f32", "s16") if audio_format == "both" else (audio_format,)

    state = {"ms": None}

    def get_streamer():
        if state["ms"] is None:  # lazy: batch-only servers never pay for it
            from neurosync_trainer_lite_tpu.inference.multi_stream import (
                MultiStreamer)
            state["ms"] = MultiStreamer(params, cfg,
                                        max_sessions=max_sessions,
                                        fused_decode=fused_ticks,
                                        push_seconds=push_seconds,
                                        push_formats=accepted)
        return state["ms"]

    class Handler(BaseHTTPRequestHandler):
        #: expose the lazy streamer accessor for tools/soaks that inspect
        #: warmup coverage (e.g. last_eager_sigs) — instantiates on call.
        #: (named differently from the closure: a class-body assignment to
        #: the same name would shadow the free variable)
        streamer = staticmethod(get_streamer)

        @staticmethod
        def warmup() -> int:
            """Pre-compile the live-session tick/decode programs (see
            serve()/warmup_handler — called at deployment startup). Only
            the accepted audio format(s) are warmed (the streamer's
            push_formats — set from --audio_format). With
            background_warmup, only the fused (live) family blocks
            startup; the two-dispatch fallback family warms on a daemon
            thread while traffic runs. With serve_buckets N, only the
            session-bucket rungs ≤ bucket(N) block startup and capacity
            ramps in the background (progressive warmup)."""
            return get_streamer().warmup(
                background_fallback=background_warmup,
                serve_buckets=serve_buckets)

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                self._do_get()
            except Exception as e:  # noqa: BLE001 — report, keep serving
                self._send(400, {"error": str(e)})

        def _do_get(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/metrics":
                # ops surface: tick-latency percentiles + counters
                # (watchdog flips, ring recoveries) from the live streamer.
                # Reported without instantiating it — a batch-only server
                # stays lazy and reports not-started
                ms = state["ms"]
                if ms is None:
                    self._send(200, {"live_sessions": 0,
                                     "streamer_started": False})
                else:
                    self._send(200, {"streamer_started": True,
                                     **ms.metrics_snapshot()})
            else:
                self._send(404, {"error": "unknown path"})

        def _read_body(self) -> bytes | None:
            length = int(self.headers.get("Content-Length", "0"))
            if length < 0 or length > MAX_BODY_BYTES:
                # negative would make rfile.read() block to EOF and wedge
                # the single-threaded server
                self._send(413, {"error": f"invalid body size ({length} "
                                 f"bytes; cap {MAX_BODY_BYTES})"})
                return None
            return self.rfile.read(length)

        def do_POST(self):
            try:
                if self.path == "/audio_to_blendshapes":
                    self._post_batch()
                elif self.path.startswith("/session"):
                    self._post_session()
                else:
                    self._send(404, {"error": "unknown path"})
            except Exception as e:  # noqa: BLE001 — report, keep serving
                self._send(400, {"error": str(e)})

        def _post_batch(self):
            audio_bytes = self._read_body()
            if audio_bytes is None:
                return
            frames = generate_facial_data_from_bytes(audio_bytes, params, cfg)
            if isinstance(frames, tuple):
                # too-short clip: the API keeps the reference's empty
                # ([], array([])) signature — serve an empty frame list
                frames = []
            else:
                frames = frames.tolist()
            self._send(200, {"blendshapes": frames, "fps": cfg.frame_rate})

        def _post_session(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            parts = url.path.strip("/").split("/")
            ms = get_streamer()
            if parts == ["session", "open"]:
                if self._read_body() is None:
                    return
                smooth = parse_qs(url.query).get(
                    "smooth", ["0"])[0] in ("1", "true")
                try:
                    self._send(200, {"session": ms.open(smooth=smooth)})
                except RuntimeError as e:  # all slots busy
                    self._send(503, {"error": str(e)})
                return
            if len(parts) != 3 or not parts[1].isdigit():
                self._send(404, {"error": "unknown path"})
                return
            sid, verb = int(parts[1]), parts[2]
            if not ms.has_session(sid):
                self._send(404, {"error": f"no session {sid}"})
                return
            if verb == "audio":
                body = self._read_body()
                if body is None:
                    return
                fmt = self.headers.get("X-Audio-Format", "f32")
                if fmt not in accepted:
                    self._send(415, {
                        "error": f"audio format {fmt!r} not accepted by "
                                 f"this server (accepts: {accepted}); its "
                                 f"tick programs are not warmed"})
                    return
                if fmt == "s16":
                    # kept as int16 end-to-end: MultiStreamer uploads raw
                    # PCM (half the bytes) and widens /32768 on device
                    samples = np.frombuffer(body, "<i2")
                else:
                    samples = np.frombuffer(body, "<f4")
                ms.push_audio(sid, samples)
                ms.tick()
                frames = ms.pop_frames(sid)
                self._send(200, {"blendshapes": frames.tolist(),
                                 "n": len(frames), "fps": cfg.frame_rate})
            elif verb == "flush":
                if self._read_body() is None:
                    return
                ms.flush(sid)
                frames = ms.pop_frames(sid)
                self._send(200, {"blendshapes": frames.tolist(),
                                 "n": len(frames), "fps": cfg.frame_rate})
            elif verb == "close":
                if self._read_body() is None:
                    return
                ms.close(sid)
                self._send(200, {"ok": True})
            else:
                self._send(404, {"error": "unknown path"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(params, cfg: Config, host: str = "127.0.0.1", port: int = 8200,
          *, server_class=HTTPServer, max_sessions: int = 8,
          fused_ticks: bool = True, push_seconds: float | None = None,
          audio_format: str = "both", background_warmup: bool = False,
          serve_buckets: int | None = None):
    httpd = server_class((host, port),
                         make_handler(params, cfg, max_sessions=max_sessions,
                                      fused_ticks=fused_ticks,
                                      push_seconds=push_seconds,
                                      audio_format=audio_format,
                                      background_warmup=background_warmup,
                                      serve_buckets=serve_buckets))
    return httpd


def warmup_handler(httpd) -> int:
    """Pre-compile the live-session programs before accepting traffic.

    The session tick/decode programs compile per shape bucket; without this,
    the first push of a deployment stalls every queued request behind a
    multi-second XLA compile (measured 12.5 s+ per fresh bucket on a real
    TPU — docs/PERF.md). Returns the number of programs compiled."""
    return httpd.RequestHandlerClass.warmup()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="out/model.pth",
                        help="model.pth (torch interchange) or a training "
                             "checkpoint directory (torch-free)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8200)
    parser.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    parser.add_argument("--max_sessions", type=int, default=8)
    parser.add_argument("--background_warmup", action="store_true",
                        help="return from startup warmup as soon as the "
                        "fused (live) program family is compiled+forced; "
                        "the two-dispatch fallback family — used only "
                        "after a stall-watchdog flip — warms on a daemon "
                        "thread while traffic runs (measured: cuts the "
                        "cold time-to-serve, docs/PERF.md)")
    parser.add_argument("--serve_buckets", type=int, default=4,
                        help="progressive warmup (DEFAULT 4 — measured "
                        "cold time-to-serve for the 32-stream config "
                        "1192 s eager vs 138 s progressive, docs/PERF.md; "
                        "0 restores the full eager warmup): block startup "
                        "only on the session-bucket rungs up to this "
                        "session count; larger rungs (and the fallback "
                        "family) warm ascending on a daemon thread while "
                        "traffic "
                        "runs — capacity ramps as the warmer climbs "
                        "(measured time-to-serve numbers: docs/PERF.md r4)")
    parser.add_argument("--no_warmup", action="store_true",
                        help="skip startup pre-compilation (first live "
                        "session then pays the XLA compiles)")
    parser.add_argument("--fused_ticks", action="store_true",
                        help="(no-op: fused ticks are the default again — "
                        "their historical rare stalls were root-caused to "
                        "unforced warmup dispatches and fixed, docs/PERF.md)")
    parser.add_argument("--two_dispatch_ticks", action="store_true",
                        help="opt out of fused ticks: feature-window "
                        "download + separate batched decode (multiple "
                        "windows per session per tick — better for "
                        "offline catch-up-heavy feeds)")
    parser.add_argument("--audio_format", default="both",
                        choices=("both", "f32", "s16"),
                        help="push format(s) this deployment accepts "
                        "(X-Audio-Format header). A single format halves "
                        "the warmed fused program family — the dominant "
                        "cold-start cost at large --max_sessions; the "
                        "other format is then rejected with 415")
    parser.add_argument("--push_capacity_s", type=float, default=None,
                        help="per-tick intake capacity in seconds of audio "
                        "per session (default ≈1.5). The tick uploads a "
                        "[sessions, capacity] array every tick, so live "
                        "deployments pushing every ~0.25 s can set ~0.5 "
                        "for ~3x fewer upload bytes per tick; backlogged "
                        "sessions then catch up at this rate per tick")
    args = parser.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from neurosync_trainer_lite_tpu.utils.compilation_cache import (
        enable_persistent_cache)

    enable_persistent_cache()  # warmup compiles persist across restarts

    from neurosync_trainer_lite_tpu.training.checkpoint import load_model

    cfg = Config()
    params = load_model(args.model, cfg)
    # --serve_buckets 0 → eager full warmup (the pre-r5 default);
    # progressive warmup only applies to the fused family, so don't
    # claim a ramp when --two_dispatch_ticks warms everything eagerly
    serve_buckets = args.serve_buckets or None
    httpd = serve(params, cfg, args.host, args.port,
                  max_sessions=args.max_sessions,
                  fused_ticks=not args.two_dispatch_ticks,
                  push_seconds=args.push_capacity_s,
                  audio_format=args.audio_format,
                  background_warmup=args.background_warmup,
                  serve_buckets=serve_buckets)
    if not args.no_warmup:
        print("warming up live-session programs (one-time XLA compiles)…")
        n = warmup_handler(httpd)
        ramped = bool(serve_buckets) and not args.two_dispatch_ticks
        print(f"warmed {n} programs"
              + (" eagerly; larger session buckets ramp in the background"
                 if ramped else ""))
    print(f"serving audio→blendshapes on http://{args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
