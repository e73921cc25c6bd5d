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

One jitted decode graph is compiled at startup; requests run sequentially
(the model call is device-bound — parallel HTTP handlers would only queue on
the chip anyway).
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


def make_handler(params, cfg: Config):
    from neurosync_trainer_lite_tpu.inference.api import (
        generate_facial_data_from_bytes)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/audio_to_blendshapes":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length < 0 or length > MAX_BODY_BYTES:
                    # negative would make rfile.read() block to EOF and wedge
                    # the single-threaded server
                    self._send(413, {"error": f"invalid body size ({length} "
                                     f"bytes; cap {MAX_BODY_BYTES})"})
                    return
                audio_bytes = self.rfile.read(length)
                frames = generate_facial_data_from_bytes(
                    audio_bytes, params, cfg)
                if isinstance(frames, tuple):
                    # too-short clip: the API keeps the reference's empty
                    # ([], array([])) signature — serve an empty frame list
                    frames = []
                else:
                    frames = frames.tolist()
                self._send(200, {"blendshapes": frames,
                                 "fps": cfg.frame_rate})
            except Exception as e:  # noqa: BLE001 — report, keep serving
                self._send(400, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(params, cfg: Config, host: str = "127.0.0.1", port: int = 8200,
          *, server_class=HTTPServer):
    httpd = server_class((host, port), make_handler(params, cfg))
    return httpd


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="out/model.pth")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8200)
    parser.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    args = parser.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from neurosync_trainer_lite_tpu.training.checkpoint import load_model

    cfg = Config()
    params = load_model(args.model, cfg)
    httpd = serve(params, cfg, args.host, args.port)
    print(f"serving audio→blendshapes on http://{args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
