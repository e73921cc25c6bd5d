"""Generate cross-validation fixtures by EXECUTING the reference implementation.

Round-1 verdict gap: our torch-oracle tests and torch_interop round-trips were
all written by the same author from the same reading of the reference — a
shared misreading would pass every test. This script closes that loop by
running the ACTUAL reference classes (loaded from /root/reference at
generation time only; nothing is copied into this repo) and freezing their
outputs as committed fixtures:

  tests/fixtures/reference_tiny/model.pth   — a state_dict produced by the
      reference's Encoder/Decoder/Seq2Seq modules (utils/model.py:213-266)
  tests/fixtures/reference_tiny/goldens.npz — inputs + the reference model's
      forward output, Loss value (utils/model.py:268-291), and the reference's
      chunked process_audio_features output (audio_processing.py:50-112)
  tests/fixtures/reference_tiny/meta.json   — geometry + a record of the
      bidirectional strict-load round-trip verified at generation time

tests/test_reference_parity.py then asserts our JAX stack reproduces these
numbers WITHOUT needing /root/reference at test time.

Usage:  python tools/make_reference_fixture.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "reference_tiny")

# tiny-but-structural geometry: >1 layer (catches stacking-order bugs),
# >1 head (catches head split/merge bugs), even head_dim (RoPE), real
# input/output feature dims
GEOM = dict(input_dim=256, output_dim=61, hidden_dim=64, n_layers=2,
            num_heads=4, dropout=0.0, frame_size=32, overlap=8)


def _load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    ref_model = _load_module(
        os.path.join(args.reference, "utils", "model.py"), "_ref_model")
    ref_audio = _load_module(
        os.path.join(args.reference, "utils", "audio", "processing",
                     "audio_processing.py"), "_ref_audio_processing")

    g = GEOM
    torch.manual_seed(1234)
    device = torch.device("cpu")
    encoder = ref_model.Encoder(g["input_dim"], g["hidden_dim"],
                                g["n_layers"], g["num_heads"], g["dropout"])
    decoder = ref_model.Decoder(g["output_dim"], g["hidden_dim"],
                                g["n_layers"], g["num_heads"], g["dropout"])
    model = ref_model.Seq2Seq(encoder, decoder, device).eval()

    rng = np.random.default_rng(42)
    src = rng.standard_normal((2, 37, g["input_dim"])).astype(np.float32)
    trg = rng.standard_normal((2, 37, g["output_dim"])).astype(np.float32)
    with torch.no_grad():
        fwd_out = model(torch.from_numpy(src)).numpy()

    criterion = ref_model.Loss(delta=1.0, w1=1.0, w2=1.0, w3=1.0)
    with torch.no_grad():
        loss_val = float(criterion(torch.from_numpy(fwd_out),
                                   torch.from_numpy(trg)))

    # the reference's full chunked long-audio inference on the same weights
    feats = rng.standard_normal((100, g["input_dim"])).astype(np.float32)
    ref_cfg = {"frame_size": g["frame_size"], "overlap": g["overlap"]}
    chunked_out = np.asarray(ref_audio.process_audio_features(
        feats.copy(), model, device, ref_cfg), dtype=np.float64)

    os.makedirs(OUT_DIR, exist_ok=True)
    torch.save(model.state_dict(), os.path.join(OUT_DIR, "model.pth"))
    np.savez_compressed(
        os.path.join(OUT_DIR, "goldens.npz"),
        src=src, trg=trg, fwd_out=fwd_out, loss=np.float64(loss_val),
        feats=feats, chunked_out=chunked_out)

    # --- bidirectional interop check, run here where the reference exists ---
    sys.path.insert(0, REPO)
    from neurosync_trainer_lite_tpu.config import Config
    from neurosync_trainer_lite_tpu.utils.torch_interop import (
        params_to_state_dict, state_dict_to_params)

    cfg = Config(**{k: v for k, v in g.items()
                    if k not in ("frame_size", "overlap")},
                 frame_size=g["frame_size"], overlap=g["overlap"])
    params = state_dict_to_params(model.state_dict(), cfg)
    sd_back = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in params_to_state_dict(params, cfg).items()}
    # strict=True: every key must exist with the right shape
    missing, unexpected = model.load_state_dict(sd_back, strict=True), None
    with torch.no_grad():
        fwd_after = model(torch.from_numpy(src)).numpy()
    roundtrip_max_err = float(np.max(np.abs(fwd_after - fwd_out)))
    assert roundtrip_max_err < 1e-6, roundtrip_max_err

    meta = dict(
        geometry=g,
        torch_version=torch.__version__,
        torch_seed=1234,
        reference_strict_load_roundtrip="ok",
        roundtrip_max_abs_err=roundtrip_max_err,
        note=("model.pth and goldens.npz were produced by executing the "
              "reference classes from utils/model.py and "
              "utils/audio/processing/audio_processing.py; "
              "tests/test_reference_parity.py consumes them standalone."),
    )
    with open(os.path.join(OUT_DIR, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"fixtures written to {OUT_DIR}")
    print(f"forward golden shape {fwd_out.shape}, loss {loss_val:.6f}, "
          f"chunked {chunked_out.shape}, roundtrip err {roundtrip_max_err:.2e}")


if __name__ == "__main__":
    main()
