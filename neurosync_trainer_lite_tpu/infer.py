"""Offline inference CLI: wav → LiveLink blendshape CSV (+ optional stats).

    python -m neurosync_trainer_lite_tpu.infer --wav speech.wav \
        --model out/model.pth --out shapes.csv \
        [--ground-truth truth.csv --stats stats.txt] [--smooth] [--platform cpu]

The reference has no offline inference entry point — inference runs only
inside per-epoch validation (reference: utils/validation.py:14-42) or via the
external API repo; this CLI exposes the same path standalone.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="neurosync_trainer_lite_tpu.infer",
        description="audio file → 61-dim ARKit blendshape CSV at 60 fps")
    parser.add_argument("--wav", required=True)
    parser.add_argument("--model", default="out/model.pth",
                        help="model.pth (torch interchange) or a training "
                             "checkpoint directory (torch-free)")
    parser.add_argument("--out", default="generated.csv")
    parser.add_argument("--ground-truth", default=None,
                        help="LiveLink CSV to compare against")
    parser.add_argument("--stats", default=None,
                        help="where to write comparison stats (needs --ground-truth)")
    parser.add_argument("--smooth", action="store_true",
                        help="pair-average smoothing (reference: generate_face_shapes.py:22)")
    parser.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    parser.add_argument("--tiny", action="store_true",
                        help="tiny 4-layer model geometry")
    from neurosync_trainer_lite_tpu.train import (
        _add_config_flags, config_from_args)

    _add_config_flags(parser)  # model geometry must match the checkpoint
    args = parser.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from neurosync_trainer_lite_tpu.utils.compilation_cache import (
        enable_persistent_cache)

    enable_persistent_cache()

    from neurosync_trainer_lite_tpu.inference.api import (
        generate_facial_data_from_bytes)
    from neurosync_trainer_lite_tpu.training.checkpoint import load_model
    from neurosync_trainer_lite_tpu.utils.csv_io import (
        save_generated_data_as_csv)

    cfg = config_from_args(args)
    params = load_model(args.model, cfg)
    with open(args.wav, "rb") as f:
        frames = generate_facial_data_from_bytes(
            f.read(), params, cfg, use_smoothing=args.smooth)
    if isinstance(frames, tuple):
        # too-short clip: the API returns its empty ([], array([])) signature
        print(f"{args.wav}: clip shorter than the frontend minimum "
              f"(9 intermediate frames); writing an empty CSV")
        import numpy as np
        frames = np.zeros((0, cfg.output_dim))
    save_generated_data_as_csv(frames, args.out)
    print(f"{len(frames)} frames → {args.out}")

    if args.ground_truth:
        from neurosync_trainer_lite_tpu.utils.stats import save_comparison_stats

        stats_path = args.stats or (args.out.rsplit(".", 1)[0] + "_stats.txt")
        save_comparison_stats(args.out, args.ground_truth, stats_path)


if __name__ == "__main__":
    main()
