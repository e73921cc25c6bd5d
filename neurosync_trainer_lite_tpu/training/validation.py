"""Per-epoch validation inference + artifact generation.

Matches the reference's validation subsystem (reference: utils/validation.py:
14-42): after each epoch, run full chunked inference on the fixed held-out
wav, write the generated LiveLink CSV, the JawOpen comparison plot, and the
overall + per-dimension stats file.

The reference spawns a multiprocessing.Process under a lock for the CSV and
plot writes (validation.py:28-38) to guard matplotlib against epoch overlap;
here artifact writing is synchronous host code after a single batched device
call, so no process juggling is needed — matplotlib uses the Agg backend and
each figure is closed immediately.
"""

from __future__ import annotations

import os

from neurosync_trainer_lite_tpu.config import Config
from neurosync_trainer_lite_tpu.data.processing import extract_audio_features
from neurosync_trainer_lite_tpu.inference.chunked import process_audio_features
from neurosync_trainer_lite_tpu.utils.csv_io import (
    plot_comparison,
    save_generated_data_as_csv,
)
from neurosync_trainer_lite_tpu.utils.stats import save_comparison_stats


def generate_and_save_facial_data(epoch: int, audio_path: str, params,
                                  ground_truth_path: str, cfg: Config,
                                  base_dir: str | None = None) -> str:
    """Returns the generated CSV path."""
    import numpy as np

    audio_features, _ = extract_audio_features(audio_path, sr=cfg.sr)
    generated = process_audio_features(np.asarray(audio_features), params, cfg)

    base_dir = base_dir or cfg.plots_dir
    stats_dir = os.path.join(base_dir, "stats")
    os.makedirs(base_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)

    output_csv_path = os.path.join(
        base_dir, f"generated_facial_data_epoch_{epoch + 1}.csv")
    save_generated_data_as_csv(generated, output_csv_path)

    output_image_path = os.path.join(
        base_dir, f"comparison_plot_epoch_{epoch + 1}.jpg")
    plot_comparison(ground_truth_path, output_csv_path, output_image_path)

    output_stats_path = os.path.join(
        stats_dir, f"comparison_stats_epoch_{epoch + 1}.txt")
    save_comparison_stats(output_csv_path, ground_truth_path, output_stats_path)
    return output_csv_path
