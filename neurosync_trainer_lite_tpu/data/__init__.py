from neurosync_trainer_lite_tpu.data.processing import load_data, collect_features
from neurosync_trainer_lite_tpu.data.windowing import (
    WindowedDataset,
    prepare_datasets,
)

__all__ = ["load_data", "collect_features", "WindowedDataset", "prepare_datasets"]
