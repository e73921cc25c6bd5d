"""``python -m neurosync_trainer_lite_tpu`` → the training CLI."""

from neurosync_trainer_lite_tpu.train import main

main()
