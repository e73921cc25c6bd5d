from neurosync_trainer_lite_tpu.models.seq2seq import (
    init_seq2seq,
    seq2seq_apply,
    encoder_apply,
    decoder_apply,
    count_parameters,
)
from neurosync_trainer_lite_tpu.models.loss import loss_fn

__all__ = [
    "init_seq2seq",
    "seq2seq_apply",
    "encoder_apply",
    "decoder_apply",
    "count_parameters",
    "loss_fn",
]
