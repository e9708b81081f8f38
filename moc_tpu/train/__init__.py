"""moc_tpu.train — trainers: MIL fold training, LoRA fine-tuning, and the
distributed foundation-encoder pretrain step (dp/sp/tp/ep over a mesh)."""

from moc_tpu.train.pretrain import (
    PretrainConfig,
    encoder_param_shardings,
    make_pretrain_state,
    make_sharded_train_step,
)

__all__ = [
    "PretrainConfig",
    "encoder_param_shardings",
    "make_pretrain_state",
    "make_sharded_train_step",
]
