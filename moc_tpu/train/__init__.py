"""moc_tpu.train — trainers: MIL fold training, LoRA fine-tuning, and the
distributed foundation-encoder pretrain step (dp/sp/tp/ep over a mesh)."""

from moc_tpu.train.pretrain import (
    PretrainConfig,
    clip_contrastive_loss,
    encoder_param_shardings,
    make_musk_contrastive_step,
    make_pretrain_state,
    make_sharded_train_step,
    run_pretrain,
)
from moc_tpu.train.accum import chunk_bag, streaming_attention_pool
from moc_tpu.train.mil import (
    AccuracyLogger,
    EarlyStopping,
    FoldResult,
    MilTrainConfig,
    build_model,
    evaluate_model,
    half_precision_params,
    evaluate_patch_level,
    init_classifier_from_weights,
    train_fold,
    weighted_order,
)
from moc_tpu.train.losses import bag_loss_fn, cross_entropy, smooth_top1_svm
from moc_tpu.train.mil_fused import (
    FusedFoldResult,
    make_mil_fold_fn,
    run_mil_folds_fused,
    run_mil_folds_fused_pooled,
)
from moc_tpu.train.vila import (
    VilaFoldResult,
    VilaTrainConfig,
    evaluate_vila,
    train_vila_fold,
)
from moc_tpu.train.lora_finetune import (
    LoraFinetuneConfig,
    make_lora_train_step,
    run_lora_finetune,
    streamed_slide_logits,
    update_queue,
)

__all__ = [
    "FusedFoldResult",
    "make_mil_fold_fn",
    "run_mil_folds_fused",
    "run_mil_folds_fused_pooled",
    "PretrainConfig",
    "encoder_param_shardings",
    "make_pretrain_state",
    "make_sharded_train_step",
    "run_pretrain",
    "clip_contrastive_loss",
    "make_musk_contrastive_step",
    "AccuracyLogger",
    "EarlyStopping",
    "FoldResult",
    "MilTrainConfig",
    "build_model",
    "chunk_bag",
    "evaluate_model",
    "half_precision_params",
    "streaming_attention_pool",
    "evaluate_patch_level",
    "init_classifier_from_weights",
    "train_fold",
    "weighted_order",
    "bag_loss_fn",
    "cross_entropy",
    "smooth_top1_svm",
    "VilaFoldResult",
    "VilaTrainConfig",
    "train_vila_fold",
    "evaluate_vila",
    "LoraFinetuneConfig",
    "make_lora_train_step",
    "run_lora_finetune",
    "streamed_slide_logits",
    "update_queue",
]
