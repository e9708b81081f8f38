"""moc_tpu.ops — masked, statically-shaped TPU ops for patch selection & pooling.

This package is the TPU-native rebuild of the reference's algorithmic kernel
library (``/root/reference/utils/patch_selection_classifier_index.py`` and
``/root/reference/utils/patch_selection_classifier.py``).  The reference
operates on variable-length ``[N, C]`` logit tensors; here every op takes a
padded ``[N, C]`` array plus a boolean ``[N]`` validity mask so that shapes are
static under ``jit`` and the whole family is ``vmap``-able over slides and
episodes.
"""

from moc_tpu.ops.masking import (
    NEG_INF,
    masked_logits,
    masked_col_topk,
    masked_row_margin,
    topk_mean,
)
from moc_tpu.ops.pooling import (
    topj_pooling,
    delta_softmax_pooling,
    delta_diff_pooling,
    topj_delta_softmax_pooling,
    topj_delta_diff_pooling,
    bottomk_irrel_pooling,
    bottomk_irrel_delta_softmax_pooling,
    bottomk_irrel_delta_diff_pooling,
    topj_bottomk_irrel_delta_softmax_pooling,
    topj_bottomk_irrel_delta_diff_pooling,
    FOREGROUND_POOLINGS,
    POOLING_REGISTRY,
)
from moc_tpu.ops.quant import (
    dequantize_rows,
    int8_row_matmul,
    quantize_columns,
    quantize_rows_device,
    quantize_rows_host,
)
from moc_tpu.ops.selection import (
    select_topj,
    select_delta_softmax,
    select_delta_diff,
    select_bottomk_irrel,
    union_selection,
    gather_selected,
    select_and_gather,
    topk_threshold_mask,
    union_selection_threshold,
)

__all__ = [
    "NEG_INF",
    "masked_logits",
    "masked_col_topk",
    "masked_row_margin",
    "topk_mean",
    "topj_pooling",
    "delta_softmax_pooling",
    "delta_diff_pooling",
    "topj_delta_softmax_pooling",
    "topj_delta_diff_pooling",
    "bottomk_irrel_pooling",
    "bottomk_irrel_delta_softmax_pooling",
    "bottomk_irrel_delta_diff_pooling",
    "topj_bottomk_irrel_delta_softmax_pooling",
    "topj_bottomk_irrel_delta_diff_pooling",
    "FOREGROUND_POOLINGS",
    "POOLING_REGISTRY",
    "dequantize_rows",
    "int8_row_matmul",
    "quantize_columns",
    "quantize_rows_device",
    "quantize_rows_host",
    "select_topj",
    "select_delta_softmax",
    "select_delta_diff",
    "select_bottomk_irrel",
    "union_selection",
    "gather_selected",
    "select_and_gather",
    "topk_threshold_mask",
    "union_selection_threshold",
]
