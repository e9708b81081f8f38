"""moc_tpu.metrics — evaluation metrics (device-side jnp + host-side sklearn).

The reference computes ROC-AUC with sklearn on host
(``/root/reference/main_moc.py:449-454``: binary = P(class 1); multiclass =
``ovo`` macro) and accuracy over the real split length. Here both live:

  * ``auc_binary`` / ``auc_ovo_macro`` — pure-jnp rank-based implementations so
    model selection can run entirely on device inside a jitted episode;
  * ``roc_auc_host`` — the sklearn path for exact-parity reporting.

Tie handling uses average ranks (Mann-Whitney with tie correction), which
matches sklearn's trapezoidal ROC exactly.
"""

from moc_tpu.metrics.auc import (auc_binary, auc_ovo_macro, auc_ovr_macro,
                                 auc_from_probs, roc_auc_host)
from moc_tpu.metrics.classification import (
    accuracy,
    balanced_accuracy,
    softmax_probs,
    CONCH_TEMPERATURE,
)

__all__ = [
    "auc_binary",
    "auc_ovo_macro",
    "auc_from_probs",
    "auc_ovr_macro",
    "roc_auc_host",
    "accuracy",
    "balanced_accuracy",
    "softmax_probs",
    "CONCH_TEMPERATURE",
]
