"""Accuracy/calibration helpers shared by every eval loop."""

from __future__ import annotations

import jax.numpy as jnp

# CONCH contrastive logit scale, hard-coded at six sites in the reference
# (``/root/reference/main_moc.py:175,242,443,505,567``;
# ``utils/zeroshot_utils.py:174``). Slide logits are multiplied by this
# temperature before the softmax that produces AUC probabilities.
CONCH_TEMPERATURE = 56.3477


def softmax_probs(logits, temperature: float = CONCH_TEMPERATURE):
    """Calibrated class probabilities from pooled slide logits ``[M, C]``."""
    z = jnp.asarray(logits) * temperature
    z = z - jnp.max(z, axis=-1, keepdims=True)
    e = jnp.exp(z)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def accuracy(logits, labels, valid=None):
    """Top-1 accuracy of ``logits [M, C]`` vs ``labels [M]`` over valid rows."""
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels)
    if valid is None:
        valid = jnp.ones(labels.shape, bool)
    hit = (jnp.argmax(logits, axis=-1) == labels) & valid
    return jnp.sum(hit) / jnp.maximum(jnp.sum(valid), 1)


def balanced_accuracy(logits, labels, n_classes: int, valid=None):
    """Mean per-class recall (reference baselines report bacc,
    ``utils/core_utils.py:268-291``)."""
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels)
    if valid is None:
        valid = jnp.ones(labels.shape, bool)
    preds = jnp.argmax(logits, axis=-1)
    recalls, present = [], []
    for c in range(n_classes):
        in_c = valid & (labels == c)
        hit = jnp.sum((preds == c) & in_c)
        recalls.append(hit / jnp.maximum(jnp.sum(in_c), 1))
        present.append(jnp.sum(in_c) > 0)
    # sklearn balanced_accuracy_score averages over classes PRESENT in
    # y_true; counting absent classes as recall 0 deflated few-shot splits
    # that lack a class (review r3)
    w = jnp.stack(present).astype(jnp.float32)
    return jnp.sum(jnp.stack(recalls) * w) / jnp.maximum(jnp.sum(w), 1.0)
