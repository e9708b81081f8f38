"""Bag-level losses: cross-entropy and the smooth top-1 SVM.

``smooth_top1_svm`` re-states the external ``topk.svm.SmoothTop1SVM`` the
reference imports (``/root/reference/utils/core_utils.py:132-138``): the
temperature-smoothed multiclass hinge

    L(s, y) = τ · log Σ_j exp((s_j + α·1[j≠y]) / τ) − s_y

which → max_j(s_j + α·1[j≠y]) − s_y (the margin hinge) as τ → 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


def smooth_top1_svm(logits, labels, alpha: float = 1.0, tau: float = 1.0):
    """``logits [..., C]``, ``labels [...]`` → per-example smooth hinge."""
    n_classes = logits.shape[-1]
    margin = alpha * (1.0 - jax.nn.one_hot(labels, n_classes))
    smoothed = tau * jax.scipy.special.logsumexp((logits + margin) / tau, axis=-1)
    true_score = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return smoothed - true_score


def bag_loss_fn(name: str):
    if name == "ce":
        return cross_entropy
    if name == "svm":
        return smooth_top1_svm
    raise ValueError(f"unknown bag loss {name!r}")
