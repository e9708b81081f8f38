"""ROC-AUC: device-side (jnp, masked, jittable) and host-side (sklearn).

Device implementation is the tie-corrected Mann-Whitney U statistic computed
from pairwise comparisons — exact agreement with sklearn's trapezoidal ROC
(verified in ``tests/test_metrics.py``). A boolean ``valid`` mask supports
padded score arrays so AUC can be computed inside jitted/vmapped episode
programs with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _pairwise_u(pos_scores, neg_scores, pos_valid, neg_valid):
    """U = #(pos > neg) + 0.5 #(pos == neg) over valid pairs, and the pair count."""
    diff = pos_scores[:, None] - neg_scores[None, :]
    wins = (diff > 0).astype(jnp.float32) + 0.5 * (diff == 0).astype(jnp.float32)
    pair_mask = (pos_valid[:, None] & neg_valid[None, :]).astype(jnp.float32)
    u = jnp.sum(wins * pair_mask)
    n_pairs = jnp.sum(pair_mask)
    return u, n_pairs


def auc_binary(scores, labels, valid=None):
    """Binary ROC-AUC of ``scores [M]`` (higher = class 1) vs labels ``[M]``.

    Mirrors the reference binary protocol (prob of class 1,
    ``main_moc.py:448-450``). Returns 0.5 when a class is absent.
    """
    scores = jnp.asarray(scores)
    labels = jnp.asarray(labels)
    if valid is None:
        valid = jnp.ones(labels.shape, bool)
    pos_v = valid & (labels == 1)
    neg_v = valid & (labels != 1)
    u, n_pairs = _pairwise_u(scores, scores, pos_v, neg_v)
    return jnp.where(n_pairs > 0, u / jnp.maximum(n_pairs, 1.0), 0.5)


def auc_ovo_macro(probs, labels, valid=None, n_classes: int | None = None):
    """Multiclass ``ovo``-macro ROC-AUC (sklearn semantics, the reference's
    multiclass protocol ``main_moc.py:452-453``).

    For each unordered class pair (a, b): restrict to samples labelled a or b,
    average AUC(prob_a, pos=a) and AUC(prob_b, pos=b); macro-average pairs.
    ``n_classes`` must be static (defaults to ``probs.shape[1]``).
    """
    probs = jnp.asarray(probs)
    labels = jnp.asarray(labels)
    if valid is None:
        valid = jnp.ones(labels.shape, bool)
    c = n_classes if n_classes is not None else probs.shape[1]
    total = 0.0
    n_pairs = 0
    for a in range(c):
        for b in range(a + 1, c):
            in_pair = valid & ((labels == a) | (labels == b))
            auc_a = auc_binary(probs[:, a], (labels == a).astype(jnp.int32), in_pair)
            auc_b = auc_binary(probs[:, b], (labels == b).astype(jnp.int32), in_pair)
            total = total + 0.5 * (auc_a + auc_b)
            n_pairs += 1
    return total / n_pairs


def auc_ovr_macro(probs, labels, valid=None, n_classes: int | None = None):
    """Multiclass ``ovr``-macro ROC-AUC — the baseline-trainer protocol
    (``core_utils.py:519-524``: sklearn ``multi_class='ovr'`` macro; absent
    classes are excluded from the mean like the per-class nanmean fallback,
    ``core_utils.py:611-620``)."""
    probs = jnp.asarray(probs)
    labels = jnp.asarray(labels)
    if valid is None:
        valid = jnp.ones(labels.shape, bool)
    c = n_classes if n_classes is not None else probs.shape[1]
    total = jnp.float32(0.0)
    present = jnp.float32(0.0)
    for a in range(c):
        pos = valid & (labels == a)
        neg = valid & (labels != a)
        u, n_pairs = _pairwise_u(probs[:, a], probs[:, a], pos, neg)
        has = (n_pairs > 0).astype(jnp.float32)
        total = total + has * u / jnp.maximum(n_pairs, 1.0)
        present = present + has
    return total / jnp.maximum(present, 1.0)


def auc_from_probs(probs, labels, valid=None):
    """Dispatch on class count like the reference: binary → P(class 1) AUC,
    multiclass → ovo macro."""
    if probs.shape[1] == 2:
        return auc_binary(probs[:, 1], labels, valid)
    return auc_ovo_macro(probs, labels, valid)


def roc_auc_host(probs: np.ndarray, labels: np.ndarray) -> float:
    """Host-side sklearn AUC with the reference's exact kwargs
    (``main_moc.py:449-454``) for parity-grade reporting."""
    from sklearn.metrics import roc_auc_score

    probs = np.asarray(probs)
    labels = np.asarray(labels)
    if probs.ndim == 2 and probs.shape[1] == 2:
        return float(roc_auc_score(labels, probs[:, 1]))
    if probs.ndim == 1:
        return float(roc_auc_score(labels, probs))
    return float(roc_auc_score(labels, probs, multi_class="ovo", average="macro"))
