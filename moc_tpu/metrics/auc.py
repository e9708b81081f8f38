"""ROC-AUC: device-side (jnp, masked, jittable) and host-side (sklearn).

Device implementation is the tie-corrected Mann-Whitney U statistic — exact
agreement with sklearn's trapezoidal ROC (verified in
``tests/test_metrics.py``). The default path is sort/cumsum-based at
``O(M log M)`` memory-linear (``_rank_u``) so cohort-scale fused eval never
materializes ``[M, M]`` pair matrices; the quadratic ``_pairwise_u`` form is
kept as the small-M test oracle. A boolean ``valid`` mask supports padded
score arrays so AUC can be computed inside jitted/vmapped episode programs
with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_u(pos_scores, neg_scores, pos_valid, neg_valid):
    """U = #(pos > neg) + 0.5 #(pos == neg) over valid pairs, and the pair count.

    O(M²) memory — retained as the oracle the rank-based path is tested
    against; production callers use ``_rank_u``."""
    diff = pos_scores[:, None] - neg_scores[None, :]
    wins = (diff > 0).astype(jnp.float32) + 0.5 * (diff == 0).astype(jnp.float32)
    pair_mask = (pos_valid[:, None] & neg_valid[None, :]).astype(jnp.float32)
    u = jnp.sum(wins * pair_mask)
    n_pairs = jnp.sum(pair_mask)
    return u, n_pairs


def _rank_u(scores, pos_valid, neg_valid):
    """Tie-corrected Mann-Whitney U via ONE sort + cumsums: O(M log M) time,
    O(M) memory (vs the ``[M, M]`` difference matrix of ``_pairwise_u``).

    For every valid positive at score s: count negatives with score < s plus
    half the negatives tied at s. Tie groups are runs of equal score in the
    sorted order; per-element group boundaries come from prefix-max /
    suffix-min index propagation, so everything is static-shape jittable.
    Invalid elements carry zero pos/neg indicators and cannot perturb counts
    regardless of where they sort.
    """
    scores = jnp.asarray(scores)
    m = scores.shape[0]
    order = jnp.argsort(scores)  # ascending
    s = scores[order]
    p = pos_valid[order].astype(jnp.float32)
    ng = neg_valid[order].astype(jnp.float32)
    cum_neg = jnp.cumsum(ng)  # inclusive negative count
    idx = jnp.arange(m)
    is_first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    is_last = jnp.concatenate([s[:-1] != s[1:], jnp.ones((1,), bool)])
    gstart = jax.lax.cummax(jnp.where(is_first, idx, 0))  # index of my group's first
    gend = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(is_last, idx, m))))
    neg_below = (cum_neg - ng)[gstart]  # negatives strictly below my score
    neg_tied = cum_neg[gend] - neg_below  # negatives tied at my score
    u = jnp.sum(p * (neg_below + 0.5 * neg_tied))
    n_pairs = jnp.sum(p) * jnp.sum(ng)
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
    u, n_pairs = _rank_u(scores, pos_v, neg_v)
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
    weight = 0.0
    for a in range(c):
        for b in range(a + 1, c):
            in_pair = valid & ((labels == a) | (labels == b))
            auc_a = auc_binary(probs[:, a], (labels == a).astype(jnp.int32), in_pair)
            auc_b = auc_binary(probs[:, b], (labels == b).astype(jnp.int32), in_pair)
            # pairs with a missing class would contribute the 0.5 fallback
            # and dilute the macro mean (the host path nanmeans them away;
            # review r3) — weight each pair by both classes being present
            w = (jnp.sum(valid & (labels == a)) > 0) & \
                (jnp.sum(valid & (labels == b)) > 0)
            w = w.astype(jnp.float32)
            total = total + w * 0.5 * (auc_a + auc_b)
            weight = weight + w
    return total / jnp.maximum(weight, 1.0)


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
        u, n_pairs = _rank_u(probs[:, a], pos, neg)
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
