"""Device AUC must match sklearn exactly (ties included)."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from moc_tpu.metrics import (
    accuracy,
    auc_binary,
    auc_from_probs,
    auc_ovo_macro,
    balanced_accuracy,
    roc_auc_host,
    softmax_probs,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auc_binary_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    scores = rng.normal(size=200)
    labels = (rng.random(200) < 0.4).astype(int)
    ours = float(auc_binary(scores, labels))
    ref = roc_auc_score(labels, scores)
    assert abs(ours - ref) < 1e-6


def test_auc_binary_with_ties():
    scores = np.array([0.1, 0.1, 0.5, 0.5, 0.9, 0.9])
    labels = np.array([0, 1, 0, 1, 0, 1])
    assert abs(float(auc_binary(scores, labels)) - roc_auc_score(labels, scores)) < 1e-6


def test_auc_binary_masked():
    rng = np.random.default_rng(3)
    scores = rng.normal(size=100)
    labels = (rng.random(100) < 0.5).astype(int)
    valid = np.zeros(100, bool)
    valid[:60] = True
    ours = float(auc_binary(scores, labels, valid))
    ref = roc_auc_score(labels[:60], scores[:60])
    assert abs(ours - ref) < 1e-6


@pytest.mark.parametrize("seed", [0, 5])
def test_auc_ovo_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    n, c = 150, 3
    logits = rng.normal(size=(n, c))
    labels = rng.integers(0, c, size=n)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    ours = float(auc_ovo_macro(probs, labels))
    ref = roc_auc_score(labels, probs, multi_class="ovo", average="macro")
    assert abs(ours - ref) < 1e-6


def test_auc_from_probs_dispatch():
    rng = np.random.default_rng(0)
    p2 = rng.dirichlet([1, 1], size=50)
    l2 = rng.integers(0, 2, size=50)
    assert abs(float(auc_from_probs(p2, l2)) - roc_auc_score(l2, p2[:, 1])) < 1e-6
    assert abs(roc_auc_host(p2, l2) - roc_auc_score(l2, p2[:, 1])) < 1e-12


def test_accuracy_and_bacc():
    logits = np.array([[2.0, 1.0], [0.0, 3.0], [5.0, 1.0], [1.0, 2.0]])
    labels = np.array([0, 1, 1, 1])
    assert float(accuracy(logits, labels)) == pytest.approx(0.75)
    # class 0 recall 1.0, class 1 recall 2/3
    assert float(balanced_accuracy(logits, labels, 2)) == pytest.approx((1.0 + 2 / 3) / 2)
    valid = np.array([True, True, False, True])
    assert float(accuracy(logits, labels, valid)) == pytest.approx(1.0)


def test_bacc_absent_class_matches_sklearn():
    """sklearn balanced_accuracy_score averages over classes PRESENT in
    y_true; a few-shot split missing a class must not deflate the mean
    (review r3)."""
    from sklearn.metrics import balanced_accuracy_score

    logits = np.array([[3.0, 1.0, 0.0], [0.0, 3.0, 0.0], [0.5, 2.0, 0.0],
                       [4.0, 0.0, 0.0]])
    labels = np.array([0, 1, 1, 0])  # class 2 absent
    preds = logits.argmax(1)
    want = balanced_accuracy_score(labels, preds)
    got = float(balanced_accuracy(logits, labels, 3))
    assert got == pytest.approx(want)


def test_auc_ovo_absent_class_pairs_excluded():
    """Pairs involving an absent class must not dilute the OVO macro mean
    with the 0.5 fallback (host _auc_host nanmeans them away; review r3)."""
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(3)
    probs = rng.dirichlet([1.0, 1.0, 1.0], size=40).astype(np.float32)
    labels = rng.integers(0, 2, size=40)  # class 2 absent
    got = float(auc_ovo_macro(probs, labels, n_classes=3))
    # only the (0,1) pair survives → equals the binary sym-pair AUC
    a01 = roc_auc_score((labels == 0).astype(int), probs[:, 0])
    a10 = roc_auc_score((labels == 1).astype(int), probs[:, 1])
    assert got == pytest.approx(0.5 * (a01 + a10), abs=1e-6)


def test_softmax_temperature():
    logits = np.array([[0.01, 0.02]])
    p_cold = np.asarray(softmax_probs(logits, temperature=1.0))
    p_hot = np.asarray(softmax_probs(logits))  # CONCH temperature 56.3477
    assert p_hot[0, 1] > p_cold[0, 1]  # temperature sharpens
    np.testing.assert_allclose(p_hot.sum(axis=1), 1.0, rtol=1e-6)


def test_auc_ovr_macro_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    from moc_tpu.metrics import auc_ovr_macro

    rng = np.random.default_rng(8)
    for c in (3, 4):
        labels = rng.integers(0, c, 60)
        probs = rng.random((60, c)).astype(np.float32)
        probs /= probs.sum(1, keepdims=True)
        want = roc_auc_score(labels, probs, multi_class="ovr", average="macro")
        got = float(auc_ovr_macro(jnp.asarray(probs), jnp.asarray(labels)))
        np.testing.assert_allclose(got, want, atol=1e-6)
    # padded rows excluded via valid; absent classes excluded from the mean
    labels = np.array([0, 0, 1, 1, 2, 2])
    probs = rng.random((6, 4)).astype(np.float32)
    valid = np.array([True] * 6)
    got = float(auc_ovr_macro(jnp.asarray(probs), jnp.asarray(labels),
                              jnp.asarray(valid)))
    want = np.mean([roc_auc_score((labels == a).astype(int), probs[:, a])
                    for a in range(3)])
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_rank_u_matches_pairwise_oracle_tie_heavy(seed):
    """The O(M log M) sort/cumsum Mann-Whitney path must agree with the
    O(M^2) pairwise oracle AND sklearn on tie-heavy masked fuzz (VERDICT r2
    weak #3: cohort-scale fused eval needs the memory-linear form)."""
    from moc_tpu.metrics.auc import _pairwise_u, _rank_u

    rng = np.random.default_rng(seed)
    m = 257  # odd, unaligned
    # quantized scores -> massive tie groups
    scores = np.round(rng.normal(size=m), 1)
    labels = (rng.random(m) < 0.35).astype(int)
    valid = rng.random(m) < 0.8
    pos = valid & (labels == 1)
    neg = valid & (labels != 1)
    u_rank, n_rank = _rank_u(jnp.asarray(scores), jnp.asarray(pos), jnp.asarray(neg))
    u_pair, n_pair = _pairwise_u(jnp.asarray(scores), jnp.asarray(scores),
                                 jnp.asarray(pos), jnp.asarray(neg))
    assert float(n_rank) == float(n_pair)
    assert abs(float(u_rank) - float(u_pair)) < 1e-3
    ours = float(auc_binary(scores, labels, valid))
    ref = roc_auc_score(labels[valid], scores[valid])
    assert abs(ours - ref) < 1e-6


def test_rank_auc_all_tied_and_degenerate():
    # every score identical -> AUC 0.5; single-class -> 0.5 fallback
    scores = np.full(50, 0.25)
    labels = np.arange(50) % 2
    assert abs(float(auc_binary(scores, labels)) - 0.5) < 1e-6
    assert float(auc_binary(np.random.default_rng(0).normal(size=8),
                            np.ones(8, int))) == 0.5


def test_rank_auc_large_is_memory_linear():
    """Smoke at M=20000 — the pairwise form would need a 400M-entry f32
    matrix per pair; the rank path runs it comfortably."""
    rng = np.random.default_rng(7)
    m = 20000
    scores = np.round(rng.normal(size=m), 2)
    labels = (rng.random(m) < 0.5).astype(int)
    ours = float(auc_binary(scores, labels))
    ref = roc_auc_score(labels, scores)
    assert abs(ours - ref) < 1e-5
