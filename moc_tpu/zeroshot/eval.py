"""Zero-shot evaluation harness: MI-Zero slide eval + tile eval + metrics.

Behavioral reference ``/root/reference/models/conch/downstream/
zeroshot_path.py``: ``run_mizero`` scores each slide's patch embeddings
(projected into the contrastive space) against a classifier matrix, pools
with top-j means across a TUPLE of j values, and reports acc / balanced acc
/ Cohen's kappa (+quadratic) / ovo ROC-AUC / weighted-F1 per j;
``run_zeroshot`` is the tile-level variant. Metrics use sklearn on host for
exact parity.

TPU-native: slides arrive as padded masked batches and the per-slide
matmul+multi-j pooling is one jitted vmapped program; patch-level logits and
coords can be dumped for visualization (``moc_tpu.viz``).
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from moc_tpu import ops
from moc_tpu.data.batching import BagBatch
from moc_tpu.metrics.classification import CONCH_TEMPERATURE


def multi_topj_pooling(logits: jax.Array, valid: jax.Array,
                       topj: Sequence[int]) -> dict[int, jax.Array]:
    """Pooled logits per j (ref ``topj_pooling`` returning a dict over js)."""
    return {j: ops.topj_pooling(logits, valid, j) for j in topj}


def classification_metrics(probs: np.ndarray, preds: np.ndarray,
                           targets: np.ndarray,
                           metrics: Sequence[str]) -> dict:
    """The reference metric block (``zeroshot_path.py:100-133``)."""
    from sklearn.metrics import (
        balanced_accuracy_score,
        classification_report,
        cohen_kappa_score,
        roc_auc_score,
    )

    rep = classification_report(targets, preds, output_dict=True, zero_division=0)
    try:
        if probs.shape[1] == 2:
            auc = roc_auc_score(targets, probs[:, 1])
        else:
            auc = roc_auc_score(targets, probs, multi_class="ovo", average="macro")
    except ValueError:
        auc = float("nan")
    out = {
        "acc": float((preds == targets).mean()),
        "bacc": float(balanced_accuracy_score(targets, preds)),
        "kappa": float(cohen_kappa_score(targets, preds)),
        "weighted_kappa": float(cohen_kappa_score(targets, preds, weights="quadratic")),
        "roc_auc": float(auc),
        "weighted_f1": float(rep["weighted avg"]["f1-score"]),
        "report": rep,
    }
    return {k: out[k] for k in (*metrics, )} if metrics else out


def run_mizero(
    batches: Iterable[BagBatch],
    classifier: np.ndarray,
    *,
    logit_scale: float = CONCH_TEMPERATURE,
    topj: Sequence[int] = (1, 5, 10, 50, 100),
    project_fn: Callable[[jax.Array], jax.Array] | None = None,
    metrics: Sequence[str] = ("acc", "bacc", "weighted_kappa", "kappa",
                              "roc_auc", "weighted_f1"),
    dump_patch_level: bool = False,
):
    """Slide-level MI-Zero evaluation over padded bag batches.

    ``project_fn`` optionally maps patch features into the contrastive space
    (the reference's ``visual.forward_project``); features are then
    L2-normalized and scored against ``classifier [D, C]``.
    Returns ``(results {metric: {j: value}}, dump)``.
    """
    w = jnp.asarray(classifier)
    topj = tuple(topj)

    @jax.jit
    def batch_logits(features, mask):
        def per_slide(f, m):
            if project_fn is not None:
                f = project_fn(f)
            f = f / jnp.linalg.norm(f, axis=-1, keepdims=True).clip(1e-12)
            logits = f @ w
            pooled = multi_topj_pooling(logits, m, topj)
            return jnp.stack([pooled[j] for j in topj]), logits

        return jax.vmap(per_slide)(features, mask)

    pooled_all: dict[int, list] = {j: [] for j in topj}
    targets_all, patch_dump, coords_dump = [], [], []
    for batch in batches:
        pooled, patch_logits = batch_logits(batch.features, batch.mask)
        labels = np.asarray(batch.labels)
        keep = labels >= 0
        pooled = np.asarray(pooled)[keep]  # [B, n_j, C]
        for ji, j in enumerate(topj):
            pooled_all[j].append(pooled[:, ji])
        targets_all.append(labels[keep])
        if dump_patch_level:
            pl = np.asarray(patch_logits)
            for i in np.where(keep)[0]:
                n = int(batch.n_patches[i])
                patch_dump.append(pl[i, :n])
                if batch.coords is not None:
                    coords_dump.append(np.asarray(batch.coords[i, :n]))

    targets = np.concatenate(targets_all)
    results: dict[str, dict[int, float]] = {m: {} for m in metrics}
    dump = {"targets": targets, "logits": {}, "preds": {}}
    for j in topj:
        logits_j = np.concatenate(pooled_all[j])
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits_j) * logit_scale, axis=1))
        preds = probs.argmax(1)
        m = classification_metrics(probs, preds, targets, metrics)
        for name in metrics:
            results[name][j] = m[name]
        dump["logits"][j] = logits_j
        dump["preds"][j] = preds
    if dump_patch_level:
        dump["patch_logits"] = patch_dump
        dump["coords"] = coords_dump
    return results, dump


def run_zeroshot_tiles(
    encode_fn: Callable[[jax.Array], jax.Array],
    tile_batches: Iterable[tuple[np.ndarray, np.ndarray]],
    classifier: np.ndarray,
    *,
    logit_scale: float = CONCH_TEMPERATURE,
    metrics: Sequence[str] = ("acc", "bacc", "weighted_kappa", "kappa",
                              "roc_auc", "weighted_f1"),
):
    """Tile-level zero-shot classification (ref ``run_zeroshot``):
    ``encode_fn`` maps an image batch to normalized embeddings."""
    w = jnp.asarray(classifier)
    logits_all, targets_all = [], []
    for imgs, labels in tile_batches:
        emb = encode_fn(jnp.asarray(imgs))
        logits_all.append(np.asarray(emb @ w))
        targets_all.append(np.asarray(labels))
    logits = np.concatenate(logits_all)
    targets = np.concatenate(targets_all)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits) * logit_scale, axis=1))
    preds = probs.argmax(1)
    return classification_metrics(probs, preds, targets, metrics), {
        "logits": logits, "targets": targets, "preds": preds,
    }


# reference-named alias (ref ``zeroshot_path.py:153`` calls this
# ``run_zeroshot``; the _tiles suffix here disambiguates from the
# slide-level ``run_mizero``)
run_zeroshot = run_zeroshot_tiles
