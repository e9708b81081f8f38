"""NumPy oracles for the selection/pooling family.

Independent re-statements of the reference algorithms
(``/root/reference/utils/patch_selection_classifier*.py``) in plain NumPy on
unpadded bags; used as ground truth for the masked JAX ops. Written against
the *behavior* documented in SURVEY.md §2.2, not ported code.
"""

from __future__ import annotations

import numpy as np


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    z = x - x.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def col_topk_idx(scores: np.ndarray, k: int) -> np.ndarray:
    """Per-column indices of the k largest rows, descending. [k, C]"""
    order = np.argsort(-scores, axis=0, kind="stable")
    return order[:k]


def row_margin(logits: np.ndarray) -> np.ndarray:
    srt = np.sort(logits, axis=1)
    return np.abs(srt[:, -1] - srt[:, -2])


def topj_pool(logits: np.ndarray, j: int) -> np.ndarray:
    k = min(j, logits.shape[0])
    vals = -np.sort(-logits, axis=0)[:k]
    return vals.mean(axis=0)


def delta_softmax_pool(logits: np.ndarray, j: int) -> np.ndarray:
    k = min(j, logits.shape[0])
    idx = col_topk_idx(softmax(logits, axis=1), k)
    vals = np.take_along_axis(logits, idx, axis=0)
    return vals.mean(axis=0)


def delta_diff_pool(logits: np.ndarray, j: int) -> np.ndarray:
    k = min(j, logits.shape[0])
    order = np.argsort(-row_margin(logits), kind="stable")[:k]
    return logits[order].mean(axis=0)


def topj_delta_softmax_pool(logits: np.ndarray, j: int) -> np.ndarray:
    k = min(j, logits.shape[0])
    mix = softmax(logits, axis=1) * logits
    idx = col_topk_idx(mix, k)
    vals = np.take_along_axis(logits, idx, axis=0)
    return vals.mean(axis=0)


def topj_delta_diff_pool(logits: np.ndarray, j: int) -> np.ndarray:
    k = min(j, logits.shape[0])
    mix = logits * row_margin(logits)[:, None]
    idx = col_topk_idx(mix, k)
    vals = np.take_along_axis(logits, idx, axis=0)
    return vals.mean(axis=0)


def _bottomk_stage1(logits_ext: np.ndarray, n_fg: int, bottomk: int, detection: bool):
    if detection:
        fg = logits_ext[:, :1]
        bg = logits_ext[:, 1:]
        top1_bg = bg.max(axis=1, keepdims=True)
    else:
        fg = logits_ext[:, :n_fg]
        bg = logits_ext[:, n_fg:]
    kb = min(bottomk, logits_ext.shape[0])
    bk_idx = np.argsort(bg.sum(axis=1), kind="stable")[:kb]
    fg_rows = fg[bk_idx]
    if detection:
        fg_rows = np.concatenate([fg_rows, top1_bg[bk_idx]], axis=1)
    return fg_rows, bk_idx


def bottomk_irrel_pool(logits_ext, j, n_fg, bottomk=None, detection=False):
    if bottomk is None:
        bottomk = j
    fg_rows, _ = _bottomk_stage1(logits_ext, n_fg, bottomk, detection)
    k = min(j, fg_rows.shape[0])
    vals = -np.sort(-fg_rows, axis=0)[:k]
    return vals.mean(axis=0)


def bottomk_irrel_rank_pool(logits_ext, j, n_fg, rank, bottomk=None, detection=False):
    """Generic stage-2: rank fg rows by `rank(fg_rows)`, pool fg values."""
    if bottomk is None:
        bottomk = j
    fg_rows, _ = _bottomk_stage1(logits_ext, n_fg, bottomk, detection)
    k = min(j, fg_rows.shape[0])
    idx = col_topk_idx(rank(fg_rows), k)
    vals = np.take_along_axis(fg_rows, idx, axis=0)
    return vals.mean(axis=0)


# ---- index-selection oracles (sets of selected row indices) ----

def sel_topj(logits, j):
    k = min(j, logits.shape[0])
    return set(col_topk_idx(logits, k).ravel().tolist())


def sel_delta_softmax(logits, j):
    k = min(j, logits.shape[0])
    return set(col_topk_idx(softmax(logits, axis=1), k).ravel().tolist())


def sel_delta_diff(logits, j):
    k = min(j, logits.shape[0])
    return set(np.argsort(-row_margin(logits), kind="stable")[:k].tolist())


def sel_bottomk_irrel(logits_ext, j, n_fg, bottomk=None, detection=False):
    if bottomk is None:
        bottomk = j
    fg_rows, bk_idx = _bottomk_stage1(logits_ext, n_fg, bottomk, detection)
    k = min(j, fg_rows.shape[0])
    idx2 = col_topk_idx(fg_rows, k)
    return set(bk_idx[idx2].ravel().tolist())
