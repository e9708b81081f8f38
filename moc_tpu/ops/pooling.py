"""Slide-level pooling policies over padded patch-logit bags.

TPU-native rebuild of the reference pooling family
(``/root/reference/utils/patch_selection_classifier.py:18-348``). Every policy
maps patch logits ``[N, C]`` (+ validity mask ``[N]``) to pooled slide logits
``[C]``:

  * ``topj_pooling``              — mean of per-class top-j logits.
  * ``delta_softmax_pooling``     — rank per class by row-softmax, pool the
                                    *original* logits at the selected rows.
  * ``delta_diff_pooling``        — rank rows by |top1-top2| margin, pool rows.
  * ``topj_delta_softmax_pooling``— rank by softmax*logits product.
  * ``topj_delta_diff_pooling``   — rank by logits*margin product.
  * ``bottomk_irrel_*``           — two-stage: bottom-k rows by summed
                                    background-class logits, then a top-j
                                    policy over the foreground logits of those
                                    rows (optionally ``detection`` mode keeping
                                    a top-1 background column).

All functions are pure, statically shaped, jit/vmap-friendly. ``topj`` is a
static Python int (the reference's tuple-of-j dict interface is provided by
callers looping over static js). When fewer than ``topj`` rows are valid the
mean is count-corrected, matching the reference's ``maxj = min(j, N)`` clamp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moc_tpu.ops.masking import (NEG_INF, masked_col_topk,
                                 masked_col_topk_mask, masked_row_margin,
                                 topk_mean)


def _masked_sel_mean(logits: jax.Array, sel: jax.Array, valid: jax.Array,
                     topj: int, count: jax.Array) -> jax.Array:
    """Mean of ``logits`` over the per-class membership mask ``sel [N, C]``
    (∩ valid), count-corrected like ``topk_mean``: divide by
    ``max(min(topj, count), 1)``; all-pad bags pool to ``NEG_INF`` (matching
    the sorted path, whose first masked value is the fill).

    Caveat (degenerate, unreachable with finite real logits): a *valid*
    entry exactly equal to the ``NEG_INF`` fill that ties against a padded
    row contributes its value here but the fill value on the sorted path, so
    the two paths' bit-identity holds only for logits > ``NEG_INF`` — i.e.
    any output of a real matmul."""
    keep = sel & valid[:, None]
    eff = jnp.maximum(jnp.minimum(jnp.asarray(topj, jnp.int32),
                                  count.astype(jnp.int32)), 1)
    # where, not multiply: padded rows may hold NaN/inf and 0·NaN = NaN
    pooled = jnp.sum(jnp.where(keep, logits, 0.0), axis=0) / eff.astype(
        logits.dtype)
    return jnp.where(count > 0, pooled, jnp.asarray(NEG_INF, logits.dtype))


def _rank_pool(ranking: jax.Array, logits: jax.Array, valid: jax.Array,
               topj: int, count: jax.Array) -> jax.Array:
    """Pool original ``logits`` at the per-class top-j set of ``ranking``
    scores, via the transpose-free threshold membership mask (the sorted
    gather path is kept for ``return_indices`` callers)."""
    sel = masked_col_topk_mask(ranking, valid, min(topj, logits.shape[0]))
    return _masked_sel_mean(logits, sel, valid, topj, count)


def _gather_cols(mat: jax.Array, idx: jax.Array) -> jax.Array:
    """``out[r, c] = mat[idx[r, c], c]`` for idx ``[k, C]`` into mat ``[N, C]``."""
    return jnp.take_along_axis(mat, idx, axis=0)


def _finish(values: jax.Array, idx: jax.Array, topj: int, count: jax.Array, return_indices: bool):
    pooled = topk_mean(values, topj, count)
    if return_indices:
        return pooled, idx
    return pooled


def topj_pooling(logits, valid, topj: int, *, return_indices: bool = False):
    """Mean of per-class top-j logits (reference ``topj_pooling``)."""
    n_valid = jnp.sum(valid)
    if not return_indices:
        return _rank_pool(logits, logits, valid, topj, n_valid)
    vals, idx = masked_col_topk(logits, valid, min(topj, logits.shape[0]))
    return _finish(vals, idx, topj, n_valid, return_indices)


def delta_softmax_pooling(logits, valid, topj: int, *, return_indices: bool = False):
    """Rank per class by row-softmax probability; pool original logits."""
    n_valid = jnp.sum(valid)
    probs = jax.nn.softmax(logits, axis=1)
    if not return_indices:
        return _rank_pool(probs, logits, valid, topj, n_valid)
    _, idx = masked_col_topk(probs, valid, min(topj, logits.shape[0]))
    vals = _gather_cols(logits, idx)
    return _finish(vals, idx, topj, n_valid, return_indices)


def delta_diff_pooling(logits, valid, topj: int, *, return_indices: bool = False):
    """Rank rows by |top1-top2| margin; pool whole rows of original logits."""
    n_valid = jnp.sum(valid)
    margin = masked_row_margin(logits)
    if not return_indices:
        return _rank_pool(margin[:, None], logits, valid, topj, n_valid)
    margin_m = jnp.where(valid, margin, NEG_INF)
    _, row_idx = jax.lax.top_k(margin_m, min(topj, logits.shape[0]))  # [k]
    vals = logits[row_idx]  # [k, C]
    idx = jnp.broadcast_to(row_idx[:, None], vals.shape)
    return _finish(vals, idx, topj, n_valid, return_indices)


def topj_delta_softmax_pooling(logits, valid, topj: int, *, return_indices: bool = False):
    """Rank per class by softmax*logits product; pool original logits."""
    n_valid = jnp.sum(valid)
    mix = jax.nn.softmax(logits, axis=1) * logits
    if not return_indices:
        return _rank_pool(mix, logits, valid, topj, n_valid)
    _, idx = masked_col_topk(mix, valid, min(topj, logits.shape[0]))
    vals = _gather_cols(logits, idx)
    return _finish(vals, idx, topj, n_valid, return_indices)


def topj_delta_diff_pooling(logits, valid, topj: int, *, return_indices: bool = False):
    """Rank per class by logits*margin product; pool original logits."""
    n_valid = jnp.sum(valid)
    margin = masked_row_margin(logits)
    mix = logits * margin[:, None]
    if not return_indices:
        return _rank_pool(mix, logits, valid, topj, n_valid)
    _, idx = masked_col_topk(mix, valid, min(topj, logits.shape[0]))
    vals = _gather_cols(logits, idx)
    return _finish(vals, idx, topj, n_valid, return_indices)


def _bottomk_stage1(logits, valid, n_fg: int, bottomk: int, detection: bool):
    """Stage 1 of the bottom-k-irrelevant family.

    Selects the ``bottomk`` valid rows with the *smallest* summed
    background-class logits (reference
    ``patch_selection_classifier.py:127-171``). Returns the gathered
    foreground logits of those rows, their original row indices, and the
    dynamic stage count.
    """
    from moc_tpu.ops.masking import bottomk_bg_key, bottomk_stage_valid

    n = logits.shape[0]
    kb = min(bottomk, n)
    if detection:
        fg = logits[:, :1]
        top1_bg = jax.lax.top_k(logits[:, 1:], 1)[0]  # [N, 1]
    else:
        fg = logits[:, :n_fg]
    # shared stage-1 key + stage-count rule (masking.bottomk_bg_key)
    bg_key = bottomk_bg_key(logits, valid, n_fg, detection)
    _, bk_idx = jax.lax.top_k(bg_key, kb)  # [kb]
    bk_count = jnp.minimum(kb, jnp.sum(valid))
    fg_rows = fg[bk_idx]  # [kb, n_fg]
    if detection:
        fg_rows = jnp.concatenate([fg_rows, top1_bg[bk_idx]], axis=1)
    stage_valid = bottomk_stage_valid(kb, valid)
    return fg_rows, bk_idx, stage_valid, bk_count


def _bottomk_family(logits, valid, topj, n_fg, bottomk, detection, return_indices, rank_fn):
    """Common stage-2 driver: rank gathered fg rows with ``rank_fn``; pool fg logits."""
    if bottomk is None:
        bottomk = topj
    fg_rows, bk_idx, stage_valid, bk_count = _bottomk_stage1(logits, valid, n_fg, bottomk, detection)
    scores = rank_fn(fg_rows)
    k2 = min(topj, fg_rows.shape[0])
    _, idx2 = masked_col_topk(scores, stage_valid, k2)  # [k2, Cfg] indices into fg_rows
    vals = _gather_cols(fg_rows, idx2)
    count = jnp.minimum(jnp.asarray(topj, jnp.int32), bk_count.astype(jnp.int32))
    idx = bk_idx[idx2]  # back to original row indices
    return _finish(vals, idx, topj, count, return_indices)


def bottomk_irrel_pooling(logits, valid, topj: int, *, n_fg: int, bottomk: int | None = None,
                          detection: bool = False, return_indices: bool = False):
    """Bottom-k by background sum, then per-class top-j of fg logits."""
    return _bottomk_family(logits, valid, topj, n_fg, bottomk, detection, return_indices,
                           rank_fn=lambda fg: fg)


def bottomk_irrel_delta_softmax_pooling(logits, valid, topj: int, *, n_fg: int,
                                        bottomk: int | None = None, detection: bool = False,
                                        return_indices: bool = False):
    """Bottom-k by background sum, then rank fg rows per class by row-softmax."""
    return _bottomk_family(logits, valid, topj, n_fg, bottomk, detection, return_indices,
                           rank_fn=lambda fg: jax.nn.softmax(fg, axis=1))


def bottomk_irrel_delta_diff_pooling(logits, valid, topj: int, *, n_fg: int,
                                     bottomk: int | None = None, detection: bool = False,
                                     return_indices: bool = False):
    """Bottom-k by background sum, then rank fg rows by |top1-top2| margin."""
    def rank(fg):
        return jnp.broadcast_to(masked_row_margin(fg)[:, None], fg.shape)
    return _bottomk_family(logits, valid, topj, n_fg, bottomk, detection, return_indices, rank)


def topj_bottomk_irrel_delta_softmax_pooling(logits, valid, topj: int, *, n_fg: int,
                                             bottomk: int | None = None, detection: bool = False,
                                             return_indices: bool = False):
    """Bottom-k by background sum, then rank fg rows by softmax*fg product."""
    return _bottomk_family(logits, valid, topj, n_fg, bottomk, detection, return_indices,
                           rank_fn=lambda fg: jax.nn.softmax(fg, axis=1) * fg)


def topj_bottomk_irrel_delta_diff_pooling(logits, valid, topj: int, *, n_fg: int,
                                          bottomk: int | None = None, detection: bool = False,
                                          return_indices: bool = False):
    """Bottom-k by background sum, then rank fg rows by fg*margin product."""
    def rank(fg):
        return fg * masked_row_margin(fg)[:, None]
    return _bottomk_family(logits, valid, topj, n_fg, bottomk, detection, return_indices, rank)


# Families that rank/pool the foreground (tumor-bank) logits in zero-shot
# evaluation; the remaining (bottomk_irrel) families consume the extended
# bank with ``n_fg = n_classes`` (ref ``main_moc.py:429-432``; the reference
# only lists the 3 non-product fg functions there because its zs path is
# never called with the product variants — they are fg rankers too).
FOREGROUND_POOLINGS = frozenset({
    "topj", "delta_softmax", "delta_diff",
    "topj_delta_softmax", "topj_delta_diff",
})

# Name → callable registry mirroring the reference method list
# (``patch_selection_classifier.py:8-15``). Bottom-k entries require ``n_fg``.
POOLING_REGISTRY = {
    "topj": topj_pooling,
    "delta_softmax": delta_softmax_pooling,
    "delta_diff": delta_diff_pooling,
    "topj_delta_softmax": topj_delta_softmax_pooling,
    "topj_delta_diff": topj_delta_diff_pooling,
    "bottomk_irrel": bottomk_irrel_pooling,
    "bottomk_irrel_delta_softmax": bottomk_irrel_delta_softmax_pooling,
    "bottomk_irrel_delta_diff": bottomk_irrel_delta_diff_pooling,
    "topj_bottomk_irrel_delta_softmax": topj_bottomk_irrel_delta_softmax_pooling,
    "topj_bottomk_irrel_delta_diff": topj_bottomk_irrel_delta_diff_pooling,
}
