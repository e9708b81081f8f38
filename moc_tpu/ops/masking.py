"""Masking helpers shared by the selection/pooling op family.

Padded bags are ``[N, ...]`` arrays with a boolean ``[N]`` validity mask.
Every top-k style op masks invalid rows to a large finite negative (finite so
that means/softmaxes never produce NaN) and corrects reduction counts by the
dynamic number of valid rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large finite negative used to exclude padded rows from top-k. Finite (not
# -inf) so downstream means over accidentally-included pad rows stay NaN-free;
# count-corrected reductions never actually read these values.
NEG_INF = -1e30


def masked_logits(logits: jax.Array, valid: jax.Array, fill: float = NEG_INF) -> jax.Array:
    """Replace rows of ``logits [N, C]`` where ``valid [N]`` is False by ``fill``."""
    return jnp.where(valid[:, None], logits, fill)


def topk_fn(approx: bool):
    """Exact ``lax.top_k`` or TPU-accelerated ``lax.approx_max_k`` (the
    hardware top-k unit; ~recall 0.95 at default settings, exact on CPU)."""
    if approx:
        return lambda x, k: jax.lax.approx_max_k(x, k)
    return jax.lax.top_k


def masked_col_topk(scores: jax.Array, valid: jax.Array, k: int,
                    approx: bool = False):
    """Column-wise top-k over valid rows.

    Args:
      scores: ``[N, C]`` ranking scores.
      valid:  ``[N]`` bool.
      k:      static top count; must satisfy ``k <= N``.
      approx: use the TPU approximate top-k unit (selection sets may differ
              slightly; pooling/means stay count-corrected).

    Returns:
      ``(values [k, C], indices [k, C])`` — per column, row indices sorted by
      descending score among valid rows. When fewer than ``k`` rows are valid,
      trailing entries point at padded rows (score ``NEG_INF``); callers must
      count-correct with ``jnp.sum(valid)``.
    """
    m = masked_logits(scores, valid)
    vals, idx = topk_fn(approx)(m.T, k)  # [C, k]
    return vals.T, idx.T


def masked_row_margin(logits: jax.Array) -> jax.Array:
    """Per-row |top1 - top2| margin of ``logits [N, C]`` → ``[N]``.

    Mirrors the reference margin score (top-1 minus top-2 logit per patch,
    ``/root/reference/utils/patch_selection_classifier_index.py:38-51``).
    Row-local: padding-invariant.
    """
    top2 = jax.lax.top_k(logits, 2)[0]
    return jnp.abs(top2[:, 0] - top2[:, 1])


def topk_mean(values: jax.Array, j: int, count: jax.Array) -> jax.Array:
    """Mean of the first ``min(j, count)`` rows of descending-sorted ``values [k, C]``.

    ``count`` is the dynamic number of genuinely ranked rows (e.g. number of
    valid patches); mirrors the reference's ``maxj = min(max(topj), N)`` clamp.
    """
    k = values.shape[0]
    eff = jnp.minimum(jnp.asarray(j, jnp.int32), count.astype(jnp.int32))
    eff = jnp.maximum(eff, 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    w = (pos < eff).astype(values.dtype)
    return jnp.sum(values * w, axis=0) / eff.astype(values.dtype)


def masked_col_topk_mask(scores: jax.Array, valid: jax.Array, k: int) -> jax.Array:
    """Column-wise exact top-k MEMBERSHIP mask over valid rows — the set
    ``masked_col_topk`` would select (ties → lowest row), without the
    ``[N, C] → [C, N]`` transpose + sort that dominate its cost on TPU.

    Same bitwise threshold search as ``selection.topk_threshold_mask`` but
    along axis 0 so everything stays in the natural ``[N, C]`` layout: map
    the masked scores to monotone uint32, bit-descend to each column's k-th
    value (32 fused compare+reduce passes), then take above-threshold rows
    plus the first ``k − #above`` ties in row order.

    Returns bool ``[N, C]``; exactly ``k`` True per column (padded rows
    included when fewer than ``k`` are valid — AND with ``valid`` to drop).
    """
    m = masked_logits(scores, valid) + 0.0  # -0.0 → +0.0, as compares order
    bits = jax.lax.bitcast_convert_type(m.astype(jnp.float32), jnp.uint32)
    u = jnp.where(bits >> 31 == 1, ~bits, bits | jnp.uint32(0x80000000))

    def body(i, t):
        cand = t | (jnp.uint32(1) << jnp.uint32(31 - i))
        cnt = jnp.sum((u > cand[None, :]).astype(jnp.int32), axis=0)
        return jnp.where(cnt >= k, cand, t)

    t = jax.lax.fori_loop(0, 32, body, jnp.zeros(u.shape[1:], jnp.uint32))
    have = jnp.sum((u > 0).astype(jnp.int32), axis=0) >= k
    vk = jnp.where(have, t + 1, 0)[None, :]
    above = u > vk
    fill = k - jnp.sum(above.astype(jnp.int32), axis=0, keepdims=True)
    tie = u == vk
    rank = jnp.cumsum(tie.astype(jnp.int32), axis=0)
    return above | (tie & (rank <= fill))
