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

    Rows beyond ``count`` may be gathered PAD rows holding arbitrary values
    (NaN/inf included), so they are excluded with ``where`` — a multiply by
    the 0 weight would propagate NaN (0·NaN = NaN). A zero-valid bag
    (``count == 0``) returns the ``NEG_INF`` no-prediction sentinel, the
    documented contract every mask-formulation pooling path already honors."""
    k = values.shape[0]
    eff = jnp.minimum(jnp.asarray(j, jnp.int32), count.astype(jnp.int32))
    eff = jnp.maximum(eff, 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    picked = jnp.where(pos < eff, values, jnp.zeros_like(values))
    mean = jnp.sum(picked, axis=0) / eff.astype(values.dtype)
    return jnp.where(count.astype(jnp.int32) > 0, mean,
                     jnp.full_like(mean, NEG_INF))


def bottomk_bg_key(logits_ext: jax.Array, valid: jax.Array, n_fg: int,
                   detection: bool = False) -> jax.Array:
    """THE bottom-k stage-1 ranking key: negated background-logit sum,
    invalid rows pushed to the end with ``NEG_INF`` (ref
    ``index_bottomk_irrel_classifier``; ascending-bg order == descending
    key order). Single definition shared by every bottom-k formulation —
    ``select_bottomk_irrel``, the stacked-union key rows, the threshold
    union, and the pooling stage 1 — so the key cannot drift between the
    equality-tested paths."""
    bg = logits_ext[:, 1:] if detection else logits_ext[:, n_fg:]
    return jnp.where(valid, -jnp.sum(bg, axis=1), NEG_INF)


def bottomk_stage_valid(kb: int, valid: jax.Array) -> jax.Array:
    """Stage-2 row validity for a ``[kb]`` bottom-k gather: positions past
    the number of valid rows point at pad rows and must be masked. The
    single definition of the stage-count rule (see ``bottomk_bg_key``)."""
    bk_count = jnp.minimum(kb, jnp.sum(valid))
    pos = jax.lax.broadcasted_iota(jnp.int32, (kb,), 0)
    return pos < bk_count


def monotone_u32(x: jax.Array) -> jax.Array:
    """Order-preserving f32 → u32 map (the radix-sort trick): flip all bits
    of negatives, set the sign bit of non-negatives. ``+0.0`` is added first
    so −0.0 compares equal to +0.0, as float comparison (and ``top_k``)
    does. Shared by every threshold-search top-k variant (the Pallas kernel
    keeps an in-kernel int32 restatement — Mosaic-side constraint)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32) + 0.0,
                                        jnp.uint32)
    return jnp.where(bits >> 31 == 1, ~bits, bits | jnp.uint32(0x80000000))


def _default_descent_bits() -> int:
    """Bits per descent step (``MOC_TPU_DESCENT_BITS`` override for A/B).
    Default 1 until the TPU A/B crowns a wider step (see BENCH_NOTES)."""
    import os

    return int(os.environ.get("MOC_TPU_DESCENT_BITS", "1"))


def threshold_topk_mask(keys: jax.Array, k: int, axis: int,
                        bits_per_step: int | None = None) -> jax.Array:
    """Exact top-k MEMBERSHIP mask along ``axis`` — the set ``top_k`` would
    select with its tie handling (ties at the k-th value → lowest index) —
    via a bitwise threshold search instead of a sort: descend to the k-th
    largest value per slice (one fused compare+reduce per step), then take
    above-threshold entries plus the first ``k − #above`` ties in index
    order. Exactly ``k`` True per slice.

    ``bits_per_step`` trades sequential depth for compare width: the
    32-step/1-bit descent is a latency chain of 32 dependent reduce passes;
    ``g`` bits per step tests all ``2^g − 1`` candidate prefixes of a group
    at once (one widened compare+reduce, candidates stacked on a trailing
    dim) in ``32/g`` steps. Bit-identical for every ``g`` dividing 32."""
    g = bits_per_step if bits_per_step is not None else _default_descent_bits()
    # g must divide 32, and the widened step materializes 2^g - 1 candidate
    # columns — g > 8 would build multi-GB compare tensors, so reject it
    assert 32 % g == 0 and g <= 8, "bits_per_step must be in {1, 2, 4, 8}"
    u = monotone_u32(keys)
    ax = axis % u.ndim
    exp = lambda t: jnp.expand_dims(t, axis)

    if g == 1:
        def body(i, t):
            cand = t | (jnp.uint32(1) << jnp.uint32(31 - i))
            cnt = jnp.sum((u > exp(cand)).astype(jnp.int32), axis=axis)
            return jnp.where(cnt >= k, cand, t)
    else:
        js = jnp.arange(1, 2 ** g, dtype=jnp.uint32)  # [2^g - 1]

        def body(i, t):
            shift = jnp.uint32(32 - g * (i + 1))
            cands = t[..., None] | (js << shift)        # [*slice, m]
            cnt = jnp.sum((u[..., None] > jnp.expand_dims(cands, ax))
                          .astype(jnp.int32), axis=ax)  # [*slice, m]
            # cnt is non-increasing in j, so the best prefix index j* is
            # simply the number of candidates still holding >= k survivors
            jstar = jnp.sum((cnt >= k).astype(jnp.uint32), axis=-1)
            return jnp.where(jstar > 0, t | (jstar << shift), t)

    shape = u.shape[:axis] + u.shape[axis:][1:] if axis != -1 else u.shape[:-1]
    t = jax.lax.fori_loop(0, 32 // g, body, jnp.zeros(shape, jnp.uint32))
    have = jnp.sum((u > 0).astype(jnp.int32), axis=axis) >= k
    vk = exp(jnp.where(have, t + 1, 0))
    above = u > vk
    fill = k - jnp.sum(above.astype(jnp.int32), axis=axis, keepdims=True)
    tie = u == vk
    rank = jnp.cumsum(tie.astype(jnp.int32), axis=axis)
    return above | (tie & (rank <= fill))


def masked_col_topk_mask(scores: jax.Array, valid: jax.Array, k: int) -> jax.Array:
    """Column-wise exact top-k MEMBERSHIP mask over valid rows — the set
    ``masked_col_topk`` would select (ties → lowest row), without the
    ``[N, C] → [C, N]`` transpose + sort that dominate its cost on TPU
    (everything stays in the natural ``[N, C]`` layout).

    Returns bool ``[N, C]``; exactly ``k`` True per column (padded rows
    included when fewer than ``k`` are valid — AND with ``valid`` to drop).
    """
    return threshold_topk_mask(masked_logits(scores, valid), k, axis=0)
