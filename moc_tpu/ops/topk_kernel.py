"""Pallas TPU kernel: exact top-k SET selection by bitwise threshold search.

Computes, for each row of ``keys [R, N]``, the boolean membership mask of the
k largest elements with ``jax.lax.top_k`` tie semantics (ties at the k-th
value resolve to the lowest indices) — without sorting.

Replaces the batched-sort ``top_k`` in the MOC exact selection path
(ref ``utils/patch_selection_classifier_index.py`` policies all reduce to
"top-k rows of an [N] key vector"). A sort is O(N log N) and, as an XLA
custom call, streams the row from HBM many times; this kernel loads the row
into VMEM ONCE and runs a 32-step radix threshold search in registers:

  1. map f32 → monotone int32 rank space (the radix-sort bit trick;
     ``+0.0`` first so −0.0 ties +0.0 exactly as float compares do);
  2. greedy bit-descent for the k-th largest value v_k: 32 masked counts,
     each one full-row VPU compare+reduce in VMEM;
  3. membership = (v > v_k) ∪ first (k − #above) elements equal to v_k in
     index order; the index-order rank of ties comes from a two-level
     inclusive prefix sum computed as triangular-ones matmuls on the MXU
     (exact in f32 for N < 2^24).

HBM traffic: one read of the row + one mask write — ~35× less than the
fori_loop-over-XLA formulation of the same search, which re-reads the row
every one of the 32 steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
_MSB = -(2 ** 31)  # u32 sign bit (kept a Python int so kernels see a literal)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _monotone_i32(x: jax.Array) -> jax.Array:
    """Order-preserving f32 → int32 map (signed variant of the radix trick):
    ``v = i < 0 ? ~i ^ MSB : i`` so float order ⇔ signed int order."""
    i = jax.lax.bitcast_convert_type(x + 0.0, jnp.int32)
    return jnp.where(i < 0, (~i) ^ jnp.int32(_MSB), i)


def _threshold_kernel(k: int, keys_ref, out_ref):
    v = _monotone_i32(keys_ref[0])  # [G, 128] int32, monotone rank space
    g = v.shape[0]
    kf = jnp.float32(k)

    def body(j, tv):
        b = 31 - j
        # tv is the threshold's int32 view; setting the u32 sign bit (b=31)
        # flips the int32 sign bit instead
        cand = jax.lax.select(b == 31, tv ^ jnp.int32(_MSB),
                              tv | (jnp.int32(1) << jnp.int32(b)))
        cnt = jnp.sum((v > cand).astype(jnp.float32))
        return jax.lax.select(cnt >= kf, cand, tv)

    # tv := max threshold T with #(v > T) ≥ k (greedy over bits, MSB first)
    tv = jax.lax.fori_loop(0, 32, body, jnp.int32(_MSB))
    have = jnp.sum((v > jnp.int32(_MSB)).astype(jnp.float32)) >= kf
    # v_k = tv + 1 in unsigned space; if fewer than k non-minimal elements,
    # the k-th value is the minimum itself
    msb = jnp.int32(_MSB)
    vk = jax.lax.select(have, ((tv ^ msb) + jnp.int32(1)) ^ msb, msb)

    above = v > vk
    m = kf - jnp.sum(above.astype(jnp.float32))
    tie = (v == vk).astype(jnp.float32)

    # index-order rank of ties: two-level inclusive prefix sum as triangular
    # matmuls (MXU; exact in f32 for counts < 2^24)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    upper = (lane_i <= lane_j).astype(jnp.float32)  # inclusive within-lane
    within = jax.lax.dot_general(tie, upper, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    totals = within[:, LANES - 1:LANES]  # [G, 1] per-sublane tie counts
    grp_i = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    grp_j = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    lower = (grp_i > grp_j).astype(jnp.float32)  # exclusive across sublanes
    offset = jax.lax.dot_general(lower, totals, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rank = within + offset  # [G, 128] inclusive rank among ties

    out_ref[0] = above | ((tie > 0.0) & (rank <= m))


def topk_threshold_mask_tpu(keys: jax.Array, k: int) -> jax.Array:
    """``keys [R, N]`` (N a multiple of 128) → bool mask ``[R, N]`` of each
    row's exact top-k set (ties → lowest index). One grid step per row; the
    whole row lives in VMEM (N=16384 ⇒ 64 KB/row)."""
    r, n = keys.shape
    g = n // LANES
    x = keys.astype(jnp.float32).reshape(r, g, LANES)
    out = pl.pallas_call(
        functools.partial(_threshold_kernel, k),
        grid=(r,),
        in_specs=[pl.BlockSpec((1, g, LANES), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, g, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r, g, LANES), jnp.bool_),
        interpret=_interpret(),
    )(x)
    return out.reshape(r, n)
