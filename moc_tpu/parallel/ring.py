"""Ring attention: context parallelism with point-to-point KV rotation.

An upgrade over the reference's gather-based sequence parallelism
(``dilated_attention.py:55-98`` all-gathers the full KV across the data-
parallel group): KV blocks rotate around the mesh axis with
``lax.ppermute`` (neighbor-only ICI traffic) while each device accumulates
attention against the block in front of it, merging partial results with
the flash kernel's logsumexp — the cross-chip form of online softmax
(see the attention-optimization guide §16).

Total bytes moved equal one all-gather, but as N−1 neighbor hops that XLA
can overlap with the per-block attention compute, and peak memory stays at
one KV block instead of the whole sequence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moc_tpu.ops.flash_attention import flash_attention_with_lse, mha_reference


def _merge_partials(out_a, lse_a, out_b, lse_b):
    """Combine two attention partials by their logsumexps (stable)."""
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    denom = wa + wb
    out = (wa[..., None] * out_a + wb[..., None] * out_b) / denom[..., None]
    return out, m + jnp.log(denom)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    *,
    causal: bool = False,
    use_flash: bool | None = None,
    sm_scale: float | None = None,
) -> jax.Array:
    """Full-sequence attention over a sequence-sharded mesh axis.

    Inside ``shard_map``: ``q, k, v [B, H, L_local, D]`` are the local
    shards; every query attends every global key. ``causal`` masks by GLOBAL
    position (shard ``i`` holds positions ``[i·L_local, (i+1)·L_local)``).
    Returns the local output shard ``[B, H, L_local, D]``.
    """
    if use_flash is None:
        # the Pallas kernel only lowers inside shard_map on real TPUs
        # (interpret mode does not); fall back to the jnp path elsewhere
        use_flash = jax.default_backend() == "tpu"
    world = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    l_local = q.shape[2]
    perm = [(i, (i + 1) % world) for i in range(world)]

    attn = (
        flash_attention_with_lse if use_flash
        else (lambda q_, k_, v_, **kw: mha_reference(q_, k_, v_, **kw))
    )

    # Causal blockwise structure (review r3 — the old path ran a dense
    # [L,L] f32 score tensor for EVERY block): with per-shard position
    # bands, the diagonal block (src == my) is exactly the kernel's LOCAL
    # causal case, fully-past blocks (src < my) need no mask at all, and
    # fully-future blocks (src > my) contribute provably-zero merge weight
    # — lax.cond skips their compute entirely at runtime.
    neg_lse = jnp.float32(-0.7 * jnp.finfo(jnp.float32).max)

    def past_block(k_blk, v_blk):
        o, l = attn(q, k_blk, v_blk, sm_scale=sm_scale)
        # pin branch output types (cond requires both branches identical;
        # the reference path returns f32 outputs for bf16 inputs)
        return o.astype(q.dtype), l.astype(jnp.float32)

    def future_block(k_blk, v_blk):
        # derive from q/k so the outputs carry the same varying-axes type
        # as the past branch inside shard_map (plain constants are
        # "unvarying" and cond rejects the branch mismatch)
        zero = q * 0 + k_blk[..., :1, :] * 0
        return zero, zero[..., 0].astype(jnp.float32) + neg_lse

    # step 0: local (diagonal) block — local causal ⇔ global causal here
    out, lse = attn(q, k, v, sm_scale=sm_scale, causal=causal)
    k_blk, v_blk = k, v
    for step in range(1, world):
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        src = (my - step) % world
        if causal:
            out_i, lse_i = jax.lax.cond(src < my, past_block, future_block,
                                        k_blk, v_blk)
        else:
            out_i, lse_i = past_block(k_blk, v_blk)
        out, lse = _merge_partials(out, lse, out_i, lse_i)
    return out
