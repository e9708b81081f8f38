"""LongNet dilated attention with lse recombination and sequence parallelism.

Behavioral reference ``/root/reference/models/musk/torchscale/component/
dilated_attention.py:14-217``: for each (segment_length sl, dilated_ratio dr)
branch, the sequence is split into sl-token segments; within a segment, the
heads are partitioned into dr groups and group r keeps every dr-th token
starting at offset r (the diagonal-extract rearrange, ``dense_to_sparse``
16-31); flash attention runs per segment; outputs are scattered back to full
length with the uncovered positions' lse at −1e8 (``sparse_to_dense``
33-53); branches are combined by softmax-of-lse weights computed without
gradient (``scattering`` 100-131).

Sequence/context parallelism (ref ``gather_kv`` 55-74, enabled by
``args.seq_parallel``): with the sequence sharded over a mesh axis, segments
longer than the local shard gather their K/V across the axis with
``lax.all_gather`` (riding ICI; autodiff provides the reduce-scatter
backward), then attention runs locally and recombination is unchanged.
Causal cross-shard segments decompose by source rank (earlier blocks fully
visible, own block locally causal, later blocks masked) and merge by
logsumexp. The reference's causal gather drops the local rank's own K/V — a
behavior we consider a bug and do not reproduce; we keep the full causal
prefix including the local block.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from moc_tpu.ops.flash_attention import flash_attention_with_lse, mha_reference

NEG_LSE = -1e8


@dataclasses.dataclass(frozen=True)
class DilatedConfig:
    segment_lengths: tuple[int, ...] = (2048, 4096, 8192, 16384, 32768)
    dilated_ratios: tuple[int, ...] = (1, 2, 4, 6, 12)
    use_flash: bool = True  # False = jnp reference attention (small shapes)
    # cross-shard K/V movement: "allgather" materializes the whole segment's
    # K/V at once (one collective, W'x peak memory); "ring" rotates one block
    # per hop with lax.ppermute (neighbor-only ICI traffic, 1x peak memory,
    # compute overlaps communication) — same results either way
    gather_mode: str = "allgather"


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


def dense_to_sparse(x: jax.Array, ratio: int) -> jax.Array:
    """``[B, L, H, D] -> [B, L/r, H, D]``: head-group r keeps tokens at
    stride-r offset r (ref ``dense_to_sparse``).

    The diagonal over the (token-offset, head-group) pair is extracted with
    a repeated-index einsum — a pure gather. (r4 contracted against an
    identity matrix instead: r× read amplification and a multiply-reduce
    XLA kept as real work; measured on the r5 dilated profile.)"""
    if ratio == 1:
        return x
    b, l, h, d = x.shape
    x, _ = _pad_to(x, 1, ratio)
    x, head_pad = _pad_to(x, 2, ratio)
    l_pad, h_pad = x.shape[1], x.shape[2]
    lr, h2 = l_pad // ratio, h_pad // ratio
    x6 = x.reshape(b, lr, ratio, ratio, h2, d)  # l=(lr r1), heads=(r2 h2)
    diag = jnp.einsum("blrrhd->blrhd", x6)
    out = diag.reshape(b, lr, ratio * h2, d)
    return out[:, :, :h]


def sparse_to_dense(out: jax.Array, lse: jax.Array, ratio: int):
    """Inverse scatter: ``out [B, Ls, H, D]``, ``lse [B, H, Ls]`` →
    ``([B, H, Ls*r, D], [B, H, Ls*r])`` with uncovered positions zero /
    ``NEG_LSE``."""
    if ratio == 1:
        return out.transpose(0, 2, 1, 3), lse
    b, ls, h, d = out.shape
    out, head_pad = _pad_to(out, 2, ratio)
    lse, _ = _pad_to(lse.transpose(0, 2, 1), 2, ratio)  # [B, Ls, H_pad]
    h_pad = out.shape[2]
    h2 = h_pad // ratio
    # head index = (r, j); dense rows = (l, r1); value only where r1 == r —
    # a pure diagonal SCATTER, placed by static .at[].set slices instead of
    # the r4 outer product against an identity matrix (r² write
    # amplification of zeros XLA materialized as real work)
    out_r = out.reshape(b, ls, ratio, h2, d)
    dense = jnp.zeros((b, ratio, h2, ls, ratio, d), out.dtype)
    lse_r = lse.reshape(b, ls, ratio, h2)
    lse_dense = jnp.full((b, ratio, h2, ls, ratio), NEG_LSE, lse.dtype)
    for r in range(ratio):  # static, r ≤ max dilated ratio (tiny)
        dense = dense.at[:, r, :, :, r, :].set(
            out_r[:, :, r].transpose(0, 2, 1, 3))
        lse_dense = lse_dense.at[:, r, :, :, r].set(
            lse_r[:, :, r].transpose(0, 2, 1))
    dense = dense.reshape(b, h_pad, ls * ratio, d)
    lse_dense = lse_dense.reshape(b, h_pad, ls * ratio)
    return dense[:, :h], lse_dense[:, :h]


def _pad_key_counts(sl_local: int, dr: int, seq_pad: int, n_seg: int,
                    h: int):
    """``[n_seg, h]`` int32: how many ZERO pad keys each segment's sparse
    attention exposes per head.

    Padding enters twice — the sequence tail of the LAST segment
    (``_pad_to(x, 1, sl_local)``) and the per-segment ratio padding inside
    ``dense_to_sparse`` — and a zero key is not harmless: it scores logit 0
    against every query, contributing exactly ``exp(0) = 1`` to the softmax
    denominator (its V row is zero, so the numerator is untouched). The
    counts feed ``_pad_correction`` which removes those denominators
    EXACTLY instead of masking."""
    import numpy as np

    l_pad = -(-sl_local // dr) * dr
    h_pad = -(-h // dr) * dr
    h2 = h_pad // dr
    counts = np.zeros((n_seg, h), np.int32)
    for seg in range(n_seg):
        extra = seq_pad if seg == n_seg - 1 else 0
        pads = range(sl_local - extra, l_pad)
        for hh in range(h):
            j = hh // h2
            counts[seg, hh] = sum(1 for p in pads if p % dr == j)
    return counts


def _pad_correction(out, lse, n_pad):
    """Remove ``n_pad`` zero-key contributions from ``(out, lse)``:
    ``S_real = S − n_pad`` with ``S = exp(lse)``, computed stably as
    ``frac = 1 − n_pad·exp(−lse)``; exact up to f32 rounding and fully
    differentiable (unlike a post-hoc mask, which flash cannot express
    per-head). ``n_pad`` broadcasts against ``lse [B, H, L]``."""
    frac = jnp.clip(1.0 - n_pad * jnp.exp(-lse), 1e-20, None)
    return out / frac[..., None], lse + jnp.log(frac)


def _causal_gathered(qs, kg, vg, p, use_flash, n_pad_blk=None):
    """Causal attention of local queries against a rank-gathered segment.

    ``qs [B, ls, H, D]``; ``kg/vg [W', B, ls, H, D]`` in rank order; ``p`` =
    this rank's (traced) position within the segment group. Sparse positions
    are monotone in global positions, so causality decomposes by source
    block: block r < p fully visible, r == p locally causal, r > p masked.
    Blocks are attended separately and merged by logsumexp (the cross-shard
    online-softmax recombination also used by ``parallel.ring``).

    ``n_pad_blk`` = zero-pad keys per single block (``_pad_key_counts``);
    the causal diagonal call is pad-safe (pad keys sit at strictly later
    sparse positions than every real query), the full-block calls are not.
    """
    from moc_tpu.parallel.ring import _merge_partials

    # NOTE: every gathered block is attended and future blocks discarded by
    # NEG_LSE — ~half the FLOPs are wasted on average vs ring.py's lax.cond
    # past/future skip; acceptable for the gather formulation (the ring
    # gather_mode is the compute-lean path), recorded as a known tradeoff.
    attn = flash_attention_with_lse if use_flash else mha_reference
    qf = qs.transpose(0, 2, 1, 3)  # [B, H, ls, D]

    k_diag = jax.lax.dynamic_index_in_dim(kg, p, axis=0, keepdims=False)
    v_diag = jax.lax.dynamic_index_in_dim(vg, p, axis=0, keepdims=False)
    out, lse = attn(qf, k_diag.transpose(0, 2, 1, 3),
                    v_diag.transpose(0, 2, 1, 3), causal=True)
    for r in range(kg.shape[0]):
        out_r, lse_r = attn(qf, kg[r].transpose(0, 2, 1, 3),
                            vg[r].transpose(0, 2, 1, 3), causal=False)
        if n_pad_blk is not None:
            out_r, lse_r = _pad_correction(out_r, lse_r, n_pad_blk)
        lse_r = jnp.where(r < p, lse_r, NEG_LSE)
        out, lse = _merge_partials(out, lse, out_r, lse_r)
    return out, lse


def _ring_segment(qs, ks, vs, axis_name, perm, rps, p, causal, use_flash,
                  n_pad_blk=None):
    """Ring-rotated segment attention: K/V blocks hop around the segment
    group with ``lax.ppermute`` while each rank accumulates attention
    against the block in front of it, merging partials by logsumexp.

    ``qs/ks/vs [B, ls, H, D]`` are the local sparse blocks; ``p`` = this
    rank's (traced) position in its group. After ``step`` hops the resident
    block originated at group position ``(p - step) % rps``, so under causal
    masking step 0 is the locally-causal diagonal (static!) and later steps
    are included fully iff their origin precedes ``p``.
    """
    from moc_tpu.parallel.ring import _merge_partials

    attn = flash_attention_with_lse if use_flash else mha_reference
    qf = qs.transpose(0, 2, 1, 3)
    out, lse = attn(qf, ks.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1, 3),
                    causal=causal)
    if n_pad_blk is not None and not causal:
        out, lse = _pad_correction(out, lse, n_pad_blk)
    k_blk, v_blk = ks, vs
    for step in range(1, rps):
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        out_i, lse_i = attn(qf, k_blk.transpose(0, 2, 1, 3),
                            v_blk.transpose(0, 2, 1, 3), causal=False)
        if n_pad_blk is not None:
            out_i, lse_i = _pad_correction(out_i, lse_i, n_pad_blk)
        if causal:
            src = (p - step) % rps
            lse_i = jnp.where(src < p, lse_i, NEG_LSE)
        out, lse = _merge_partials(out, lse, out_i, lse_i)
    return out, lse


def _branch(q, k, v, sl, dr, causal, use_flash, axis_name,
            gather_mode="allgather"):
    """One (segment_length, ratio) branch → (out [B,H,L,D], lse [B,H,L])."""
    b, l, h, d = q.shape
    sl_local = min(sl, l)
    qp, pad = _pad_to(q, 1, sl_local)
    kp, _ = _pad_to(k, 1, sl_local)
    vp, _ = _pad_to(v, 1, sl_local)
    n_seg = qp.shape[1] // sl_local

    def segment_sparse(x):
        xs = x.reshape(b * n_seg, sl_local, h, d)
        return dense_to_sparse(xs, dr)  # [B*n, sl/r, H, D]

    qs, ks, vs = segment_sparse(qp), segment_sparse(kp), segment_sparse(vp)

    # zero-pad-key correction (see _pad_key_counts): [n_seg, H] →
    # [B*n_seg, H, 1] aligned with the flattened (b outer, seg inner) batch
    counts = _pad_key_counts(sl_local, dr, pad, n_seg, h)
    if counts.any():
        import numpy as _np

        n_pad_blk = jnp.asarray(_np.tile(counts, (b, 1)),
                                jnp.float32)[:, :, None]
    else:
        n_pad_blk = None

    if axis_name is not None and sl > l:
        # context parallelism: the segment spans the whole axis (or a
        # subgroup); gather K/V across it (ref gather_kv; unlike the
        # reference's causal gather we keep the local rank's own K/V)
        world = jax.lax.psum(1, axis_name)
        ranks_per_segment = min(sl // l, world)
        if world % ranks_per_segment != 0:
            # jnp.take would clip the OOB block index for trailing ranks
            # (silently double-attending the last KV block) and the ring
            # perm would leave them zero-filled; the reference guards the
            # same class of mismatch (``assert sl % seq_len == 0``,
            # dilated_attention.py gather_kv)
            raise ValueError(
                f"dilated CP needs the axis size ({world}) divisible by "
                f"ranks_per_segment ({ranks_per_segment} = min({sl}//{l}, "
                f"world)); pick segment lengths that tile the axis")
        my = jax.lax.axis_index(axis_name)
        if gather_mode == "ring":
            rps = ranks_per_segment
            perm = [(g * rps + i, g * rps + (i + 1) % rps)
                    for g in range(world // rps) for i in range(rps)]
            out, lse = _ring_segment(qs, ks, vs, axis_name, perm, rps,
                                     my % rps, causal, use_flash,
                                     n_pad_blk=n_pad_blk)
        elif causal:
            kg = jax.lax.all_gather(ks, axis_name)  # [W, B*n, ls, H, D]
            vg = jax.lax.all_gather(vs, axis_name)
            if ranks_per_segment < world:
                start = (my // ranks_per_segment) * ranks_per_segment
                idx = start + jnp.arange(ranks_per_segment)
                kg = jnp.take(kg, idx, axis=0)
                vg = jnp.take(vg, idx, axis=0)
            out, lse = _causal_gathered(
                qs, kg, vg, my % ranks_per_segment, use_flash,
                n_pad_blk=n_pad_blk)
        else:
            kg = jax.lax.all_gather(ks, axis_name)
            vg = jax.lax.all_gather(vs, axis_name)
            if ranks_per_segment < world:
                start = (my // ranks_per_segment) * ranks_per_segment
                idx = start + jnp.arange(ranks_per_segment)
                kg = jnp.take(kg, idx, axis=0)
                vg = jnp.take(vg, idx, axis=0)
            # [W', B*n, ls, H, D] -> [B*n, H, W'*ls, D]
            kf = kg.transpose(1, 3, 0, 2, 4).reshape(b * n_seg, h, -1, d)
            vf = vg.transpose(1, 3, 0, 2, 4).reshape(b * n_seg, h, -1, d)
            qf = qs.transpose(0, 2, 1, 3)
            attn = flash_attention_with_lse if use_flash else mha_reference
            out, lse = attn(qf, kf, vf, causal=False)
            if n_pad_blk is not None:  # every gathered block pads alike
                out, lse = _pad_correction(out, lse,
                                           ranks_per_segment * n_pad_blk)
    else:
        # flash kernel layout [B, H, L, D]
        qf = qs.transpose(0, 2, 1, 3)
        kf = ks.transpose(0, 2, 1, 3)
        vf = vs.transpose(0, 2, 1, 3)
        if use_flash:
            # when no pad correction will consume the lse, it flows ONLY to
            # the stop-gradiented branch recombination — lse_grad=False is
            # exact there and routes the backward through the Pallas dq/dkv
            # kernels (measured 2.5× fwd+bwd at L=8192, O(L²)→O(block)
            # memory; BENCH_NOTES r4). With a pad correction the corrected
            # output's factor depends on lse, so keep the dense-vjp mode.
            needs_lse_grad = n_pad_blk is not None and not causal
            out, lse = flash_attention_with_lse(qf, kf, vf, causal=causal,
                                                lse_grad=needs_lse_grad)
        else:
            out, lse = mha_reference(qf, kf, vf, causal=causal)
        # causal needs no correction: pad keys sit at strictly later sparse
        # positions than every real query (see _pad_key_counts)
        if n_pad_blk is not None and not causal:
            out, lse = _pad_correction(out, lse, n_pad_blk)
    # back to [B*n, ls, H, D]
    out = out.transpose(0, 2, 1, 3)
    # sparse_to_dense scatters to ls*dr >= sl_local rows (ratio padding);
    # trim the pad tail before the segment reshape (it assumed divisibility
    # and crashed on e.g. sl_local=8, dr=3)
    dense, lse_dense = sparse_to_dense(out, lse, dr)
    dense = dense[:, :, :sl_local]
    lse_dense = lse_dense[:, :, :sl_local]
    dense = dense.reshape(b, n_seg, h, sl_local, d).transpose(0, 2, 1, 3, 4)
    dense = dense.reshape(b, h, n_seg * sl_local, d)[:, :, :l]
    lse_full = lse_dense.reshape(b, n_seg, h, sl_local).transpose(0, 2, 1, 3)
    lse_full = lse_full.reshape(b, h, n_seg * sl_local)[:, :, :l]
    return dense, lse_full


def dilated_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cfg: DilatedConfig = DilatedConfig(),
    *,
    causal: bool = False,
    axis_name: str | None = None,
) -> jax.Array:
    """Multi-branch dilated attention. ``q,k,v [B, L, H, D]`` (L = local
    shard when ``axis_name`` names a sequence mesh axis) → ``[B, L, H*D]``.

    Branch outputs are averaged with softmax(lse) weights (stop-gradient, as
    the reference computes them under ``torch.no_grad``)."""
    assert len(cfg.segment_lengths) == len(cfg.dilated_ratios)
    outs, lses = [], []
    for sl, dr in zip(cfg.segment_lengths, cfg.dilated_ratios):
        o, s = _branch(q, k, v, sl, dr, causal, cfg.use_flash, axis_name,
                       gather_mode=cfg.gather_mode)
        outs.append(o)
        lses.append(s)
    all_lse = jnp.stack(lses)  # [n_branch, B, H, L]
    weights = jax.lax.stop_gradient(jax.nn.softmax(all_lse, axis=0))
    combined = sum(w[..., None] * o for w, o in zip(weights, outs))  # [B, H, L, D]
    b, h, l, d = combined.shape
    return combined.transpose(0, 2, 1, 3).reshape(b, l, h * d)
