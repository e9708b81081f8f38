"""Pallas TPU flash attention with logsumexp output (fwd + bwd kernels).

This is the TPU-native replacement for the reference's CUDA attention shim
(``/root/reference/models/musk/torchscale/component/flash_attention.py`` —
``flash_attn`` / xformers CUTLASS behind a custom autograd Function that
saves the per-row logsumexp). The lse output is load-bearing: LongNet's
dilated-attention branch recombination weights branches by their softmax
denominators (``dilated_attention.py:100-131``), and context-parallel
attention merges per-shard partials the same way.

Design (see the Pallas guide + flash-attention tiling notes):
  * grid ``(B, H, Lq/block_q, Lkv/block_k)`` with the KV dimension innermost
    ("arbitrary" semantics — it's the online-softmax reduction);
  * running max ``m``, sum ``l``, and the UNNORMALIZED output accumulator in
    f32 VMEM scratch; normalization + ``lse = m + log(l)`` on the last KV tile;
  * optional causal masking with whole-tile skipping; optional segment ids
    (padding = its own segment) masked at ``-0.7·f32max`` (never ``-inf`` —
    NaN-safe for fully-masked rows);
  * backward via ``jax.custom_vjp`` with separate dq and dkv Pallas kernels
    using the saved ``(out, lse)`` residuals and the precomputed
    ``delta = rowsum(dout * out)``.

All shapes ``[B, H, L, D]``; ``D`` and the block sizes must be multiples of
the TPU lane width (128). On non-TPU backends the kernels run in interpreter
mode so the same code path is testable on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fit_block(requested: int, length: int) -> int:
    """Largest block ≤ requested that divides ``length`` (prefers lane-aligned
    sizes; falls back to the full length for awkward dilated-branch shapes).
    Callers guard lane alignment: lengths not divisible by 128 are routed to
    the XLA path before any kernel is built (``_lane_aligned``), so the
    full-length fallback only ever fires for 128-multiples like 384."""
    for cand in (requested, 512, 256, 128):
        if cand <= requested and length % cand == 0:
            return cand
    return length


def _lane_aligned(lq: int, lkv: int) -> bool:
    """Mosaic requires the lane (last) block dim be a multiple of 128; a
    length with no 128-multiple divisor cannot be tiled legally, so such
    shapes take the plain-XLA path instead of failing to lower."""
    return lq % 128 == 0 and lkv % 128 == 0


# ───────────────────────────── forward ─────────────────────────────


def _fwd_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref,
                o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, sm_scale, causal, block_q, block_k, kv_len, use_segments):
    iq, ikv = pl.program_id(2), pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ikv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # whole-tile causal skip: tile fully above the diagonal contributes nothing
    should_run = True
    if causal:
        should_run = (iq + 1) * block_q - 1 >= ikv * block_k

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # [block_q, d] (native dtype; MXU accumulates f32)
        k = k_ref[0, 0]  # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        s = s * sm_scale

        mask = None
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + iq * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ikv * block_k
            mask = cols <= rows
        if use_segments:
            seg_q = q_seg_ref[0, :, :1]  # [block_q, 1]
            seg_kv = kv_seg_ref[0, :1, :]  # [1, block_k]
            seg_mask = seg_q == seg_kv
            mask = seg_mask if mask is None else (mask & seg_mask)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[:, :1]  # [block_q, 1]
        l_prev = l_scr[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)  # [block_q, block_k]
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        v = v_ref[0, 0]  # [block_k, d]
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(ikv == n_kv - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        m = m_scr[...]
        lse = jnp.where(
            l_scr[...] == 0.0, -jnp.inf, m + jnp.log(jnp.maximum(l_scr[...], 1e-37))
        )
        lse_ref[0, 0] = lse[:, :1].T.astype(lse_ref.dtype)  # [1, block_q]


def _fwd(q, k, v, q_segment_ids, kv_segment_ids, sm_scale, causal,
         block_q, block_k):
    b, h, lq, d = q.shape
    lkv = k.shape[2]
    block_q = _fit_block(min(block_q, lq), lq)
    block_k = _fit_block(min(block_k, lkv), lkv)
    use_segments = q_segment_ids is not None
    if not use_segments:
        q_segment_ids = jnp.zeros((b, lq), jnp.int32)
        kv_segment_ids = jnp.zeros((b, lkv), jnp.int32)
    # lane/sublane-aligned layouts the Mosaic lowering accepts
    q_seg3 = jnp.broadcast_to(q_segment_ids[:, :, None].astype(jnp.int32), (b, lq, LANES))
    kv_seg3 = jnp.broadcast_to(kv_segment_ids[:, None, :].astype(jnp.int32), (b, 8, lkv))

    grid = (b, h, lq // block_q, lkv // block_k)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=lkv, use_segments=use_segments,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, LANES), lambda b_, h_, iq, ikv: (b_, iq, 0)),
            pl.BlockSpec((1, 8, block_k), lambda b_, h_, iq, ikv: (b_, 0, ikv)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ikv: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ikv: (b_, h_, ikv, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ikv: (b_, h_, ikv, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ikv: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, iq, ikv: (b_, h_, 0, iq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, lq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_seg3, kv_seg3, q, k, v)
    return out, lse[:, :, 0, :]  # lse [B, H, Lq]


# ───────────────────────────── backward ─────────────────────────────


def _bwd_dq_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref,
                   lse_ref, delta_ref, dq_ref, dq_scr,
                   *, sm_scale, causal, block_q, block_k, use_segments):
    iq, ikv = pl.program_id(2), pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ikv == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    should_run = True
    if causal:
        should_run = (iq + 1) * block_q - 1 >= ikv * block_k

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][0]  # [block_q]
        delta = delta_ref[0, 0][0]  # [block_q]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        mask = None
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ikv * block_k
            mask = cols <= rows
        if use_segments:
            seg_mask = q_seg_ref[0, :, :1] == kv_seg_ref[0, :1, :]
            mask = seg_mask if mask is None else (mask & seg_mask)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse[:, None])  # [block_q, block_k]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None]) * sm_scale
        dq_scr[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(ikv == n_kv - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref,
                    lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                    *, sm_scale, causal, block_q, block_k, use_segments):
    ikv, iq = pl.program_id(2), pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = True
    if causal:
        should_run = (iq + 1) * block_q - 1 >= ikv * block_k

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][0]
        delta = delta_ref[0, 0][0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        mask = None
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ikv * block_k
            mask = cols <= rows
        if use_segments:
            seg_mask = q_seg_ref[0, :, :1] == kv_seg_ref[0, :1, :]
            mask = seg_mask if mask is None else (mask & seg_mask)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse[:, None])  # [block_q, block_k]
        # dv += P^T @ dO
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None]) * sm_scale
        # dk += dS^T @ Q
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(iq == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd(q, k, v, q_seg, kv_seg, out, lse, do, sm_scale, causal,
         block_q, block_k):
    b, h, lq, d = q.shape
    lkv = k.shape[2]
    block_q = _fit_block(min(block_q, lq), lq)
    block_k = _fit_block(min(block_k, lkv), lkv)
    use_segments = q_seg is not None
    if not use_segments:
        q_seg = jnp.zeros((b, lq), jnp.int32)
        kv_seg = jnp.zeros((b, lkv), jnp.int32)
    q_seg3 = jnp.broadcast_to(q_seg[:, :, None].astype(jnp.int32), (b, lq, LANES))
    kv_seg3 = jnp.broadcast_to(kv_seg[:, None, :].astype(jnp.int32), (b, 8, lkv))

    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # [B,H,Lq]
    lse4 = lse[:, :, None, :]  # [B,H,1,Lq]
    delta4 = delta[:, :, None, :]

    dq_specs = [
        pl.BlockSpec((1, block_q, LANES), lambda b_, h_, iq, ikv: (b_, iq, 0)),
        pl.BlockSpec((1, 8, block_k), lambda b_, h_, iq, ikv: (b_, 0, ikv)),
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ikv: (b_, h_, iq, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ikv: (b_, h_, ikv, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ikv: (b_, h_, ikv, 0)),
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ikv: (b_, h_, iq, 0)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, iq, ikv: (b_, h_, 0, iq)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, iq, ikv: (b_, h_, 0, iq)),
    ]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, causal=causal,
                          block_q=block_q, block_k=block_k, use_segments=use_segments),
        grid=(b, h, lq // block_q, lkv // block_k),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ikv: (b_, h_, iq, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_seg3, kv_seg3, q, k, v, do, lse4, delta4)

    dkv_specs = [
        pl.BlockSpec((1, block_q, LANES), lambda b_, h_, ikv, iq: (b_, iq, 0)),
        pl.BlockSpec((1, 8, block_k), lambda b_, h_, ikv, iq: (b_, 0, ikv)),
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, ikv, iq: (b_, h_, iq, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, ikv, iq: (b_, h_, ikv, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, ikv, iq: (b_, h_, ikv, 0)),
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, ikv, iq: (b_, h_, iq, 0)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, ikv, iq: (b_, h_, 0, iq)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, ikv, iq: (b_, h_, 0, iq)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, causal=causal,
                          block_q=block_q, block_k=block_k, use_segments=use_segments),
        grid=(b, h, lkv // block_k, lq // block_q),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, ikv, iq: (b_, h_, ikv, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, ikv, iq: (b_, h_, ikv, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_seg3, kv_seg3, q, k, v, do, lse4, delta4)
    return dq, dk, dv


# ───────────────────────────── public API ─────────────────────────────


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, q_segment_ids, kv_segment_ids, sm_scale, causal,
           block_q, block_k):
    out, _ = _fwd(q, k, v, q_segment_ids, kv_segment_ids, sm_scale, causal,
                  block_q, block_k)
    return out


def _flash_fwd_rule(q, k, v, q_seg, kv_seg, sm_scale, causal, block_q, block_k):
    out, lse = _fwd(q, k, v, q_seg, kv_seg, sm_scale, causal, block_q, block_k)
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _flash_bwd_rule(sm_scale, causal, block_q, block_k, res, do):
    q, k, v, q_seg, kv_seg, out, lse = res
    dq, dk, dv = _bwd(q, k, v, q_seg, kv_seg, out, lse, do, sm_scale, causal,
                      block_q, block_k)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jax.Array:
    """Flash attention ``[B, H, L, D] -> [B, H, Lq, D]`` (differentiable)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("pass both or neither of q/kv segment ids")
    if not _lane_aligned(q.shape[2], k.shape[2]):
        return mha_reference(q, k, v, q_segment_ids=q_segment_ids,
                             kv_segment_ids=kv_segment_ids, causal=causal,
                             sm_scale=sm_scale)[0]
    return _flash(q, k, v, q_segment_ids, kv_segment_ids, float(sm_scale),
                  causal, block_q, block_k)


def flash_attention_padded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    padding_mask: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jax.Array:
    """Self-attention flash for ARBITRARY sequence lengths ``[B, H, L, D]``.

    ``flash_attention`` routes any length not divisible by the TPU lane
    width (128) to the XLA dense fallback — which silently materializes the
    ``[B, H, L, L]`` score tensor for exactly the shapes vision towers
    produce (CONCH-448 → 785 tokens, MUSK-384 → 577). This wrapper instead
    zero-pads ``L`` up to the next lane multiple and isolates the pad rows
    in their own segment, so the Pallas kernel tiles legally and real
    queries never attend a pad key; pad queries' outputs are sliced off.

    ``padding_mask [B, L]`` True = masked key (torchscale semantics) joins
    the pad rows' segment, preserving ``SelfAttention``'s masked behavior
    exactly. Non-causal only — padding shifts the diagonal, and every
    caller of this wrapper (vision towers, bag poolers) is bidirectional.
    """
    b, h, l, d = q.shape
    if k.shape[2] != l:
        raise ValueError("flash_attention_padded is self-attention-shaped "
                         f"(Lq == Lkv); got {l} vs {k.shape[2]}")
    pad = (-l) % LANES
    if pad == 0 and padding_mask is None:
        return flash_attention(q, k, v, sm_scale=sm_scale,
                               block_q=min(block_q, l), block_k=min(block_k, l))
    if padding_mask is not None:
        seg = (~padding_mask).astype(jnp.int32)  # real = 1, masked = 0
    else:
        seg = jnp.ones((b, l), jnp.int32)
    if pad:
        zeros = jnp.zeros((b, h, pad, d), q.dtype)
        q = jnp.concatenate([q, zeros], axis=2)
        k = jnp.concatenate([k, zeros], axis=2)
        v = jnp.concatenate([v, zeros], axis=2)
        seg = jnp.concatenate([seg, jnp.zeros((b, pad), jnp.int32)], axis=1)
    lp = l + pad
    out = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                          sm_scale=sm_scale, block_q=min(block_q, lp),
                          block_k=min(block_k, lp))
    return out[:, :, :l] if pad else out


def flash_attention_with_lse(
    q, k, v, *, q_segment_ids=None, kv_segment_ids=None, causal=False,
    sm_scale=None, block_q: int = 1024, block_k: int = 1024,
    lse_grad: bool = True,
):
    """``(out, lse [B, H, Lq])`` — the denominator statistics needed by
    dilated-attention branch recombination and cross-shard softmax merges.

    Differentiable. Two backward modes:

    * ``lse_grad=True`` (default): the backward is the XLA dense vjp of
      ``mha_reference`` evaluated at the saved inputs — ``lse`` carries
      gradients (its analytic pullback is another attention-shaped pass).
      Memory in backward is O(Lq·Lkv) per head.
    * ``lse_grad=False``: ``lse`` is returned under ``stop_gradient`` and
      the backward runs the Pallas dq/dkv kernels (O(block) memory).
      Measured 2.5× faster fwd+bwd at L=8192 (BENCH_NOTES r4 flash table).
      This is the right mode whenever the caller treats the lse as
      statistics, not activations — the dilated recombination weights are
      stop-gradient'ed anyway (ref computes them under ``torch.no_grad``,
      ``dilated_attention.py:100-131``)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if not _lane_aligned(q.shape[2], k.shape[2]):
        out, lse = mha_reference(q, k, v, q_segment_ids=q_segment_ids,
                                 kv_segment_ids=kv_segment_ids, causal=causal,
                                 sm_scale=sm_scale)
        return (out, lse) if lse_grad else (out, jax.lax.stop_gradient(lse))
    if lse_grad:
        return _flash_with_lse(q, k, v, q_segment_ids, kv_segment_ids,
                               float(sm_scale), causal, block_q, block_k)
    out, lse = _flash_with_lse_sg(q, k, v, q_segment_ids, kv_segment_ids,
                                  float(sm_scale), causal, block_q, block_k)
    return out, jax.lax.stop_gradient(lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_with_lse(q, k, v, q_seg, kv_seg, sm_scale, causal,
                    block_q, block_k):
    return _fwd(q, k, v, q_seg, kv_seg, sm_scale, causal, block_q, block_k)


def _flash_with_lse_fwd(q, k, v, q_seg, kv_seg, sm_scale, causal,
                        block_q, block_k):
    out_lse = _fwd(q, k, v, q_seg, kv_seg, sm_scale, causal, block_q, block_k)
    return out_lse, (q, k, v, q_seg, kv_seg)


def _flash_with_lse_bwd(sm_scale, causal, block_q, block_k, res, cts):
    q, k, v, q_seg, kv_seg = res
    _, vjp = jax.vjp(
        lambda q, k, v: mha_reference(
            q, k, v, q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            causal=causal, sm_scale=sm_scale), q, k, v)
    dq, dk, dv = vjp(cts)
    return dq, dk, dv, None, None


_flash_with_lse.defvjp(_flash_with_lse_fwd, _flash_with_lse_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_with_lse_sg(q, k, v, q_seg, kv_seg, sm_scale, causal,
                       block_q, block_k):
    return _fwd(q, k, v, q_seg, kv_seg, sm_scale, causal, block_q, block_k)


def _flash_with_lse_sg_fwd(q, k, v, q_seg, kv_seg, sm_scale, causal,
                           block_q, block_k):
    out, lse = _fwd(q, k, v, q_seg, kv_seg, sm_scale, causal, block_q, block_k)
    return (out, lse), (q, k, v, q_seg, kv_seg, out, lse)


def _flash_with_lse_sg_bwd(sm_scale, causal, block_q, block_k, res, cts):
    # the lse cotangent (cts[1]) is structurally zero: the public wrapper
    # returns lse under stop_gradient in this mode
    do, _ = cts
    q, k, v, q_seg, kv_seg, out, lse = res
    dq, dk, dv = _bwd(q, k, v, q_seg, kv_seg, out, lse, do, sm_scale, causal,
                      block_q, block_k)
    return dq, dk, dv, None, None


_flash_with_lse_sg.defvjp(_flash_with_lse_sg_fwd, _flash_with_lse_sg_bwd)


def mha_reference(q, k, v, *, q_segment_ids=None, kv_segment_ids=None,
                  causal=False, sm_scale=None):
    """Plain-XLA reference (returns ``(out, lse)``) for tests and small shapes."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    lq, lkv = q.shape[2], k.shape[2]
    mask = None
    if causal:
        # TOP-LEFT-aligned causal mask (query i sees keys 0..i in absolute
        # position) — the same convention the Pallas kernel applies
        # (`cols <= rows` on absolute indices); callers with lkv > lq that
        # want bottom-right alignment must offset their positions themselves
        mask = jnp.broadcast_to(
            jnp.arange(lkv)[None, :] <= jnp.arange(lq)[:, None], (lq, lkv)
        )[None, None]
    if q_segment_ids is not None:
        seg = q_segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", (p / l).astype(q.dtype), v)
    lse = (m + jnp.log(l))[..., 0]
    return out, lse
