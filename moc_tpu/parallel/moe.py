"""GShard-style Mixture-of-Experts with expert parallelism.

Behavioral reference ``/root/reference/models/musk/torchscale/component/
xmoe/{moe_layer,routing}.py``: top-1/top-2 gating with a static per-expert
capacity, dispatch/combine einsums, an ``all_to_all`` exchange across the
expert process group, local expert FFNs, and the GShard auxiliary
load-balancing loss. TPU-native differences:

  * the custom ``_AllToAll`` autograd Function (``moe_layer.py:48-63``)
    becomes ``jax.lax.all_to_all`` inside ``shard_map`` — backward comes
    from autodiff;
  * capacity is ALWAYS static (the reference's dynamic-padding
    ``all_reduce MAX`` handshake, ``moe_layer.py:179-203``, is unnecessary
    under XLA's static shapes);
  * experts are one stacked parameter (vmapped FFN), sharded over the
    ``expert`` mesh axis instead of instantiated per-rank with seeded
    offsets (``make_experts``, ``feedforward_network.py:16-92``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    n_experts: int = 8
    capacity_factor: float = 1.25
    gate_type: str = "top2"  # "top1" | "top2"
    # dispatch/combine formulation (identical results, different cost):
    #   "gather"      — scatter each kept choice's token index into its
    #                   [E·C] slot, gather rows for dispatch, K-way weighted
    #                   gather for combine: O(E·C·D) bytes moved, no matmul
    #                   waste, exact (no arithmetic touches the one-hot).
    #                   DEFAULT since r5: measured 1.18-1.19× the einsum
    #                   step at b8 (MoE-BEiT3 matrix point, v5e) and 1.52×
    #                   at b16 — the einsum's S·E·C·D cost grows ~S² while
    #                   gather scales linearly (BENCH_NOTES r5);
    #   "einsum"      — the GShard [S,E,C] one-hot einsums (reference shape,
    #                   ``moe_layer.py:205-262``); S·E·C·D MACs each way,
    #                   which RIVALS the expert FFN compute itself at top-2
    #                   capacity (E·C ≈ 2S → ≈2S²D MACs);
    #   "einsum_bf16" — the einsums with operands cast to bf16 (combine
    #                   rounds gate weights to bf16 — measured no help:
    #                   26.3% vs 26.6% MFU; kept as the recorded A/B arm).
    dispatch_impl: str = "gather"
    # per-expert inner LayerNorm between fc1 and fc2 (the reference builds
    # experts as FeedForwardNetwork(..., args.subln) — ``make_experts``,
    # ``feedforward_network.py:60-68``). None = inherit the caller's subln
    # (the Encoder passes its own); treated as False standalone.
    expert_subln: bool | None = None
    layernorm_eps: float = 1e-5
    # matmul compute dtype for the expert FFNs (params stay f32 master
    # weights; gate/routing math stays f32 — routing decisions should not
    # move with precision; elementwise GELU/LN accumulate in f32). None =
    # full f32. The Encoder threads its own compute_dtype down here.
    compute_dtype: str | None = None
    # eval-mode capacity = ceil(fraction × n_tokens), the reference's
    # EVAL_CAPACITY_TOKEN_FRACTION protocol (routing.py:30,58-61). Applied
    # ONLY when ``is_eval`` is set, like the reference's ``eval_mode`` gate
    # (routing.py:57-58,278-279) — a serving config can carry the fraction
    # without perturbing training-time capacity/dropping.
    eval_capacity_fraction: float | None = None
    is_eval: bool = False
    # top2 gate-weight normalization point (routing.py:300-307,399-407):
    # False (reference default) renormalizes AFTER capacity dropping, so a
    # token whose second expert overflowed gives full weight to its first
    normalize_before_drop: bool = False


def capacity_for(n_tokens: int, n_experts: int, gate_type: str,
                 capacity_factor: float = 1.0,
                 eval_capacity_fraction: float | None = None,
                 is_eval: bool = False) -> int:
    """Reference capacity formulas: top1 ``int(cf·⌈S/E⌉)``
    (``routing.py:60-61``), top2 ``2·⌈S/E⌉`` (``routing.py:281-282``); in
    eval mode (``is_eval`` + fraction set) ``⌈fraction·S⌉``
    (``routing.py:57-58,278-279``)."""

    if is_eval and eval_capacity_fraction is not None and eval_capacity_fraction > 0.0:
        return math.ceil(eval_capacity_fraction * n_tokens)
    if gate_type == "top1":
        return int(capacity_factor * math.ceil(n_tokens / n_experts))
    return 2 * math.ceil(n_tokens / n_experts)


def _positions(mask: jax.Array) -> jax.Array:
    """Per-token rank within its expert's queue: cumsum-minus-one over the
    token axis (ref ``fused_cumsum_sub_one``, ``moe_layer.py:39``)."""
    return jnp.cumsum(mask, axis=0) - mask


def _combine_sec(gate_s, mask, locations, capacity):
    """``[S,E]`` capped mask + per-token location → combine ``[S,E,C]``."""
    loc_s = jnp.sum(locations * mask, axis=1).astype(jnp.int32)
    gates_se = gate_s[:, None] * mask
    loc_sc = jax.nn.one_hot(loc_s, capacity, dtype=gate_s.dtype)
    return gates_se[:, :, None] * loc_sc[:, None, :]


def _compact_choice(gate_s, mask_capped, locations, expert_idx):
    """Per-token compact routing record ``(e_idx [S], slot [S], keep [S],
    gate [S])`` from a capped assignment mask — the gather formulation's
    alternative to materializing ``[S, E, C]``."""
    slot = jnp.sum(locations * mask_capped, axis=1).astype(jnp.int32)
    keep = jnp.sum(mask_capped, axis=1)
    return expert_idx.astype(jnp.int32), slot, keep, gate_s


def top1_gate(logits: jax.Array, capacity: int,
              input_mask: jax.Array | None = None, *,
              compact: bool = False):
    """Switch-style top-1 gate, exact reference semantics
    (``top1gating``, ``routing.py:36-140``, minus the xmoe/gumbel options).

    ``input_mask`` (True = padding) removes tokens from routing entirely.
    Returns (combine ``[S, E, C]``, dispatch bool ``[S, E, C]``, aux_loss);
    aux = mean(me·ce)·E² over pre-capacity assignments (routing.py:95-100).
    With ``compact=True`` returns ``(choices, aux)`` — the same routing as
    per-token records (see ``_compact_choice``) without the [S,E,C] blowup.
    """
    s, e = logits.shape
    gates = jax.nn.softmax(logits, axis=-1)
    idx1 = jnp.argmax(gates, axis=-1)
    mask1 = jax.nn.one_hot(idx1, e, dtype=gates.dtype)
    if input_mask is not None:
        mask1 = mask1 * (~input_mask)[:, None].astype(gates.dtype)
    gate1_s = jnp.sum(gates * mask1, axis=1)
    locations1 = _positions(mask1)
    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(mask1, axis=0)
    aux = jnp.mean(me * ce) * e * e
    mask1 = mask1 * (locations1 < capacity)
    if compact:
        return (_compact_choice(gate1_s, mask1, locations1, idx1),), aux
    combine = _combine_sec(gate1_s, mask1, locations1, capacity)
    return combine, combine.astype(bool), aux


def top2_gate(logits: jax.Array, capacity: int,
              input_mask: jax.Array | None = None,
              normalize_before_drop: bool = False, *,
              compact: bool = False):
    """GShard top-2 gate, exact reference semantics (``top2gating``,
    ``routing.py:258-448``, ``second_expert_policy='all'`` — the sampling/
    random policies inject torch RNG and stay out of the jit path).

    The second choice is the logits argmax with the first masked to −inf
    (``routing.py:293-296``); its queue position offsets by the TOTAL
    first-choice count per expert — including first choices that themselves
    overflow (``routing.py:344-347``). Gate weights renormalize before or
    after capacity dropping per ``normalize_before_drop``
    (``routing.py:300-307,399-407``).
    """
    s, e = logits.shape
    gates = jax.nn.softmax(logits, axis=-1)
    idx1 = jnp.argmax(gates, axis=-1)
    mask1 = jax.nn.one_hot(idx1, e, dtype=gates.dtype)
    logits_except1 = jnp.where(mask1.astype(bool), -jnp.inf, logits)
    idx2 = jnp.argmax(logits_except1, axis=-1)
    mask2 = jax.nn.one_hot(idx2, e, dtype=gates.dtype)
    gate1_s = jnp.sum(gates * mask1, axis=1)
    gate2_s = jnp.sum(gates * mask2, axis=1)
    eps = jnp.finfo(gates.dtype).eps
    if normalize_before_drop:
        denom = jnp.maximum(gate1_s + gate2_s, eps)
        gate1_s, gate2_s = gate1_s / denom, gate2_s / denom
    if input_mask is not None:
        nonpad = (~input_mask)[:, None].astype(gates.dtype)
        mask1 = mask1 * nonpad
        mask2 = mask2 * nonpad
    locations1 = _positions(mask1)
    # second choices queue behind ALL first choices (capped or not)
    locations2 = _positions(mask2) + jnp.sum(mask1, axis=0, keepdims=True)
    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(mask1, axis=0)
    aux = jnp.mean(me * ce) * e * e
    mask1 = mask1 * (locations1 < capacity)
    mask2 = mask2 * (locations2 < capacity)
    if not normalize_before_drop:
        gate1_s = jnp.sum(gates * mask1, axis=1)
        gate2_s = jnp.sum(gates * mask2, axis=1)
        denom = jnp.maximum(gate1_s + gate2_s, eps)
        gate1_s, gate2_s = gate1_s / denom, gate2_s / denom
    if compact:
        return (_compact_choice(gate1_s, mask1, locations1, idx1),
                _compact_choice(gate2_s, mask2, locations2, idx2)), aux
    combine = (_combine_sec(gate1_s, mask1, locations1, capacity)
               + _combine_sec(gate2_s, mask2, locations2, capacity))
    return combine, combine.astype(bool), aux


def moe_dispatch_combine(
    x: jax.Array,
    gate_logits: jax.Array,
    expert_fn: Callable[[jax.Array], jax.Array],
    cfg: MoEConfig,
    *,
    axis_name: str | None = None,
    capacity: int | None = None,
    input_mask: jax.Array | None = None,
):
    """Functional MoE core. ``x [S, D]`` local tokens, ``gate_logits [S, E]``.

    ``expert_fn`` maps ``[E_local, T, D] -> [E_local, T, D]`` (the local
    expert stack). With ``axis_name`` (inside shard_map over the expert
    axis), dispatch/combine ride ``lax.all_to_all``; without it, all experts
    are local. ``input_mask [S]`` (True = padding) removes pad tokens from
    routing — they never occupy expert capacity. NOTE: the aux (balance)
    loss still averages over the PADDED token axis, like the reference
    (``routing.py:94-99`` divides by the full S) — pad count/content shifts
    the aux value, which is why ``tests/test_parallel.py`` declines to
    assert aux pad-invariance. Returns ``(y [S, D], aux_loss)``.
    """
    s, d = x.shape
    e = gate_logits.shape[-1]
    if capacity is None:
        capacity = capacity_for(s, e, cfg.gate_type, cfg.capacity_factor,
                                cfg.eval_capacity_fraction, is_eval=cfg.is_eval)
    if cfg.dispatch_impl == "gather":
        if cfg.gate_type == "top1":
            choices, aux = top1_gate(gate_logits, capacity,
                                     input_mask=input_mask, compact=True)
        else:
            choices, aux = top2_gate(
                gate_logits, capacity,
                normalize_before_drop=cfg.normalize_before_drop,
                input_mask=input_mask, compact=True)
        ec = e * capacity
        # slot → source-token table: kept choices scatter their token index
        # (slots are provably collision-free: cumsum positions are unique
        # per expert and second choices queue past ALL first choices);
        # unfilled slots keep the sentinel s, which gathers the appended
        # zero row — matching the einsum path's zero padding exactly
        src = jnp.full((ec + 1,), s, jnp.int32)
        tok = jnp.arange(s, dtype=jnp.int32)
        for e_idx, slot, keep, _gate in choices:
            flat = jnp.where(keep.astype(bool), e_idx * capacity + slot, ec)
            src = src.at[flat].set(tok)
        x_z = jnp.concatenate([x, jnp.zeros((1, d), x.dtype)], axis=0)
        expert_in = jnp.take(x_z, src[:ec], axis=0).reshape(e, capacity, d)
    else:
        if cfg.gate_type == "top1":
            combine, dispatch, aux = top1_gate(gate_logits, capacity,
                                               input_mask=input_mask)
        else:
            combine, dispatch, aux = top2_gate(
                gate_logits, capacity,
                normalize_before_drop=cfg.normalize_before_drop,
                input_mask=input_mask)
        ddt = jnp.bfloat16 if cfg.dispatch_impl == "einsum_bf16" else x.dtype
        expert_in = jnp.einsum("sd,sec->ecd", x.astype(ddt),
                               dispatch.astype(ddt)).astype(x.dtype)
    if axis_name is not None:
        # [E, C, D] -> [E_local, W*C, D]: expert-block w of every rank lands
        # on rank w (ref _AllToAll dispatch, moe_layer.py:233-234)
        expert_in = jax.lax.all_to_all(
            expert_in, axis_name, split_axis=0, concat_axis=1, tiled=True
        )
    expert_out = expert_fn(expert_in)
    if axis_name is not None:
        expert_out = jax.lax.all_to_all(
            expert_out, axis_name, split_axis=1, concat_axis=0, tiled=True
        )
    if cfg.dispatch_impl == "gather":
        flat_out = expert_out.reshape(e * capacity, d)
        y = jnp.zeros((s, d), x.dtype)
        for e_idx, slot, keep, gate_s in choices:
            rows = jnp.take(flat_out, e_idx * capacity + slot, axis=0)
            y = y + ((gate_s * keep)[:, None] * rows).astype(x.dtype)
    else:
        y = jnp.einsum("ecd,sec->sd", expert_out.astype(ddt),
                       combine.astype(ddt)).astype(x.dtype)
    return y, aux


class MoELayer(nn.Module):
    """Flax MoE FFN layer: gate + stacked experts + dispatch/combine.

    Expert parameters are stacked ``[E, ...]`` — annotate/shard them over the
    ``expert`` mesh axis and run under shard_map (pass ``axis_name``), or run
    unsharded on one device.
    """

    dim: int
    hidden_dim: int
    cfg: MoEConfig = MoEConfig()
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, input_mask: jax.Array | None = None):
        """``x [S, D]`` (local tokens, ``input_mask [S]`` True = padding) →
        ``(y [S, D], aux_loss)``."""
        e = self.cfg.n_experts
        gate_logits = nn.Dense(e, use_bias=False, name="gate")(x)
        w1 = self.param("experts_w1", nn.initializers.lecun_normal(),
                        (e, self.dim, self.hidden_dim))
        b1 = self.param("experts_b1", nn.initializers.zeros, (e, self.hidden_dim))
        w2 = self.param("experts_w2", nn.initializers.lecun_normal(),
                        (e, self.hidden_dim, self.dim))
        b2 = self.param("experts_b2", nn.initializers.zeros, (e, self.dim))

        if self.axis_name is not None:
            world = jax.lax.psum(1, self.axis_name)
            my = jax.lax.axis_index(self.axis_name)
            n_local = e // world
            sl = lambda p: jax.lax.dynamic_slice_in_dim(p, my * n_local, n_local, 0)
            w1l, b1l, w2l, b2l = sl(w1), sl(b1), sl(w2), sl(b2)
        else:
            w1l, b1l, w2l, b2l = w1, b1, w2, b2

        if self.cfg.expert_subln:
            ln_scale = self.param("experts_ln_scale", nn.initializers.ones,
                                  (e, self.hidden_dim))
            ln_bias = self.param("experts_ln_bias", nn.initializers.zeros,
                                 (e, self.hidden_dim))

        cd = self.cfg.compute_dtype

        def _mm(a, b_, spec):
            # expert matmuls in compute_dtype (bf16 tier), result f32 for
            # the elementwise tail — mirrors nn.Dense(dtype=...) semantics
            if cd is not None:
                a, b_ = a.astype(cd), b_.astype(cd)
            return jnp.einsum(spec, a, b_).astype(jnp.float32)

        def expert_fn(tokens):  # [E_local, T, D]
            # exact (erf) GELU, matching the reference's F.gelu in fp32
            # (``feedforward_network.py:135``)
            h = jax.nn.gelu(_mm(tokens, w1l, "etd,edh->eth")
                            + b1l[:, None], approximate=False)
            if self.cfg.expert_subln:
                if self.axis_name is not None:
                    sc, bi = sl(ln_scale), sl(ln_bias)
                else:
                    sc, bi = ln_scale, ln_bias
                mu = jnp.mean(h, axis=-1, keepdims=True)
                var = jnp.var(h, axis=-1, keepdims=True)
                h = (h - mu) * jax.lax.rsqrt(var + self.cfg.layernorm_eps)
                h = h * sc[:, None] + bi[:, None]
            return _mm(h, w2l, "eth,ehd->etd") + b2l[:, None]

        return moe_dispatch_combine(x, gate_logits, expert_fn, self.cfg,
                                    axis_name=self.axis_name,
                                    input_mask=input_mask)
