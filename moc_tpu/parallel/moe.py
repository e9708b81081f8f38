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
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    n_experts: int = 8
    capacity_factor: float = 1.25
    gate_type: str = "top2"  # "top1" | "top2"
    eval_capacity_factor: float | None = None


def _capacity(n_tokens: int, n_experts: int, factor: float) -> int:
    cap = int(n_tokens / n_experts * factor)
    return max(4, cap)


def _one_hot_dispatch(expert_idx, gate_vals, n_experts, capacity, priority=None):
    """Position-within-capacity bookkeeping shared by both gates.

    expert_idx ``[S]``, gate_vals ``[S]`` → (combine ``[S, E, C]``,
    dispatch bool ``[S, E, C]``). Tokens beyond an expert's capacity drop.
    """
    onehot = jax.nn.one_hot(expert_idx, n_experts)  # [S, E]
    if priority is not None:
        onehot = onehot * priority[:, None]
    pos = jnp.cumsum(onehot, axis=0) - onehot  # rank of token within expert
    pos = jnp.sum(pos * onehot, axis=1).astype(jnp.int32)  # [S]
    keep = (pos < capacity) & (jnp.sum(onehot, axis=1) > 0)
    pos_oh = jax.nn.one_hot(pos, capacity)  # [S, C]
    dispatch = onehot[:, :, None] * pos_oh[:, None, :] * keep[:, None, None]
    combine = dispatch * gate_vals[:, None, None]
    return combine, dispatch.astype(bool)


def top1_gate(logits: jax.Array, capacity: int):
    """Switch-style top-1 gate (ref ``routing.py:36-228`` minus gumbel).

    Returns (combine ``[S, E, C]``, dispatch ``[S, E, C]``, aux_loss)."""
    s, e = logits.shape
    gates = jax.nn.softmax(logits, axis=-1)
    idx = jnp.argmax(gates, axis=-1)
    gate_val = jnp.max(gates, axis=-1)
    combine, dispatch = _one_hot_dispatch(idx, gate_val, e, capacity)
    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(jax.nn.one_hot(idx, e), axis=0)
    aux = jnp.sum(me * ce) * e
    return combine, dispatch, aux


def top2_gate(logits: jax.Array, capacity: int, normalize: bool = True):
    """GShard top-2 gate with normalized weights (ref ``Top2Gate``,
    ``routing.py:258-524``, ``second_expert_policy='all'``)."""
    s, e = logits.shape
    gates = jax.nn.softmax(logits, axis=-1)
    idx1 = jnp.argmax(gates, axis=-1)
    masked = gates * (1.0 - jax.nn.one_hot(idx1, e))
    idx2 = jnp.argmax(masked, axis=-1)
    g1 = jnp.take_along_axis(gates, idx1[:, None], axis=1)[:, 0]
    g2 = jnp.take_along_axis(gates, idx2[:, None], axis=1)[:, 0]
    if normalize:
        denom = jnp.maximum(g1 + g2, 1e-9)
        g1, g2 = g1 / denom, g2 / denom
    c1, d1 = _one_hot_dispatch(idx1, g1, e, capacity)
    # second choices queue behind first choices of the same expert
    used = jnp.sum(d1, axis=(0, 2))  # [E] tokens already placed per expert
    onehot2 = jax.nn.one_hot(idx2, e)
    pos2 = jnp.cumsum(onehot2, axis=0) - onehot2
    pos2 = (jnp.sum(pos2 * onehot2, axis=1)
            + jnp.sum(onehot2 * used[None, :], axis=1)).astype(jnp.int32)
    keep2 = pos2 < capacity
    pos2_oh = jax.nn.one_hot(pos2, capacity)
    d2 = onehot2[:, :, None] * pos2_oh[:, None, :] * keep2[:, None, None]
    c2 = d2 * g2[:, None, None]
    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(jax.nn.one_hot(idx1, e), axis=0)
    aux = jnp.sum(me * ce) * e
    return c1 + c2, (d1 | d2.astype(bool)), aux


def moe_dispatch_combine(
    x: jax.Array,
    gate_logits: jax.Array,
    expert_fn: Callable[[jax.Array], jax.Array],
    cfg: MoEConfig,
    *,
    axis_name: str | None = None,
    capacity: int | None = None,
):
    """Functional MoE core. ``x [S, D]`` local tokens, ``gate_logits [S, E]``.

    ``expert_fn`` maps ``[E_local, T, D] -> [E_local, T, D]`` (the local
    expert stack). With ``axis_name`` (inside shard_map over the expert
    axis), dispatch/combine ride ``lax.all_to_all``; without it, all experts
    are local. Returns ``(y [S, D], aux_loss)``.
    """
    s, d = x.shape
    e = gate_logits.shape[-1]
    if capacity is None:
        capacity = _capacity(s, e, cfg.capacity_factor)
    gate = top1_gate if cfg.gate_type == "top1" else top2_gate
    combine, dispatch, aux = gate(gate_logits, capacity)

    expert_in = jnp.einsum("sd,sec->ecd", x, dispatch.astype(x.dtype))  # [E, C, D]
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
    y = jnp.einsum("ecd,sec->sd", expert_out, combine.astype(x.dtype))
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
    def __call__(self, x):
        """``x [S, D]`` (local tokens) → ``(y [S, D], aux_loss)``."""
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

        def expert_fn(tokens):  # [E_local, T, D]
            h = jax.nn.gelu(jnp.einsum("etd,edh->eth", tokens, w1l) + b1l[:, None])
            return jnp.einsum("eth,ehd->etd", h, w2l) + b2l[:, None]

        return moe_dispatch_combine(x, gate_logits, expert_fn, self.cfg,
                                    axis_name=self.axis_name)
