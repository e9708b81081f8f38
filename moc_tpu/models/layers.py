"""Shared MIL layers: attention scoring nets, masked pooling, stacked heads.

Behavioral reference ``/root/reference/models/model_clam.py:15-64``
(``Attn_Net``, ``Attn_Net_Gated``). All layers take padded bags ``[N, D]``
with a boolean ``[N]`` validity mask; attention softmaxes mask invalid
patches to a large negative before normalizing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e30


def l2norm(x, axis=-1):
    """Clip-guarded L2 normalization — THE single definition (the towers in
    musk/adapters/coca all import this; keeping three copies in sync was a
    review finding r3)."""
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True).clip(1e-12)


class AttnNet(nn.Module):
    """2-layer tanh attention scorer: ``[N, L] -> [N, K]`` raw scores."""

    hidden: int = 256
    n_out: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        a = jnp.tanh(nn.Dense(self.hidden, name="fc")(x))
        if self.dropout:
            a = nn.Dropout(self.dropout, deterministic=not train)(a)
        return nn.Dense(self.n_out, name="score")(a)


class GatedAttnNet(nn.Module):
    """3-layer gated attention scorer (tanh ⊙ sigmoid) — ``Attn_Net_Gated``."""

    hidden: int = 256
    n_out: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        a = jnp.tanh(nn.Dense(self.hidden, name="fc_a")(x))
        b = jax.nn.sigmoid(nn.Dense(self.hidden, name="fc_b")(x))
        if self.dropout:
            a = nn.Dropout(self.dropout, deterministic=not train)(a)
            b = nn.Dropout(self.dropout, deterministic=not train)(b)
        return nn.Dense(self.n_out, name="score")(a * b)


def masked_attention_weights(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """Masked softmax over the patch axis.

    ``scores [K, N]`` raw attention, ``valid [N]`` → ``[K, N]`` weights that
    are exactly 0 on padded patches.
    """
    masked = jnp.where(valid[None, :], scores, NEG_INF)
    return jax.nn.softmax(masked, axis=1)


def masked_topk_feats(scores: jax.Array, feats: jax.Array, valid: jax.Array,
                      k: int, largest: bool = True):
    """Features of the top-k (or bottom-k) valid patches by ``scores [N]``.

    Returns ``(feats [k, D], sel_valid [k])`` — when fewer than k patches are
    valid, trailing selections are flagged invalid (callers weight losses).
    """
    key = jnp.where(valid, scores if largest else -scores, NEG_INF)
    _, idx = jax.lax.top_k(key, k)
    count = jnp.minimum(k, jnp.sum(valid))
    sel_valid = jnp.arange(k) < count
    return feats[idx], sel_valid


class StackedDense(nn.Module):
    """C independent linear heads as one parameter: ``[.., D] -> [.., C, out]``.

    The TPU-native form of the reference's ``nn.ModuleList`` of per-class
    classifiers (``model_clam.py:94,262``) — one einsum instead of a Python
    loop over heads.
    """

    n_heads: int
    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.n_heads, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.n_heads, self.features))
        return jnp.einsum("...d,cdo->...co", x, kernel) + bias
