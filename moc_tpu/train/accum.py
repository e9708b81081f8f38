"""Memory-bounded end-to-end MIL: streaming attention pooling over chunks.

The reference trains MIL heads on PRE-extracted embeddings; training the
patch encoder end-to-end is impossible there because a slide's 10⁴-10⁵
patches cannot fit through the encoder in one graph. "End-to-end Multiple
Instance Learning with Gradient Accumulation" (arXiv 2203.03981) solves
this on GPUs by accumulating gradients over patch minibatches in eager
mode; the closest the reference gets is the LoRA trainer's sorted
top-logit queue (``utils/lora_utils.py:30-36``).

TPU-native form: attention-MIL pooling is a softmax-weighted mean, so it
streams exactly like flash attention — a ``lax.scan`` over patch chunks
carrying the running (max, sum-exp, weighted-sum) triple, with
``jax.checkpoint`` on the chunk step so backward rematerializes one chunk
at a time. One compiled program, EXACT forward and gradients, peak
activation memory O(chunk × encoder) instead of O(bag × encoder).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def streaming_attention_pool(
    embed_fn: Callable[[jax.Array], jax.Array],
    score_fn: Callable[[jax.Array], jax.Array],
    chunks: jax.Array,
    chunk_valid: jax.Array,
    *,
    remat: bool = True,
):
    """Exact masked attention pooling ``M = Σᵢ softmax(score(hᵢ))·hᵢ`` over a
    chunked bag, as one scan.

    Args:
      embed_fn: patch chunk ``[Ck, ...]`` → embeddings ``[Ck, D]`` (e.g. a
        frozen-or-trainable encoder; gradients flow through it).
      score_fn: embeddings ``[Ck, D]`` → raw attention scores ``[Ck]``.
      chunks: ``[K, Ck, ...]`` the bag split into K fixed-size chunks
        (pad the last one).
      chunk_valid: ``[K, Ck]`` bool validity per patch.
      remat: rematerialize each chunk's encoder activations on backward.

    Returns ``(pooled [D], logsumexp scalar)``; all-pad bags pool to zeros.
    """

    def step(carry, inputs):
        m, s, acc = carry
        x, v = inputs
        h = embed_fn(x)  # [Ck, D]
        # zero (not just down-weight) invalid rows: pad inputs may hold
        # NaN/inf and 0·NaN = NaN
        h = jnp.where(v[:, None], h, 0.0)
        a = jnp.where(v, score_fn(h).reshape(-1), NEG_INF)
        m_new = jnp.maximum(m, jnp.max(a))
        scale = jnp.exp(m - m_new)
        e = jnp.where(v, jnp.exp(a - m_new), 0.0)  # pads contribute exactly 0
        s_new = s * scale + jnp.sum(e)
        acc_new = acc * scale + e @ h
        return (m_new, s_new, acc_new), None

    if remat:
        step = jax.checkpoint(step)

    d = jax.eval_shape(embed_fn, jax.ShapeDtypeStruct(chunks.shape[1:],
                                                      chunks.dtype)).shape[-1]
    init = (jnp.float32(NEG_INF), jnp.float32(0.0), jnp.zeros((d,), jnp.float32))
    (m, s, acc), _ = jax.lax.scan(step, init, (chunks, chunk_valid))
    pooled = acc / jnp.maximum(s, 1e-30)
    return pooled, m + jnp.log(jnp.maximum(s, 1e-30))


def chunk_bag(feats: jax.Array, valid: jax.Array, chunk: int):
    """Split ``[N, ...]`` into ``[K, chunk, ...]`` (zero-padded) plus the
    matching ``[K, chunk]`` validity."""
    n = feats.shape[0]
    k = -(-n // chunk)
    pad = k * chunk - n
    feats = jnp.pad(feats, [(0, pad)] + [(0, 0)] * (feats.ndim - 1))
    valid = jnp.pad(valid, (0, pad))
    return (feats.reshape((k, chunk) + feats.shape[1:]),
            valid.reshape(k, chunk))
