"""Causal (cross-attending) decoder with incremental KV caching.

Behavioral reference ``/root/reference/models/musk/torchscale/architecture/
decoder.py`` (pre/post-LN causal decoder with optional encoder cross
attention and per-step incremental state) and the CoCa caption decoder
(``models/conch/open_clip_custom/transformer.py:452-576`` — the multimodal
transformer that cross-attends text tokens over image tokens; its
autoregressive ``generate`` with top-k/top-p lives at
``coca_model.py:247-346``).

TPU-native: the incremental path is a static-shape KV cache written with
``dynamic_update_slice`` and driven by ``lax.scan`` — one compiled program
decodes any number of steps (the reference re-runs Python per token).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.nn.encoder import (
    FeedForward,
    RelativePositionBias,
    xpos_apply,
    xpos_rotary,
)
from moc_tpu.nn.transformer import LayerNorm, _merge_heads, _split_heads


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Mirrors the torchscale ``DecoderConfig`` knobs the reference exercises
    (``architecture/config.py:87-168``). Defaults keep the plain pre-LN form
    (torchscale itself defaults ``subln=True``; callers opt in)."""

    embed_dim: int = 512
    ffn_dim: int = 2048
    layers: int = 6
    heads: int = 8
    cross_attention: bool = False  # attend over encoder/image tokens
    normalize_before: bool = True
    subln: bool = False
    deepnorm: bool = False
    xpos: bool = False
    xpos_scale_base: int = 512
    rel_pos_buckets: int = 0
    max_rel_pos: int = 0
    layernorm_eps: float = 1e-5

    def __post_init__(self):
        if self.deepnorm:
            # torchscale's DecoderConfig.postprocessing (config.py:152-155)
            # flips ``encoder_normalize_before`` — an attribute the decoder
            # never reads — so a deepnorm decoder stays PRE-LN (unlike the
            # encoder, which goes post-LN). Mirrored verbatim: only subln
            # is disabled here.
            object.__setattr__(self, "subln", False)


class CachedAttention(nn.Module):
    """Causal self-attention that runs full-sequence (causal mask) or
    incrementally against a preallocated static-shape KV cache
    (ref ``multihead_attention.py:110-171``: growing ``prev_key`` concat →
    here ``dynamic_update_slice`` writes at ``index``; supports multi-token
    prefix priming ≙ the reference's ``is_first_step``).

    xPos (ref ``XPOS``, applied q downscale=False / k True) uses the
    per-step coordinate system the reference rebuilds each decode step:
    query offset ``src_len−1``, decay centered at ``ceil(src_len/2)``
    (``multihead_attention.py:157-164``). Optional ``subln`` inner
    LayerNorm sits between attention and out_proj (self-attn only)."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, *, cache=None, index=None, rel_pos=None,
                 padding_mask=None):
        c = self.cfg
        d, h = c.embed_dim, c.heads
        q = nn.Dense(d, name="q_proj")(x)
        k = nn.Dense(d, name="k_proj")(x)
        v = nn.Dense(d, name="v_proj")(x)
        qh, kh, vh = (_split_heads(t, h) for t in (q, k, v))  # [B, H, T, dh]
        t = x.shape[1]

        if cache is None:
            causal = jnp.tril(jnp.ones((t, t), bool))
            mask = jnp.where(causal, 0.0, -jnp.inf)[None, None]
            if padding_mask is not None:  # [B, T] True = pad (key side,
                # ref ``attention_ops`` key_padding_mask masked_fill)
                mask = mask + jnp.where(
                    padding_mask[:, None, None, :], -jnp.inf, 0.0)
            if c.xpos:
                qh = xpos_rotary(qh, c.xpos_scale_base, downscale=False)
                kh = xpos_rotary(kh, c.xpos_scale_base, downscale=True)
            new_cache = None
        else:
            # write k/v rows [index, index+t), attend over the causal prefix
            ck, cv = cache  # [B, H, max_len, dh]
            ck = jax.lax.dynamic_update_slice(ck, kh, (0, 0, index, 0))
            cv = jax.lax.dynamic_update_slice(cv, vh, (0, 0, index, 0))
            kh, vh = ck, cv
            kpos = jnp.arange(ck.shape[2])
            qpos = index + jnp.arange(t)
            mask = jnp.where(kpos[None, :] <= qpos[:, None], 0.0, -jnp.inf)[
                None, None
            ]
            if c.xpos:
                center = (index + t + 1) // 2  # ceil(src_len/2), src_len=index+t
                qh = xpos_apply(qh, qpos, center, c.xpos_scale_base, False)
                kh = xpos_apply(kh, kpos, center, c.xpos_scale_base, True)
            new_cache = (ck, cv)

        scale = (d // h) ** -0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh) + mask
        if rel_pos is not None:
            logits = logits + rel_pos[None]
        w = jax.nn.softmax(logits, axis=-1)
        out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", w, vh))
        if c.subln:
            out = nn.LayerNorm(epsilon=c.layernorm_eps, name="inner_attn_ln")(out)
        return nn.Dense(d, name="out_proj")(out), new_cache


class DecoderCrossAttention(nn.Module):
    """Encoder-decoder attention (ref ``decoder.py:119-128``: no
    ``inner_attn_ln`` even under subln, no xPos — both gate on
    ``self_attention``)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, memory, memory_mask=None, rel_pos=None):
        d, h = self.dim, self.heads
        q = _split_heads(nn.Dense(d, name="q_proj")(x), h)
        k = _split_heads(nn.Dense(d, name="k_proj")(memory), h)
        v = _split_heads(nn.Dense(d, name="v_proj")(memory), h)
        scale = (d // h) ** -0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        if memory_mask is not None:
            # POLARITY: memory_mask is True = VALID memory position —
            # the OPPOSITE of the encoder/decoder padding_mask convention
            # (True = pad). Passing an encoder-style pad mask here would
            # attend ONLY the pad positions.
            # finite fill: NaN-safe for all-masked memory (see CrossAttention)
            logits = jnp.where(memory_mask[:, None, None, :], logits,
                               -0.7 * jnp.finfo(jnp.float32).max)
        if rel_pos is not None:
            logits = logits + rel_pos[None]
        w = jax.nn.softmax(logits, axis=-1)
        return nn.Dense(d, name="out_proj")(
            _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", w, v))
        )


class DecoderLayer(nn.Module):
    """Pre/post-LN causal layer with optional deepnorm α-residual
    (ref ``decoder.py:88-94,130-131``: decoder-only α=(2L)^¼,
    encoder-decoder α=(3L)^¼)."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, memory=None, memory_mask=None, cache=None,
                 index=None, self_rel_pos=None, cross_rel_pos=None,
                 padding_mask=None):
        c = self.cfg
        if c.deepnorm:
            n = 3.0 if c.cross_attention else 2.0
            alpha = math.pow(n * c.layers, 0.25)
        else:
            alpha = 1.0

        def maybe_pre(x, name):
            return LayerNorm(name=name)(x) if c.normalize_before else x

        def maybe_post(x, name):
            return x if c.normalize_before else LayerNorm(name=name)(x)

        residual = x
        h, new_cache = CachedAttention(c, name="self_attn")(
            maybe_pre(x, "self_attn_layer_norm"), cache=cache, index=index,
            rel_pos=self_rel_pos, padding_mask=padding_mask,
        )
        x = maybe_post(residual * alpha + h, "self_attn_layer_norm")

        if c.cross_attention:
            assert memory is not None
            residual = x
            h = DecoderCrossAttention(c.embed_dim, c.heads, name="encoder_attn")(
                maybe_pre(x, "encoder_attn_layer_norm"), memory, memory_mask,
                rel_pos=cross_rel_pos,
            )
            x = maybe_post(residual * alpha + h, "encoder_attn_layer_norm")

        residual = x
        h = FeedForward(c.embed_dim, c.ffn_dim, subln=c.subln,
                        eps=c.layernorm_eps, name="ffn")(
            maybe_pre(x, "final_layer_norm")
        )
        x = maybe_post(residual * alpha + h, "final_layer_norm")
        return x, new_cache


class Decoder(nn.Module):
    """Full-sequence (training) and cached incremental (decoding) forward.

    Relative-position bias (ref ``decoder.py:269-284,404-417``) is shared
    across layers; the cached step evaluates the bias row at query position
    ``index`` (the reference's incremental slice ``[-1:, :, :]`` indexes the
    batch·heads dim and would fail upstream — rebuilt correctly here)."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, memory=None, memory_mask=None, caches=None,
                 index=None, padding_mask=None):
        c = self.cfg
        self_bias = cross_bias = None
        if c.rel_pos_buckets > 0 and c.max_rel_pos > 0:
            self_rel = RelativePositionBias(
                num_buckets=c.rel_pos_buckets, max_distance=c.max_rel_pos,
                heads=c.heads, name="self_attn_relative_position")
            cross_rel = (RelativePositionBias(
                num_buckets=c.rel_pos_buckets, max_distance=c.max_rel_pos,
                heads=c.heads, name="cross_attn_relative_position")
                if c.cross_attention else None)
            t = x.shape[1]
            if caches is None:
                self_bias = self_rel(t, t)
            else:
                self_bias = self_rel(t, caches[0][0].shape[2], step=index)
            if cross_rel is not None and memory is not None:
                cross_bias = cross_rel(t, memory.shape[1],
                                       step=0 if caches is None else index)
        new_caches = []
        for i in range(c.layers):
            cache = caches[i] if caches is not None else None
            x, nc = DecoderLayer(c, name=f"layers_{i}")(
                x, memory, memory_mask, cache, index,
                self_rel_pos=self_bias, cross_rel_pos=cross_bias,
                padding_mask=padding_mask,
            )
            new_caches.append(nc)
        if c.normalize_before:
            x = LayerNorm(name="layer_norm")(x)
        return x, (new_caches if caches is not None else None)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        """KV caches; ``dtype`` must match the activations
        (``dynamic_update_slice`` rejects mixed dtypes — pass ``bfloat16``
        when serving with half-precision params)."""
        c = self.cfg
        dh = c.embed_dim // c.heads
        shape = (batch, c.heads, max_len, dh)
        return [
            (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(c.layers)
        ]


def sample_generate(
    decoder: Decoder,
    params,
    embed_fn,
    logits_fn,
    rng: jax.Array,
    *,
    batch: int,
    seq_len: int,
    bos_id: int,
    eos_id: Optional[int] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    min_len: int = 0,
    repetition_penalty: float = 1.0,
    vocab_size: Optional[int] = None,
    pad_id: Optional[int] = None,
    memory=None,
    memory_mask=None,
    cache_dtype=jnp.float32,
):
    """Top-k / nucleus (top-p) sampling decode as one ``lax.scan``
    (ref ``coca_model.generate``: ``top_k`` keeps the k most probable tokens,
    ``top_p`` keeps the smallest HEAD of the sorted distribution whose
    cumulative mass reaches ``top_p``, INCLUDING the crossing token — the
    verified HF ``TopPLogitsWarper`` behavior the reference delegates to;
    its "keep tokens in the 1 - top_p quantile" source comment describes the
    parameter loosely, not what the warper does).

    ``min_len`` forbids EOS before that many generated tokens
    (≙ HF ``MinLengthLogitsProcessor``); ``repetition_penalty`` down-weights
    already-emitted tokens, positive logits divided / negative multiplied
    (≙ HF ``RepetitionPenaltyLogitsProcessor``; requires ``vocab_size`` so
    the seen-token mask has a static shape). Processors run before the
    temperature/top-k/top-p warpers, matching the reference's stack order."""
    caches = decoder.init_cache(batch, seq_len, cache_dtype)
    if repetition_penalty != 1.0 and vocab_size is None:
        raise ValueError("repetition_penalty requires vocab_size")

    def filter_logits(logits):
        if top_k is not None:
            kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        if top_p is not None:
            # argsort-scatter: O(V log V) and a true sorted-PREFIX keep —
            # the old strict-greater rank matrix was O(V^2) memory ([B,V,V]
            # is GBs at the 32k-64k vocabs) and let every boundary TIE
            # through, widening the nucleus (review r3)
            order = jnp.argsort(-logits, axis=-1)  # desc, ties index-asc
            sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # HF TopPLogitsWarper: keep tokens whose PRECEDING cumulative
            # mass is < top_p (head summing to >= top_p, crossing token
            # included; verified against transformers — top_p=0.1 on
            # [.5,.3,.15,.05] keeps only the first token)
            keep_sorted = (cum - probs) < top_p
            keep_sorted = keep_sorted.at[..., 0].set(True)  # always ≥ 1 token
            inv = jnp.argsort(order, axis=-1)  # inverse permutation
            keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
            logits = jnp.where(keep, logits, -jnp.inf)
        return logits

    track_seen = repetition_penalty != 1.0

    def step(carry, idx):
        tokens, caches, done, key, seen = carry
        x = embed_fn(tokens, idx)
        h, caches = decoder.apply(params, x, memory, memory_mask, caches, idx)
        logits = logits_fn(h)
        if track_seen:
            penalized = jnp.where(logits > 0, logits / repetition_penalty,
                                  logits * repetition_penalty)
            logits = jnp.where(seen, penalized, logits)
        if eos_id is not None and min_len > 0:
            eos_col = jnp.arange(logits.shape[-1]) == eos_id
            logits = jnp.where((idx + 1 < min_len) & eos_col[None, :],
                               -jnp.inf, logits)
        # warpers run on UNscaled logits; temperature only shapes the
        # final sampling distribution (ref coca_model.py:325-327:
        # softmax(filtered_logits / temperature)) — scaling first would
        # change nucleus membership for temperature != 1
        logits = filter_logits(logits) / max(temperature, 1e-6)
        key, sub = jax.random.split(key)
        nxt = jax.random.categorical(sub, logits).astype(jnp.int32)
        if eos_id is not None:
            # after EOS the reference emits pad tokens (coca_model.py:318-320)
            fill = eos_id if pad_id is None else pad_id
            nxt = jnp.where(done, fill, nxt)
            done = done | (nxt == eos_id)
        if track_seen:
            seen = seen | (jnp.arange(seen.shape[-1])[None, :] == nxt[:, None])
        return (nxt, caches, done, key, seen), nxt

    seen0 = jnp.zeros((batch, vocab_size if track_seen else 1), bool)
    if track_seen:
        seen0 = seen0.at[:, bos_id].set(True)  # HF penalizes the prompt too
    init = (jnp.full((batch,), bos_id, jnp.int32), caches,
            jnp.zeros((batch,), bool), rng, seen0)
    _, out = jax.lax.scan(step, init, jnp.arange(seq_len))
    return out.T


def greedy_generate(
    decoder: Decoder,
    params,
    embed_fn,
    logits_fn,
    *,
    batch: int,
    seq_len: int,
    bos_id: int,
    eos_id: Optional[int] = None,
    pad_id: Optional[int] = None,
    memory=None,
    memory_mask=None,
    cache_dtype=jnp.float32,
):
    """Greedy autoregressive decoding as ONE ``lax.scan``
    (ref ``coca_model.generate``'s per-token Python loop, top-k=1 path).

    ``embed_fn(token_ids [B], position) -> [B, 1, D]``;
    ``logits_fn(hidden [B, 1, D]) -> [B, vocab]``.
    Returns token ids ``[B, seq_len]``.
    """
    caches = decoder.init_cache(batch, seq_len, cache_dtype)

    def step(carry, idx):
        tokens, caches, done = carry
        x = embed_fn(tokens, idx)
        h, caches = decoder.apply(params, x, memory, memory_mask, caches, idx)
        logits = logits_fn(h)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if eos_id is not None:
            fill = eos_id if pad_id is None else pad_id
            nxt = jnp.where(done, fill, nxt)
            done = done | (nxt == eos_id)
        return (nxt, caches, done), nxt

    init = (jnp.full((batch,), bos_id, jnp.int32), caches,
            jnp.zeros((batch,), bool))
    _, out = jax.lax.scan(step, init, jnp.arange(seq_len))
    return out.T  # [B, seq_len]


def beam_generate(
    decoder: Decoder,
    params,
    embed_fn,
    logits_fn,
    *,
    batch: int,
    seq_len: int,
    bos_id: int,
    eos_id: Optional[int] = None,
    beam_size: int = 4,
    length_penalty: float = 1.0,
    pad_id: Optional[int] = None,
    memory=None,
    memory_mask=None,
    cache_dtype=jnp.float32,
):
    """Beam-search decoding as one ``lax.scan`` (an upgrade beyond the
    reference: ``coca_model.generate``'s ``generation_type="beam_search"``
    default raises upstream — only top-k/top-p are implemented there).

    Beams ride the batch axis (``B·K`` rows); each step expands every live
    beam over the vocabulary, keeps the top-``beam_size`` joint-logprob
    candidates per batch element, and reorders the KV caches by the winning
    parents. Finished beams continue with 0-logprob pad steps so scores
    freeze. Returns ``[B, seq_len]`` token ids of the best beam by
    ``score / length**length_penalty``.
    """
    b, k = batch, beam_size
    caches = decoder.init_cache(b * k, seq_len, cache_dtype)
    mem = None if memory is None else jnp.repeat(memory, k, axis=0)
    mem_mask = None if memory_mask is None else jnp.repeat(memory_mask, k, axis=0)
    fill_id = eos_id if pad_id is None else pad_id
    neg = jnp.float32(-1e30)
    rows = jnp.arange(b)[:, None]  # [B, 1]

    def step(carry, idx):
        tokens, caches, done, scores, lengths, seqs = carry
        x = embed_fn(tokens, idx)
        h, caches = decoder.apply(params, x, mem, mem_mask, caches, idx)
        logp = jax.nn.log_softmax(logits_fn(h).astype(jnp.float32), axis=-1)
        v = logp.shape[-1]
        logp = logp.reshape(b, k, v)
        if eos_id is not None:
            # finished beams: only the fill token continues, at zero cost
            frozen = jnp.full((v,), neg).at[fill_id].set(0.0)
            logp = jnp.where(done[:, :, None], frozen[None, None, :], logp)
        total = scores[:, :, None] + logp  # [B, K, V]
        # step 0: all beams are identical; keep only beam 0's candidates so
        # the top-k picks k DISTINCT first tokens
        total = jnp.where((idx == 0) & (jnp.arange(k)[None, :, None] > 0),
                          neg, total)
        new_scores, flat = jax.lax.top_k(total.reshape(b, k * v), k)  # [B, K]
        parent = flat // v  # [B, K]
        token = (flat % v).astype(jnp.int32)

        # reorder per-beam state by winning parent
        gather = (rows * k + parent).reshape(-1)  # [B*K]
        caches = jax.tree_util.tree_map(lambda c: c[gather], caches)
        done = done[rows, parent]
        lengths = lengths[rows, parent]
        seqs = seqs[rows, parent]  # [B, K, L]

        if eos_id is not None:
            now_done = (~done) & (token == eos_id)
            lengths = jnp.where(now_done, idx + 1, lengths)
            done = done | now_done
        seqs = jax.lax.dynamic_update_slice(seqs, token[:, :, None], (0, 0, idx))
        return (token.reshape(-1), caches, done, new_scores, lengths, seqs), None

    seqs0 = jnp.full((b, k, seq_len), fill_id if eos_id is not None else 0,
                     jnp.int32)
    init = (
        jnp.full((b * k,), bos_id, jnp.int32), caches,
        jnp.zeros((b, k), bool), jnp.zeros((b, k), jnp.float32),
        jnp.full((b, k), seq_len, jnp.int32), seqs0,
    )
    (_, _, _, scores, lengths, seqs), _ = jax.lax.scan(
        step, init, jnp.arange(seq_len))
    norm = scores / jnp.maximum(lengths.astype(jnp.float32), 1.0) ** length_penalty
    best = jnp.argmax(norm, axis=1)  # [B]
    return seqs[jnp.arange(b), best]  # [B, seq_len]
