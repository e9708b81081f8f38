"""Torchscale-equivalent encoder stack (the MUSK/BEiT3 backbone), flax-native.

Behavioral reference ``/root/reference/models/musk/torchscale/architecture/
encoder.py`` + components: pre/post-LN residual blocks with optional deepnorm
α-residual scaling, sub-LayerNorm FFNs, MoE every ``moe_freq`` layers, xPos
rotary embeddings, T5-style relative position bias, multiway (per-modality)
FFN/LayerNorm duplication, per-layer activation checkpointing.

TPU-native mapping:
  * fairscale ``checkpoint_wrapper``        → ``flax.linen.remat``;
  * FSDP ``wrap``                           → param sharding on the mesh (the
    caller annotates with ``NamedSharding``; see ``moc_tpu.train.pretrain``);
  * apex FusedLayerNorm                     → XLA-fused ``nn.LayerNorm``;
  * flash/xformers attention                → ``moc_tpu.ops.flash_attention``
    (dense jnp path when a relative-position bias needs adding to scores);
  * LongNet DilatedAttention                → ``moc_tpu.parallel.dilated``
    with the ``seq`` mesh axis for context parallelism;
  * GShard MOELayer                         → ``moc_tpu.parallel.moe`` with
    the ``expert`` mesh axis.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.nn.transformer import gelu_exact
from moc_tpu.ops.flash_attention import flash_attention
from moc_tpu.parallel.dilated import DilatedConfig, dilated_attention
from moc_tpu.parallel.ring import ring_attention
from moc_tpu.parallel.moe import MoEConfig, MoELayer


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Mirrors the knobs of torchscale ``EncoderConfig`` that the reference
    exercises (``architecture/config.py:5-84``)."""

    embed_dim: int = 768
    ffn_dim: int = 3072
    layers: int = 12
    heads: int = 12
    normalize_before: bool = True
    deepnorm: bool = False
    subln: bool = True
    multiway: bool = False
    xpos: bool = False
    xpos_scale_base: int = 512
    rel_pos_buckets: int = 0
    max_rel_pos: int = 0
    moe_freq: int = 0
    moe: MoEConfig = MoEConfig()
    dilated: Optional[DilatedConfig] = None
    seq_axis: Optional[str] = None  # mesh axis for dilated context parallelism
    ring_axis: Optional[str] = None  # mesh axis for ring-attention seq parallel
    expert_axis: Optional[str] = None  # mesh axis for MoE expert parallelism
    remat: bool = False
    layernorm_eps: float = 1e-5
    # mixed-precision compute: dtype the matmul projections cast their
    # inputs AND kernels to (params stay float32 master weights; LayerNorms
    # keep their default None dtype, so f32 scale/bias promote the stats to
    # f32 — the standard bf16-compute/f32-LN recipe). None = full f32.
    # Measured on v5e (BENCH_NOTES r4 "bf16 compute"): see table there.
    compute_dtype: str | None = None

    def __post_init__(self):
        if self.deepnorm:  # torchscale consistency rule (config.py:63-70)
            object.__setattr__(self, "normalize_before", False)
            object.__setattr__(self, "subln", False)


# ─────────────────────────── positional systems ───────────────────────────


def xpos_apply(x: jax.Array, pos: jax.Array, center, scale_base: int,
               downscale: bool):
    """xPos rotation + exponential decay at explicit positions.

    ``x [..., T, Dh]``; ``pos [T]`` absolute token positions (may be traced);
    ``center`` the zero-point of the DECAY exponent (the reference centers it
    at ``ceil(total/2)`` per call — the attention score only sees the
    *difference* of q/k decay exponents, so any shared center is equivalent;
    exposing it lets the cached decode step reproduce the reference's
    per-step coordinates exactly). Rotary ANGLES always use the raw 0-based
    positions (ref ``fixed_pos_embedding``). ``inv_freq`` spans ``Dh/2``."""
    dh = x.shape[-1]
    half = dh // 2
    posf = pos.astype(jnp.float32)
    scale_vec = (jnp.arange(0, dh, 2) + 0.4 * dh) / (1.4 * dh)  # [half]
    scale = scale_vec[None, :] ** ((posf[:, None] - center) / scale_base)
    if downscale:
        scale = 1.0 / scale
    inv_freq = 1.0 / (10000 ** (jnp.arange(half) / half))
    ang = posf[:, None] * inv_freq[None, :]

    def dup(m):  # interleave-duplicate [T, half] -> [T, dh]
        return jnp.repeat(m, 2, axis=-1)

    sin, cos = dup(jnp.sin(ang) * scale), dup(jnp.cos(ang) * scale)
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos + rot * sin


def xpos_rotary(x: jax.Array, scale_base: int, downscale: bool, offset: int = 0):
    """xPos rotary embedding (ref ``xpos_relative_position.py:38-65``).
    ``x [..., L, Dh]`` (per-head), applied to q (downscale=False) / k (True).

    Two coordinate systems coexist (ref ``XPOS.forward``): the DECAY
    exponent runs over the zero-centered range ``arange(min_pos,
    min_pos+L+offset)`` while the rotary ANGLES use plain 0-based positions
    ``arange(L+offset)``; both take the last ``L`` rows."""
    length = x.shape[-2]
    total = length + offset
    pos = jnp.arange(total)[-length:]
    return xpos_apply(x, pos, (total + 1) // 2, scale_base, downscale)


class RelativePositionBias(nn.Module):
    """T5 bucketed relative position bias (ref
    ``relative_position_bias.py:10-83``) → additive ``[H, L, L]``."""

    num_buckets: int = 32
    max_distance: int = 128
    heads: int = 12
    bidirectional: bool = True

    def _bucket(self, rel):
        num_buckets = self.num_buckets
        ret = 0
        n = -rel
        if self.bidirectional:
            num_buckets //= 2
            ret += (n < 0).astype(jnp.int32) * num_buckets
            n = jnp.abs(n)
        else:
            n = jnp.maximum(n, 0)
        max_exact = num_buckets // 2
        is_small = n < max_exact
        val_large = max_exact + (
            jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
            / math.log(self.max_distance / max_exact)
            * (num_buckets - max_exact)
        ).astype(jnp.int32)
        val_large = jnp.minimum(val_large, num_buckets - 1)
        return ret + jnp.where(is_small, n, val_large)

    @nn.compact
    def __call__(self, qlen: int, klen: int, step=0):
        """``step`` offsets the query positions (ref ``compute_bias(step)``)
        — used by cached decoding where the query is row ``index``."""
        table = self.param("rel_attn_bias", nn.initializers.normal(0.02),
                           (self.num_buckets, self.heads))
        ctx = jnp.arange(qlen)[:, None] + step
        mem = jnp.arange(klen)[None, :]
        buckets = self._bucket(mem - ctx)
        return table[buckets].transpose(2, 0, 1)  # [H, L, L]


class RMSNorm(nn.Module):
    """Root-mean-square norm (ref ``component/rms_norm.py``)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + self.eps) * scale


def drop_path(x, rate: float, rng, deterministic: bool):
    """Stochastic depth (ref ``component/droppath.py``): drop the whole
    residual branch per sample with prob ``rate``."""
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ─────────────────────────────── multiway ───────────────────────────────


class MultiwayDense(nn.Module):
    """Two parallel Dense experts split by modality position
    (ref ``multiway_network.py:10-55``): tokens before ``split`` use branch
    A, the rest branch B. In the BEiT3 stream order (vision first,
    ``BEiT3.py:68-72``) A serves vision and B text; ``split=0`` routes
    everything through B, ``split=None`` through A."""

    features: int
    use_bias: bool = True
    dtype: str | None = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, split: int | None):
        a = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="A")(x)
        if split is None:
            return a
        b = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="B")(x)
        pos = jnp.arange(x.shape[-2])[:, None]
        return jnp.where(pos < split, a, b)


class MultiwayLayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, split: int | None):
        a = nn.LayerNorm(epsilon=self.eps, name="A")(x)
        if split is None:
            return a
        b = nn.LayerNorm(epsilon=self.eps, name="B")(x)
        pos = jnp.arange(x.shape[-2])[:, None]
        return jnp.where(pos < split, a, b)


# ─────────────────────────────── layers ───────────────────────────────


class FeedForward(nn.Module):
    """FFN with optional inner LayerNorm (``subln``,
    ref ``feedforward_network.py:105-137``)."""

    dim: int
    ffn_dim: int
    subln: bool = True
    eps: float = 1e-5
    dtype: str | None = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        h = gelu_exact(nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x))
        if self.subln:
            h = nn.LayerNorm(epsilon=self.eps, name="ffn_layernorm")(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class MultiwayFeedForward(nn.Module):
    dim: int
    ffn_dim: int
    subln: bool = True
    eps: float = 1e-5
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, split: int | None):
        a = FeedForward(self.dim, self.ffn_dim, self.subln, self.eps,
                        self.dtype, name="A")(x)
        if split is None:
            return a
        b = FeedForward(self.dim, self.ffn_dim, self.subln, self.eps,
                        self.dtype, name="B")(x)
        pos = jnp.arange(x.shape[-2])[:, None]
        return jnp.where(pos < split, a, b)


class SelfAttention(nn.Module):
    """Encoder self-attention: q/k/v/out projections + xPos + flash or dense
    scores (dense when a relative-position bias must be added), optional
    inner LayerNorm (``subln``), optional dilated (LongNet) form.

    Parameter names mirror torchscale (q_proj/k_proj/v_proj/out_proj,
    ``multihead_attention.py:20-66``).
    """

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, padding_mask=None, rel_pos=None, split: int | None = None):
        cfg = self.cfg
        b, l, d = x.shape
        h = cfg.heads
        dh = d // h
        cd = cfg.compute_dtype
        if cfg.multiway:
            # torchscale wraps the attention projections in MultiwayWrapper
            # too (``multihead_attention.py:43-48``): per-modality q/k/v/out
            q = MultiwayDense(d, dtype=cd, name="q_proj")(x, split)
            k = MultiwayDense(d, dtype=cd, name="k_proj")(x, split)
            v = MultiwayDense(d, dtype=cd, name="v_proj")(x, split)
        else:
            q = nn.Dense(d, dtype=cd, name="q_proj")(x)
            k = nn.Dense(d, dtype=cd, name="k_proj")(x)
            v = nn.Dense(d, dtype=cd, name="v_proj")(x)

        def to_heads(t):
            return t.reshape(b, l, h, dh)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        if cfg.xpos:
            flat = lambda t: t.transpose(0, 2, 1, 3).reshape(b * h, l, dh)
            unflat = lambda t: t.reshape(b, h, l, dh).transpose(0, 2, 1, 3)
            q = unflat(xpos_rotary(flat(q), cfg.xpos_scale_base, downscale=False))
            k = unflat(xpos_rotary(flat(k), cfg.xpos_scale_base, downscale=True))

        if cfg.dilated is not None:
            # dilated branches carry no mask/bias plumbing (segment
            # rearrangement scrambles positions) — silently attending pad
            # keys would break the pad-invariance invariant, so reject
            # the unsupported combinations loudly like the ring branch
            if padding_mask is not None or rel_pos is not None:
                raise ValueError(
                    "dilated attention supports unpadded, bias-free "
                    "sequences (got padding_mask/rel_pos); pad to a "
                    "segment-aligned length without a mask instead")
            attn = dilated_attention(q, k, v, cfg.dilated, causal=False,
                                     axis_name=cfg.seq_axis)  # [B, L, D]
        elif cfg.ring_axis is not None:
            # full global attention over a sequence-sharded mesh axis via
            # neighbor-hop KV rotation (must run inside shard_map). Padding
            # and rel-pos need global-position plumbing ring doesn't carry.
            if padding_mask is not None or rel_pos is not None or cfg.xpos:
                raise ValueError(
                    "ring_axis supports unpadded, bias-free, xpos-free "
                    "attention only (global positions are not plumbed "
                    "through the ring rotation)")
            attn = ring_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), cfg.ring_axis,
            ).transpose(0, 2, 1, 3).reshape(b, l, d)
        elif rel_pos is not None:
            qh = q.transpose(0, 2, 1, 3)  # [B, H, L, Dh]
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            scores = jnp.einsum("bhqd,bhkd->bhqk", qh * (dh ** -0.5), kh)
            scores = scores + rel_pos[None]
            if padding_mask is not None:
                scores = jnp.where(padding_mask[:, None, None, :], -1e30, scores)
            w = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, l, d)
        else:
            # lane-unaligned lengths (MUSK-384's 577 tokens) take
            # flash_attention's XLA dense fallback ON PURPOSE: the
            # lane-padded Pallas kernel measured 0.82x (f32) / 0.95x (bf16)
            # vs dense at that shape on v5 lite (BENCH_NOTES "Round 3
            # (session 7)"); flash_attention_padded exists for callers that
            # want the kernel's O(L) memory anyway (tower attn_impl knob)
            seg = None
            if padding_mask is not None:
                seg = (~padding_mask).astype(jnp.int32)
            attn = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                q_segment_ids=seg, kv_segment_ids=seg,
                block_q=min(1024, l), block_k=min(1024, l),
            ).transpose(0, 2, 1, 3).reshape(b, l, d)

        if cfg.subln:
            if cfg.multiway:
                attn = MultiwayLayerNorm(cfg.layernorm_eps, name="inner_attn_ln")(attn, split)
            else:
                attn = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="inner_attn_ln")(attn)
        if cfg.multiway:
            return MultiwayDense(d, dtype=cd, name="out_proj")(attn, split)
        return nn.Dense(d, dtype=cd, name="out_proj")(attn)


class EncoderLayer(nn.Module):
    cfg: EncoderConfig
    is_moe: bool = False

    @nn.compact
    def __call__(self, x, padding_mask=None, rel_pos=None, split: int | None = None):
        cfg = self.cfg
        alpha = math.pow(2.0 * cfg.layers, 0.25) if cfg.deepnorm else 1.0
        aux = jnp.float32(0.0)

        residual = x
        if cfg.normalize_before:
            x = MultiwayLayerNorm(cfg.layernorm_eps, name="self_attn_layer_norm")(x, split)
        x = SelfAttention(cfg, name="self_attn")(x, padding_mask, rel_pos, split)
        x = residual * alpha + x
        if not cfg.normalize_before:
            x = MultiwayLayerNorm(cfg.layernorm_eps, name="self_attn_layer_norm")(x, split)

        residual = x
        if cfg.normalize_before:
            x = MultiwayLayerNorm(cfg.layernorm_eps, name="final_layer_norm")(x, split)
        if self.is_moe:
            b, l, d = x.shape
            # experts inherit the encoder's subln (ref ``make_experts`` passes
            # ``args.subln``, feedforward_network.py:60-68)
            mcfg = cfg.moe
            if mcfg.expert_subln is None:
                mcfg = dataclasses.replace(mcfg, expert_subln=cfg.subln,
                                           layernorm_eps=cfg.layernorm_eps)
            if mcfg.compute_dtype is None and cfg.compute_dtype is not None:
                # experts inherit the encoder's mixed-precision tier
                mcfg = dataclasses.replace(mcfg,
                                           compute_dtype=cfg.compute_dtype)
            y, aux = MoELayer(dim=d, hidden_dim=cfg.ffn_dim, cfg=mcfg,
                              axis_name=cfg.expert_axis, name="moe_layer")(
                x.reshape(b * l, d),
                # pad tokens must not occupy expert capacity (the aux
                # loss still averages over the padded axis, matching the
                # reference routing.py:94-99 — see moe_dispatch_combine)
                None if padding_mask is None else padding_mask.reshape(b * l),
            )
            x = y.reshape(b, l, d)
        else:
            x = MultiwayFeedForward(cfg.embed_dim, cfg.ffn_dim, cfg.subln,
                                    cfg.layernorm_eps, cfg.compute_dtype,
                                    name="ffn")(x, split)
        x = residual * alpha + x
        if not cfg.normalize_before:
            x = MultiwayLayerNorm(cfg.layernorm_eps, name="final_layer_norm")(x, split)
        return x, aux


class Encoder(nn.Module):
    """The full stack (ref ``encoder.py:220-399``): optional T5 relative
    bias shared across layers, MoE every ``moe_freq`` layers, per-layer
    remat. Returns ``(x, total_moe_aux_loss)``."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, padding_mask=None, split: int | None = None):
        cfg = self.cfg
        rel_pos = None
        # both knobs, like the decoder (decoder.py): rel_pos_buckets alone
        # with the default max_rel_pos=0 would hit log(0) in _bucket
        if cfg.rel_pos_buckets > 0 and cfg.max_rel_pos > 0:
            rel_pos = RelativePositionBias(
                cfg.rel_pos_buckets, cfg.max_rel_pos, cfg.heads, name="relative_position"
            )(x.shape[1], x.shape[1])

        total_aux = jnp.float32(0.0)
        layer_cls = EncoderLayer
        if cfg.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(4,))
        for i in range(cfg.layers):
            is_moe = cfg.moe_freq > 0 and (i + 1) % cfg.moe_freq == 0
            x, aux = layer_cls(cfg, is_moe, name=f"layers_{i}")(
                x, padding_mask, rel_pos, split
            )
            total_aux = total_aux + aux
        if cfg.normalize_before:
            x = MultiwayLayerNorm(cfg.layernorm_eps, name="layer_norm")(x, split)
        return x, total_aux
