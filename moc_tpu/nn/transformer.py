"""Transformer primitives (flax.linen), torch-checkpoint-compatible layouts.

Behavioral reference: the CONCH open_clip stack
(``/root/reference/models/conch/open_clip_custom/transformer.py``): pre-LN
residual blocks with additive attention masks, GELU MLPs, and attentional
poolers whose queries are learned parameters. Everything here is batch-major
``[B, L, D]`` (the torch original is ``[L, N, D]``; layouts converge after
conversion) and relies on XLA to fuse — no manual scheduling.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


# torch nn.LayerNorm eps (flax defaults to 1e-6, which breaks checkpoint
# parity on small-variance activations like 0.02-std token embeddings).
TORCH_LN_EPS = 1e-5


def LayerNorm(name=None):
    return nn.LayerNorm(epsilon=TORCH_LN_EPS, name=name)


def dot_product_attention(q, k, v, mask=None):
    """Standard softmax attention. ``q,k,v: [B, H, L, Dh]``;
    ``mask: additive [..., Lq, Lk]`` broadcastable or None."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _split_heads(x, n_heads):
    b, l, d = x.shape
    return x.reshape(b, l, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def _lora_a_init(key, shape, dtype=jnp.float32):
    # torch kaiming_uniform_(a=sqrt(5)) on [r, in]: U(±1/sqrt(in));
    # flax layout is [.., in, r] so fan_in = shape[-2] (leading dims may
    # stack experts).
    bound = 1.0 / (shape[-2] ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Attention(nn.Module):
    """Self-attention with a fused qkv projection (torch ``in_proj`` layout).

    ``lora_rank > 0`` adds low-rank residual projections to the q and v
    slices (the reference's timm-ViT LoRA surgery,
    ``/root/reference/models/lora.py:13-42,68-97``: A kaiming-uniform,
    B zero, base weights frozen by the optimizer mask in
    ``moc_tpu.models.lora``).

    ``lora_experts > 1`` stacks that many LoRA expert pairs per projection
    and blends their deltas with a per-token softmax router — a WORKING
    realization of the reference's ``MOELoRA`` (``lora.py:107-168``), whose
    checked-in form is a copy of plain LoRA with a broken ``super()`` call
    and an ignored ``moe_num``. Router weights init to zero (uniform gate)
    and B to zero, so the wrapped model starts exactly at the base forward;
    all mixture params carry the ``lora_`` prefix for the optimizer mask.
    """

    dim: int
    num_heads: int
    lora_rank: int = 0
    lora_experts: int = 1
    attn_impl: str = "dense"  # "flash" = Pallas kernel (unmasked self-attn)

    @nn.compact
    def __call__(self, x, mask=None):
        qkv = nn.Dense(3 * self.dim, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.lora_rank > 0 and self.lora_experts > 1:
            r, e = self.lora_rank, self.lora_experts
            a_q = self.param("lora_moe_a_q", _lora_a_init, (e, self.dim, r))
            b_q = self.param("lora_moe_b_q", nn.initializers.zeros,
                             (e, r, self.dim))
            a_v = self.param("lora_moe_a_v", _lora_a_init, (e, self.dim, r))
            b_v = self.param("lora_moe_b_v", nn.initializers.zeros,
                             (e, r, self.dim))
            router = self.param("lora_router", nn.initializers.zeros,
                                (self.dim, e))
            gate = jax.nn.softmax(x @ router, axis=-1)  # [.., L, E]
            # expose router probabilities for the Switch-style balance loss
            # (collect with mutable=["intermediates"]; see
            # moc_tpu.models.lora.lora_balance_loss)
            self.sow("intermediates", "lora_gate", gate)

            def delta(a, b):
                h = jnp.einsum("...d,edr->...er", x, a)
                d = jnp.einsum("...er,erd->...ed", h, b)
                return jnp.einsum("...ed,...e->...d", d, gate)

            q = q + delta(a_q, b_q)
            v = v + delta(a_v, b_v)
        elif self.lora_rank > 0:
            r = self.lora_rank
            a_q = self.param("lora_a_q", _lora_a_init, (self.dim, r))
            b_q = self.param("lora_b_q", nn.initializers.zeros, (r, self.dim))
            a_v = self.param("lora_a_v", _lora_a_init, (self.dim, r))
            b_v = self.param("lora_b_v", nn.initializers.zeros, (r, self.dim))
            q = q + (x @ a_q) @ b_q
            v = v + (x @ a_v) @ b_v
        if self.attn_impl == "flash":
            # opt-in Pallas flash path for mask-free self-attention (the
            # vision trunks: dense materializes [B, H, L, L] scores — ~2 GB
            # per layer at CONCH-448's 785 tokens f32/batch-64). A MEMORY
            # knob: dense measured faster at tower lengths (flash 0.77-0.95x
            # on v5 lite, BENCH_NOTES r3 s7). Lane-padding handled by the
            # wrapper; additive-mask callers (the text tower's causal+cls
            # mask) stay dense.
            if mask is not None:
                raise ValueError('attn_impl="flash" supports unmasked '
                                 "self-attention only (additive masks need "
                                 "the dense path)")
            from moc_tpu.ops.flash_attention import flash_attention_padded

            out = flash_attention_padded(
                _split_heads(q, self.num_heads),
                _split_heads(k, self.num_heads),
                _split_heads(v, self.num_heads),
            )
        else:
            out = dot_product_attention(
                _split_heads(q, self.num_heads),
                _split_heads(k, self.num_heads),
                _split_heads(v, self.num_heads),
                mask,
            )
        return nn.Dense(self.dim, name="out_proj")(_merge_heads(out))


class CrossAttention(nn.Module):
    """Cross-attention with separate q/k/v projections (torch
    ``MultiheadAttention(kdim=..., vdim=...)`` unfused layout)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q_in, kv_in, key_padding_mask=None):
        q = nn.Dense(self.dim, name="q_proj")(q_in)
        k = nn.Dense(self.dim, name="k_proj")(kv_in)
        v = nn.Dense(self.dim, name="v_proj")(kv_in)
        mask = None
        if key_padding_mask is not None:
            # True = masked out (torch key_padding_mask semantics); finite
            # fill (not -inf) so an ALL-masked key set — an empty bag fed to
            # a pooling cross-attention — yields a uniform row instead of
            # softmax(-inf...)=NaN poisoning the slide (review r3)
            mask = jnp.where(key_padding_mask[:, None, None, :],
                             -0.7 * jnp.finfo(jnp.float32).max, 0.0)
        out = dot_product_attention(
            _split_heads(q, self.num_heads),
            _split_heads(k, self.num_heads),
            _split_heads(v, self.num_heads),
            mask,
        )
        return nn.Dense(self.dim, name="out_proj")(_merge_heads(out))


def gelu_exact(x):
    """Exact (erf) GELU — torch ``nn.GELU`` default; flax's default is the
    tanh approximation, which breaks checkpoint parity at the 1e-2 level."""
    return nn.gelu(x, approximate=False)


class MlpBlock(nn.Module):
    """fc → act → proj (torch ``c_fc``/``c_proj`` naming for conversion)."""

    dim: int
    mlp_ratio: float = 4.0
    act: Callable = gelu_exact

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.mlp_ratio)
        x = nn.Dense(hidden, name="c_fc")(x)
        x = self.act(x)
        return nn.Dense(self.dim, name="c_proj")(x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN residual block: ``x + attn(ln_1(x))``, ``x + mlp(ln_2(x))``."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    lora_rank: int = 0
    block_lora_rank: int = 0
    lora_experts: int = 1
    attn_impl: str = "dense"

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + Attention(self.dim, self.num_heads, self.lora_rank,
                          self.lora_experts, self.attn_impl, name="attn")(
            LayerNorm(name="ln_1")(x), mask
        )
        x = x + MlpBlock(self.dim, self.mlp_ratio, name="mlp")(
            LayerNorm(name="ln_2")(x)
        )
        if self.block_lora_rank > 0:
            # whole-block residual LoRA on the block OUTPUT
            # (ref ``_LoRA_block_timm``, ``lora.py:171-191``)
            r = self.block_lora_rank
            a = self.param("lora_block_a", _lora_a_init, (self.dim, r))
            b = self.param("lora_block_b", nn.initializers.zeros, (r, self.dim))
            x = x + (x @ a) @ b
        return x


class Transformer(nn.Module):
    """A stack of residual attention blocks with optional rematerialization.

    ``lora_rank`` + ``lora_last_n`` inject q/v LoRA into the last n blocks
    only (the reference's ``lora_cnt`` semantics, ``lora.py:68-78``;
    ``lora_last_n=None`` = every block).
    """

    dim: int
    num_layers: int
    num_heads: int
    mlp_ratio: float = 4.0
    remat: bool = False
    lora_rank: int = 0
    lora_last_n: int | None = None
    block_lora_rank: int = 0  # whole-block residual LoRA (ref Block_LoRA)
    lora_experts: int = 1  # >1 = mixture-of-LoRA-experts per injected block
    attn_impl: str = "dense"  # "flash" = Pallas self-attention (no masks)

    @nn.compact
    def __call__(self, x, mask=None):
        block = ResidualAttentionBlock
        if self.remat:
            block = nn.remat(block, static_argnums=())
        first_lora = 0
        if (self.lora_rank or self.block_lora_rank) and self.lora_last_n is not None:
            first_lora = max(0, self.num_layers - self.lora_last_n)
        for i in range(self.num_layers):
            rank = self.lora_rank if i >= first_lora else 0
            brank = self.block_lora_rank if i >= first_lora else 0
            x = block(self.dim, self.num_heads, self.mlp_ratio, rank, brank,
                      self.lora_experts, self.attn_impl,
                      name=f"resblocks_{i}")(x, mask)
        return x


class AttentionalPooler(nn.Module):
    """Learned-query cross-attention pooling
    (ref ``transformer.py:161-188``): ``n_queries`` learned query vectors
    attend over LayerNormed context tokens."""

    dim: int
    context_dim: int
    num_heads: int = 8
    n_queries: int = 256

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        # x: [B, L, context_dim]
        query = self.param("query", nn.initializers.normal(1.0), (self.n_queries, self.dim))
        q = LayerNorm(name="ln_q")(query)[None].repeat(x.shape[0], axis=0)
        k = LayerNorm(name="ln_k")(x)
        return CrossAttention(self.dim, self.num_heads, name="attn")(
            q, k, key_padding_mask
        )  # [B, n_queries, dim]
