"""RetNet: multi-scale retention with parallel / recurrent / chunkwise forms.

Behavioral reference ``/root/reference/models/musk/torchscale/architecture/
retnet.py`` + ``component/multiscale_retention.py:76-166``: per-head
exponential decay γ_h = 1 − 2^(−5−h), rotary θ-shift of q/k, a decayed
attention matrix with row-sum normalization in the parallel form, a
recurrent state ``S_n = γ S_{n−1} + k_nᵀ v_n`` for O(1) decoding, per-head
GroupNorm, and a swish gate before the output projection.

The recurrent form is a ``lax.scan`` (the TPU-native replacement of the
reference's per-step Python loop); parallel↔recurrent equivalence is tested.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn



@dataclasses.dataclass(frozen=True)
class RetNetConfig:
    embed_dim: int = 512
    value_dim: int = 1024  # torchscale decoder_value_embed_dim
    heads: int = 4
    ffn_dim: int = 1024
    layers: int = 6
    layernorm_eps: float = 1e-6  # ref RetNetConfig default (config.py:285)
    activation: str = "gelu"  # GLU activation (ref config.py:257)


def retention_rel_pos(slen: int, heads: int, head_qk_dim: int,
                      pos_offset=0):
    """(sin, cos, decay) tables (ref ``retnet.py RetNetRelPos``).

    ``pos_offset`` rotates at ABSOLUTE positions ``offset..offset+slen-1``
    — required when continuing recurrent/chunkwise decoding across calls
    (the threaded state holds keys rotated at their absolute positions;
    restarting theta at 0 breaks the relative angles — review r3; the
    reference's ``recurrent_forward`` indexes sin/cos absolutely)."""
    angle = 1.0 / (10000 ** jnp.linspace(0, 1, head_qk_dim // 2))
    angle = jnp.repeat(angle, 2)  # interleaved pairs
    pos = jnp.arange(slen) + pos_offset
    sin = jnp.sin(pos[:, None] * angle[None, :])
    cos = jnp.cos(pos[:, None] * angle[None, :])
    decay = jnp.log(1 - 2.0 ** (-5 - jnp.arange(heads, dtype=jnp.float32)))
    return sin, cos, decay


def theta_shift(x, sin, cos):
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos + rot * sin


def _decay_mask(slen: int, decay: jax.Array) -> jax.Array:
    """Causal decay matrix ``[H, L, L]``: γ^(n−m), row-normalized by
    sqrt(row sum) (torchscale parallel mask)."""
    idx = jnp.arange(slen)
    rel = idx[:, None] - idx[None, :]
    mask = jnp.where(rel >= 0, jnp.exp(decay[:, None, None] * rel[None]), 0.0)
    denom = jnp.sqrt(jnp.sum(mask, axis=-1, keepdims=True)).clip(1.0)
    return mask / denom


class MultiScaleRetention(nn.Module):
    cfg: RetNetConfig

    stabilize: bool = True  # torchscale's extra abs-row-sum clamp (parallel only)

    @nn.compact
    def __call__(self, x, mode: str = "parallel", state=None, chunk_size: int = 64,
                 pos_offset=0):
        """``x [B, L, D]`` → (out, new_state). Modes: parallel | recurrent |
        chunkwise. ``state = (kv [B, H, Dk, Dv], scale [H])`` threads
        recurrent decoding; pass ``pos_offset`` = number of tokens already
        consumed so a continued call rotates q/k at absolute positions.
        With ``stabilize=False`` the parallel and recurrent forms are
        numerically equivalent (the reference's parallel form adds a
        detached abs-row-sum clamp the recurrent form lacks)."""
        c = self.cfg
        b, l, d = x.shape
        h = c.heads
        dk = c.embed_dim // h
        dv = c.value_dim // h

        q = nn.Dense(c.embed_dim, use_bias=False, name="q_proj")(x)
        k = nn.Dense(c.embed_dim, use_bias=False, name="k_proj")(x)
        v = nn.Dense(c.value_dim, use_bias=False, name="v_proj")(x)
        g = nn.Dense(c.value_dim, use_bias=False, name="g_proj")(x)

        sin, cos, decay = retention_rel_pos(l, h, dk, pos_offset)
        qh = theta_shift(q.reshape(b, l, h, dk), sin[:, None], cos[:, None])
        kh = theta_shift(k.reshape(b, l, h, dk), sin[:, None], cos[:, None])
        kh = kh * (dk ** -0.5)
        vh = v.reshape(b, l, h, dv)

        gamma = jnp.exp(decay)  # [H]
        if mode == "parallel":
            mask = _decay_mask(l, decay)  # [H, L, L] (sqrt-row-sum normalized)
            qk = jnp.einsum("blhd,bmhd->bhlm", qh, kh) * mask[None]
            if self.stabilize:
                # ref parallel_forward: detached SUM-OF-ABS row scale,
                # clamped to [1, 5e4] (multiscale_retention.py:83-85)
                qk = qk / jax.lax.stop_gradient(
                    jnp.sum(jnp.abs(qk), axis=-1, keepdims=True).clip(1.0, 5e4)
                )
            out = jnp.einsum("bhlm,bmhv->blhv", qk, vh)
            new_state = None
        elif mode == "recurrent":
            if state is None:
                state = (jnp.zeros((b, h, dk, dv), x.dtype), jnp.zeros((h,), x.dtype))

            def step(carry, inp):
                s, scale = carry
                qi, ki, vi = inp  # [B, H, dk], [B, H, dk], [B, H, dv]
                scale_new = gamma * scale + 1.0  # running row sum of decays
                df = gamma * jnp.sqrt(scale / scale_new)  # [H]
                s = s * df[None, :, None, None] + (
                    ki[..., :, None] * vi[..., None, :]
                ) / jnp.sqrt(scale_new)[None, :, None, None]
                o = jnp.einsum("bhd,bhdv->bhv", qi, s)
                return (s, scale_new), o

            qs = qh.transpose(1, 0, 2, 3)  # [L, B, H, dk]
            ks = kh.transpose(1, 0, 2, 3)
            vs = vh.transpose(1, 0, 2, 3)
            new_state, outs = jax.lax.scan(step, state, (qs, ks, vs))
            out = outs.transpose(1, 0, 2, 3)  # [B, L, H, dv]
        elif mode == "chunkwise":
            # within-chunk parallel + cross-chunk recurrent state (unnormalized
            # state; per-position sqrt-row-sum applied like the parallel form)
            assert l % chunk_size == 0
            nc = l // chunk_size
            t = chunk_size
            pos = jnp.arange(t, dtype=jnp.float32)
            rel = pos[:, None] - pos[None, :]
            raw_mask = jnp.where(rel >= 0, gamma[:, None, None] ** rel[None], 0.0)
            qc = qh.reshape(b, nc, t, h, dk)
            kc = kh.reshape(b, nc, t, h, dk)
            vc = vh.reshape(b, nc, t, h, dv)
            cross_decay = gamma[None, :] ** (pos[:, None] + 1)  # [T, H]
            kv_decay = gamma[:, None] ** (t - 1 - pos[None, :])  # [H, T]

            def chunk_step(carry, inp):
                s, offset = carry  # s unnormalized kv state; offset = chunk idx
                qi, ki, vi = inp  # [B, T, ...]
                inner = jnp.einsum("blhd,bmhd->bhlm", qi, ki) * raw_mask[None]
                inner_out = jnp.einsum("bhlm,bmhv->blhv", inner, vi)
                cross = jnp.einsum("blhd,bhdv->blhv", qi, s) * cross_decay[None, :, :, None]
                # global row sum of decays at absolute position p = offset*T + l:
                # (1 - γ^(p+1)) / (1 - γ)
                abs_pos = offset * t + pos
                row_sum = (1 - gamma[None, :] ** (abs_pos[:, None] + 1)) / (1 - gamma[None, :])
                o = (inner_out + cross) / jnp.sqrt(row_sum)[None, :, :, None]
                s = gamma[None, :, None, None] ** t * s + jnp.einsum(
                    "bmhd,hm,bmhv->bhdv", ki, kv_decay, vi
                )
                return (s, offset + 1), o

            state0 = state if state is not None else (
                jnp.zeros((b, h, dk, dv), x.dtype), jnp.int32(0)
            )
            qs = qc.transpose(1, 0, 2, 3, 4)
            ks = kc.transpose(1, 0, 2, 3, 4)
            vs = vc.transpose(1, 0, 2, 3, 4)
            new_state, outs = jax.lax.scan(chunk_step, state0, (qs, ks, vs))
            out = outs.transpose(1, 0, 2, 3, 4).reshape(b, l, h, dv)
        else:
            raise ValueError(mode)

        # per-head affine-free RMSNorm (ref RMSNorm(head_dim,
        # elementwise_affine=False), multiscale_retention.py:66): makes the
        # output invariant to the per-row positive stabilization scalings of
        # every form, which is what ties parallel/recurrent/chunkwise together
        out = out * jax.lax.rsqrt(
            jnp.mean(jnp.square(out), axis=-1, keepdims=True) + c.layernorm_eps)
        out = jax.nn.silu(g) * out.reshape(b, l, h * dv)
        out = nn.Dense(c.embed_dim, use_bias=False, name="out_proj")(out)
        return out, new_state


class GLU(nn.Module):
    """Gated linear unit FFN (ref ``component/gate_linear_unit.py:34-44``:
    ``fc2(act(fc1(x)) · gate(x))`` — the activation is on the fc1 branch)."""

    dim: int
    ffn_dim: int
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        act = (jax.nn.silu if self.activation in ("swish", "silu")
               else lambda v: jax.nn.gelu(v, approximate=False))
        g = nn.Dense(self.ffn_dim, use_bias=False, name="gate")(x)
        h = act(nn.Dense(self.ffn_dim, use_bias=False, name="fc1")(x))
        return nn.Dense(self.dim, use_bias=False, name="fc2")(h * g)


class RetNetBlock(nn.Module):
    """Pre-norm retention + GLU block; all norms are affine RMSNorm
    (ref ``architecture/retnet.py:95,127`` — NOT LayerNorm)."""

    cfg: RetNetConfig

    @nn.compact
    def __call__(self, x, mode="parallel", state=None, chunk_size: int = 64):
        from moc_tpu.nn.encoder import RMSNorm

        c = self.cfg
        h, new_state = MultiScaleRetention(c, name="retention")(
            RMSNorm(eps=c.layernorm_eps, name="retention_layer_norm")(x),
            mode=mode, state=state, chunk_size=chunk_size,
        )
        x = x + h
        x = x + GLU(c.embed_dim, c.ffn_dim, c.activation, name="ffn")(
            RMSNorm(eps=c.layernorm_eps, name="final_layer_norm")(x)
        )
        return x, new_state


class RetNetDecoder(nn.Module):
    """Stack of retention blocks (ref ``architecture/retnet.py``)."""

    cfg: RetNetConfig

    @nn.compact
    def __call__(self, x, mode: str = "parallel", states=None,
                 chunk_size: int = 64):
        from moc_tpu.nn.encoder import RMSNorm

        c = self.cfg
        new_states = []
        for i in range(c.layers):
            s = states[i] if states is not None else None
            x, ns = RetNetBlock(c, name=f"layers_{i}")(
                x, mode=mode, state=s, chunk_size=chunk_size)
            new_states.append(ns)
        x = RMSNorm(eps=c.layernorm_eps, name="layer_norm")(x)
        return x, new_states
