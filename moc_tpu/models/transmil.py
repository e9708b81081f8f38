"""TransMIL: Nystrom-attention transformer MIL with conv positional encoding.

Behavioral reference ``/root/reference/models/model_mil.py:105-273`` (which
wraps the ``nystrom_attention`` pip package): fc → square-pad by wrapping →
cls token → TransLayer → PPEG depthwise-conv positional encoding → TransLayer
→ LayerNorm → cls-token classifier.

The Nystrom attention here is a masked re-implementation of the algorithm
(Xiong et al. 2021): landmark means over sequence groups, three softmax
kernels, iterative Moore-Penrose pseudo-inverse, plus the depthwise-conv
value residual. Padded patches are masked out of landmarks and attention and
zeroed before the PPEG convolutions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.models.layers import NEG_INF

TRANSMIL_SIZES = {"small": 1024, "big": 1024, "benchmark": 384, "conch": 512,
                  "gigapath": 1536, "virchow": 2560}


def _iter_pinv(mat: jax.Array, iters: int = 6) -> jax.Array:
    """Moore-Penrose pseudo-inverse by Newton-Schulz-style iteration
    (the ``pinv_iterations=6`` recommendation the reference uses).

    Reverse-mode differentiates through the unrolled iteration — the same
    gradient the reference's autograd computes. (A ``jax.custom_vjp`` using
    the implicit inverse rule ``dZ = -Z dA Z`` was measured during round 3:
    it saves only ~25% of the ``scan(grad)`` compile once the depthwise
    convs are shifted-add — 10.9 s vs 14.5 s — while deviating up to 80%
    from the unrolled gradient on the near-singular landmark kernels the
    6-step iteration leaves unconverged, so it was rejected. The compile
    pathology was the grouped-conv VJPs, not this loop; see the residual
    conv / PPEG notes.)"""
    abs_m = jnp.abs(mat)
    z = mat.swapaxes(-1, -2) / (
        jnp.max(jnp.sum(abs_m, axis=-1), axis=-1, keepdims=True)[..., None]
        * jnp.max(jnp.sum(abs_m, axis=-2), axis=-1, keepdims=True)[..., None]
        + 1e-9
    )
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)

    def body(_, z):
        mz = mat @ z
        return 0.25 * z @ (13 * eye - mz @ (15 * eye - mz @ (7 * eye - mz)))

    return jax.lax.fori_loop(0, iters, body, z)


class NystromAttention(nn.Module):
    """Masked Nystrom self-attention over ``[N, dim]`` with ``[N]`` validity."""

    dim: int
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_kernel: int = 33
    conv_impl: str = "conv"  # "conv" (fast forward) | "slices" (fast grad compile)
    dropout: float = 0.0  # ref TransLayer builds NystromAttention(dropout=0.1)

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        n_orig, d = x.shape
        h = self.heads
        dh = d // h
        m = min(self.num_landmarks, n_orig)
        # front-pad to a landmark multiple (the reference package pads the
        # same way); padded rows are invalid and masked out everywhere
        pad = (-n_orig) % m
        if pad:
            x = jnp.concatenate([jnp.zeros((pad, d), x.dtype), x], axis=0)
            valid = jnp.concatenate([jnp.zeros((pad,), bool), valid])
        n = n_orig + pad
        group = n // m

        qkv = nn.Dense(3 * d, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(n, h, dh).transpose(1, 0, 2)  # [h, n, dh]

        q, k, v = heads_first(q) * (dh ** -0.5), heads_first(k), heads_first(v)
        vmask = valid.astype(q.dtype)
        q = q * vmask[None, :, None]
        k = k * vmask[None, :, None]
        v = v * vmask[None, :, None]

        # masked landmark means over contiguous groups
        grp_mask = vmask.reshape(m, group)  # [m, group]
        grp_count = jnp.maximum(jnp.sum(grp_mask, axis=1), 1.0)  # [m]
        q_l = jnp.sum(q.reshape(h, m, group, dh), axis=2) / grp_count[None, :, None]
        k_l = jnp.sum(k.reshape(h, m, group, dh), axis=2) / grp_count[None, :, None]
        lm_valid = jnp.sum(grp_mask, axis=1) > 0  # [m]

        def msoftmax(sim, key_valid):
            return jax.nn.softmax(jnp.where(key_valid[None, None, :], sim, NEG_INF), axis=-1)

        sim1 = jnp.einsum("hnd,hmd->hnm", q, k_l)
        sim2 = jnp.einsum("hmd,hld->hml", q_l, k_l)
        sim3 = jnp.einsum("hmd,hnd->hmn", q_l, k)
        attn1 = msoftmax(sim1, lm_valid)
        attn2 = msoftmax(sim2, lm_valid)
        attn3 = msoftmax(sim3, valid)
        # right-associate: z is [m, dh]-small, so attn1 @ (pinv @ (attn3@v))
        # does O(n·m·dh) work — the left-associated form pays an extra
        # O(n·m²) product ([16k,256]@[256,256] per head)
        z = _iter_pinv(attn2, self.pinv_iterations) @ (attn3 @ v)
        out = attn1 @ z  # [h, n, dh]

        if self.residual:
            # depthwise conv along the sequence, one filter per head shared
            # across dh (ref nystrom_attention residual conv, kernel 33), run
            # at 512 channels (the 8-channel form wasted 94% of each vector
            # register). Two mathematically identical implementations:
            # "conv" — feature_group_count=512 grouped conv, the fast
            #          FORWARD (the shifted-add form measured 95 vs 54
            #          ms/batch-8 whole-model inference, BENCH_NOTES r3);
            # "slices" — K shifted-slice multiply-adds whose flat elementwise
            #          VJP keeps ``vmap(scan(grad))`` compile linear — the
            #          grouped-conv VJP was the fused-trainer compile
            #          pathology (~105 s per scan nesting level).
            kern = self.param("res_conv", nn.initializers.lecun_normal(),
                              (self.residual_kernel, 1, h))
            kern_full = jnp.repeat(kern[:, 0, :], dh, axis=1)  # [K, h*dh]
            vt = v.transpose(1, 0, 2).reshape(n, h * dh)  # ch = head*dh+j
            half = self.residual_kernel // 2
            if self.conv_impl == "conv":
                conv = jax.lax.conv_general_dilated(
                    vt[None], kern_full[:, None, :], (1,),
                    [(half, self.residual_kernel - 1 - half)],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    feature_group_count=h * dh,
                )[0]
            else:
                vp = jnp.pad(vt, ((half, self.residual_kernel - 1 - half), (0, 0)))
                conv = jnp.zeros_like(vt)
                for kk in range(self.residual_kernel):
                    conv = conv + vp[kk : kk + n] * kern_full[kk][None, :]
            out = out + conv.reshape(n, h, dh).transpose(1, 0, 2)

        out = out.transpose(1, 0, 2).reshape(n, d)[n - n_orig :]
        out = nn.Dense(d, name="to_out")(out)
        if self.dropout > 0.0:
            # ref nystrom_attention: to_out = Sequential(Linear, Dropout)
            out = nn.Dropout(self.dropout)(out, deterministic=not train)
        return out


class TransLayer(nn.Module):
    dim: int = 512
    conv_impl: str = "conv"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        normed = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x + NystromAttention(self.dim, num_landmarks=self.dim // 2,
                                    conv_impl=self.conv_impl,
                                    dropout=self.dropout,
                                    name="attn")(normed, valid, train)


class _DepthwiseParams(nn.Module):
    """Parameter container matching ``nn.Conv``'s depthwise layout
    ({kernel [k,k,1,dim], bias [dim]}) so PPEG's param tree keeps the
    nested proj/proj1/proj2 structure of saved checkpoints and the torch
    ``pos_layer.proj*.weight`` mirror, while the three convs execute as
    one folded kernel."""

    ksize: int
    dim: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.ksize, self.ksize, 1, self.dim))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return k, b


class PPEG(nn.Module):
    """Pyramid positional encoding: 7/5/3 depthwise convs over the token grid
    (ref ``model_mil.py:228-241``)."""

    dim: int = 512
    conv_impl: str = "conv"

    @nn.compact
    def __call__(self, x, grid_h: int, grid_w: int, valid):
        cls, toks = x[:1], x[1:]
        toks = toks * valid[1:, None]  # zero pads so convs don't leak them
        img = toks.reshape(grid_h, grid_w, self.dim)[None]  # [1, H, W, C]
        # all three depthwise convs read the SAME input and sum, so they fold
        # into one 7×7 depthwise conv whose kernel is the sum of the
        # zero-padded 7/5/3 kernels (+δ for the identity term) — exact, one
        # pass instead of three.
        kernels, biases = [], []
        for ksize, name in ((7, "proj"), (5, "proj1"), (3, "proj2")):
            k, b = _DepthwiseParams(ksize, self.dim, name=name)()
            p = (7 - ksize) // 2
            kernels.append(jnp.pad(k, ((p, p), (p, p), (0, 0), (0, 0))))
            biases.append(b)
        combined = kernels[0] + kernels[1] + kernels[2]
        combined = combined.at[3, 3, 0, :].add(1.0)  # the identity residual
        if self.conv_impl == "conv":  # fast forward (see NystromAttention)
            acc = jax.lax.conv_general_dilated(
                img, combined, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.dim,
            )[0]
        else:
            # 7x7 depthwise conv as 49 shifted-slice multiply-adds (SAME pad
            # 3): identical values, but the flat elementwise graph avoids the
            # grouped-conv VJP that made scan(grad(TransMIL)) pathologically
            # slow to compile (see NystromAttention residual note)
            pad3 = jnp.pad(img[0], ((3, 3), (3, 3), (0, 0)))
            acc = jnp.zeros((grid_h, grid_w, self.dim), img.dtype)
            for dy in range(7):
                for dx in range(7):
                    acc = acc + (pad3[dy : dy + grid_h, dx : dx + grid_w]
                                 * combined[dy, dx, 0][None, None, :])
        out = acc + (biases[0] + biases[1] + biases[2])
        return jnp.concatenate([cls, out.reshape(-1, self.dim)], axis=0)


@dataclasses.dataclass(frozen=True)
class TransMILConfig:
    n_classes: int = 2
    size_arg: str = "conch"
    dim: int = 512
    # "conv": grouped depthwise convs — the fast forward, used for
    # inference/streaming training. "slices": shifted-add formulation with a
    # flat elementwise VJP — what the fused fold trainer compiles inside
    # vmap(scan(grad)) (identical values; equality tested).
    conv_impl: str = "conv"
    # the reference hardcodes NystromAttention(dropout=0.1) in both
    # TransLayers (model_mil.py:110-117); active only when the caller
    # passes train=True with a "dropout" rng
    attn_dropout: float = 0.1


class TransMIL(nn.Module):
    cfg: TransMILConfig = TransMILConfig()

    @nn.compact
    def __call__(self, feats, valid, *, train: bool = False):
        """Padded slide ``feats [N, D]`` (+ ``valid [N]``) → ``logits [C]``.

        N must make ``ceil(sqrt(N))²`` landmark-divisible; bucketed pads
        (powers of two ≥ 256) satisfy this.

        DESIGN NOTE (static-shape deviation): the PPEG square grid and
        wrap count derive from the PADDED length — the reference computes
        them from the real patch count, but a data-dependent ``side`` is a
        dynamic shape XLA cannot compile. Pad CONTENT never leaks (the
        attention and convs are masked, wrap rows copy the leading REAL
        rows), but two pad buckets give the same slide different conv
        neighborhoods; within one bucket results are deterministic. This
        is the price of a single compiled executable per bucket — the
        torch-oracle parity tests feed both frameworks the same length,
        where the formulations agree."""
        cfg = self.cfg
        n = feats.shape[0]
        h = nn.relu(nn.Dense(cfg.dim, name="fc1")(feats))

        # square grid by wrap-padding (ref lines 224-227), validity wraps too
        import math

        side = math.isqrt(n)
        if side * side < n:
            side += 1
        extra = side * side - n
        if extra:
            h = jnp.concatenate([h, h[:extra]], axis=0)
            valid_sq = jnp.concatenate([valid, valid[:extra]])
        else:
            valid_sq = valid

        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, cfg.dim))
        x = jnp.concatenate([cls, h], axis=0)
        full_valid = jnp.concatenate([jnp.ones((1,), bool), valid_sq])

        x = TransLayer(cfg.dim, cfg.conv_impl, cfg.attn_dropout,
                       name="layer1")(x, full_valid, train)
        x = PPEG(cfg.dim, cfg.conv_impl, name="pos_layer")(x, side, side, full_valid)
        x = TransLayer(cfg.dim, cfg.conv_impl, cfg.attn_dropout,
                       name="layer2")(x, full_valid, train)
        pooled = nn.LayerNorm(epsilon=1e-5, name="norm")(x)[0]
        head = nn.Dense(cfg.n_classes, name="fc2")
        # patch-level logits skip the final norm and drop cls/wrap rows
        # (ref ``forward_patch_level``, model_mil.py:172-226)
        return {"logits": head(pooled), "patch_logits": head(x[1 : 1 + n])}
