"""TITAN-style coordinate-aware slide encoder + linear probe head.

Behavioral reference ``/root/reference/models/model_titan.py:17-59``: the
reference wraps the proprietary HF ``MahmoodLab/TITAN`` slide encoder
(``trust_remote_code``) — patch features + patch coords → one slide
embedding — and trains a linear head on top. That remote code cannot be
vendored; this module provides the equivalent capability natively: patch
coordinates are normalized to a grid, embedded with learned 2D positional
MLPs, and a small transformer with a CLS token pools the bag into a slide
embedding consumed by the linear classifier. The API matches the reference
head: ``(feats, coords, valid) -> logits``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.nn.transformer import LayerNorm, Transformer


@dataclasses.dataclass(frozen=True)
class TitanConfig:
    n_classes: int = 2
    in_dim: int = 512  # CONCH v1.5 patch features in the reference
    dim: int = 512
    num_layers: int = 4
    num_heads: int = 8
    patch_spacing: float = 512.0  # coord units per patch step (ref target_patch_size)


class TitanHead(nn.Module):
    cfg: TitanConfig = TitanConfig()

    @nn.compact
    def __call__(self, feats, coords, valid, *, train: bool = False):
        """``feats [N, D]``, ``coords [N, 2]`` (slide pixel coords), ``valid
        [N]`` → ``{"logits": [C], "slide_embedding": [dim]}``."""
        cfg = self.cfg
        n = feats.shape[0]
        x = nn.Dense(cfg.dim, name="proj")(feats)

        # grid-normalized coordinates → sinusoid features → learned embedding
        grid = coords.astype(jnp.float32) / cfg.patch_spacing  # [N, 2]
        grid = grid - jnp.min(jnp.where(valid[:, None], grid, jnp.inf), axis=0)
        freqs = 2.0 ** jnp.arange(8)
        ang = grid[:, :, None] * freqs[None, None, :] * (2 * jnp.pi / 256.0)
        pos_feats = jnp.concatenate(
            [jnp.sin(ang), jnp.cos(ang)], axis=-1
        ).reshape(n, -1)  # [N, 32]
        x = x + nn.Dense(cfg.dim, name="pos_embed")(pos_feats)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, cfg.dim))
        x = jnp.concatenate([cls, x], axis=0)
        token_valid = jnp.concatenate([jnp.ones((1,), bool), valid])
        # additive key mask: pads unattendable
        mask = jnp.where(token_valid[None, None, None, :], 0.0, -jnp.inf)
        x = Transformer(cfg.dim, cfg.num_layers, cfg.num_heads,
                        name="encoder")(x[None], mask)[0]
        slide_emb = LayerNorm(name="norm")(x[0])
        logits = nn.Dense(cfg.n_classes, name="head")(slide_emb)
        return {"logits": logits, "slide_embedding": slide_emb}
