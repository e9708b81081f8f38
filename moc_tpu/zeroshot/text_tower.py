"""CONCH text tower in flax: 12-layer transformer with an appended CLS slot.

Behavioral reference ``/root/reference/models/conch/open_clip_custom/
transformer.py:325-449`` (config: context 128, vocab 32007, width 768,
12 heads / 12 layers, ``embed_cls=True``, pad_id 0). Faithfully reproduces
the open_clip quirks a pretrained checkpoint depends on:

  * input is 127 token ids; a learned ``cls_emb`` is appended as position 127;
  * the attention mask is causal(128) PLUS a cls/pad mask whose non-pad
    window is **shifted right by one column** (the reference pads a True
    column on the left before combining — ``build_cls_mask``,
    ``transformer.py:404-411``); we reproduce the shift exactly;
  * pooled output = ``ln_final`` of the **last** (cls) position, projected by
    ``text_projection`` to the 512-d contrastive space.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.nn.transformer import LayerNorm, Transformer


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 128  # includes the appended CLS slot
    vocab_size: int = 32007
    width: int = 768
    heads: int = 12
    layers: int = 12
    output_dim: int = 512
    pad_id: int = 0


class TextTower(nn.Module):
    cfg: TextConfig = TextConfig()

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """token_ids ``[B, 127]`` → pooled text embedding ``[B, output_dim]``.

        (The caller drops the final placeholder pad of the 128-token protocol,
        mirroring ``coca_model.py:212-216``.)
        """
        cfg = self.cfg
        b, seq = token_ids.shape
        full = seq + 1  # + cls slot

        tok_emb = nn.Embed(cfg.vocab_size, cfg.width, name="token_embedding")(token_ids)
        cls_emb = self.param("cls_emb", nn.initializers.normal(0.01), (cfg.width,))
        x = jnp.concatenate(
            [tok_emb, jnp.broadcast_to(cls_emb, (b, 1, cfg.width))], axis=1
        )
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width))
        x = x + pos[:full]

        causal = jnp.triu(jnp.full((full, full), -jnp.inf), k=1)
        # cls/pad additive mask with the reference's one-column shift:
        # column 0 always attendable; column j (j>=1) attendable iff
        # token_ids[:, j-1] != pad.  (transformer.py:404-411)
        nonpad = token_ids != cfg.pad_id  # [B, seq]
        col_ok = jnp.concatenate(
            [jnp.ones((b, 1), bool), nonpad], axis=1
        )  # [B, full]
        cls_mask = jnp.where(col_ok[:, None, :], 0.0, -jnp.inf)  # [B, 1, full]
        # reference applies the pad window to EVERY query row is not the case:
        # rows 0..full-2 are all-True (padded with 1.0), only the final (cls)
        # row carries the pad restriction.
        row_is_cls = jnp.arange(full) == full - 1
        cls_mask = jnp.where(row_is_cls[None, :, None], cls_mask, 0.0)  # [B, full, full]
        mask = causal[None, None] + cls_mask[:, None]  # [B, 1, full, full]

        x = Transformer(cfg.width, cfg.layers, cfg.heads, name="transformer")(x, mask)
        pooled = LayerNorm(name="ln_final")(x[:, -1])
        proj = self.param("text_projection", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.output_dim))
        return pooled @ proj
