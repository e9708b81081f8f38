"""CONCH vision tower in flax: ViT trunk + attentional pooling heads.

Behavioral reference ``/root/reference/models/conch/open_clip_custom/
vision_tower.py:13-152`` with the conch_ViT-B-16 config: 448px/patch16 ViT-B
trunk returning all tokens; a 1-query attentional pooler + LayerNorm +
learned projection for the 512-d contrastive embedding; a 256-query pooler +
LayerNorm for the 768-d caption tokens; ``forward_project`` maps patch tokens
into the contrastive space for MI-Zero style patch scoring.
"""

from __future__ import annotations

import dataclasses

from flax import linen as nn

from moc_tpu.nn.transformer import AttentionalPooler, LayerNorm
from moc_tpu.nn.vit import VisionTransformer


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 448
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim_contrast: int = 512
    embed_dim_caption: int = 768
    pooler_heads: int = 8
    n_queries_caption: int = 256
    # "flash" = Pallas attention in the trunk. Memory knob only: dense
    # materializes [B, H, 785, 785] scores per layer at 448px (1.9 GB f32
    # at batch 64) but measured FASTER than flash at this length on v5
    # lite (flash 0.77x f32 / 0.81x bf16 — BENCH_NOTES r3 session 7)
    attn_impl: str = "dense"


class VisionTower(nn.Module):
    cfg: VisionConfig = VisionConfig()

    def setup(self):
        c = self.cfg
        self.trunk = VisionTransformer(
            image_size=c.image_size, patch_size=c.patch_size, dim=c.width,
            num_layers=c.layers, num_heads=c.heads, attn_impl=c.attn_impl,
            name="trunk",
        )
        self.attn_pool_contrast = AttentionalPooler(
            dim=c.embed_dim_contrast, context_dim=c.width,
            num_heads=c.pooler_heads, n_queries=1, name="attn_pool_contrast",
        )
        self.ln_contrast = LayerNorm(name="ln_contrast")
        self.proj_contrast = self.param(
            "proj_contrast",
            nn.initializers.normal(c.width ** -0.5),
            (c.embed_dim_contrast, c.embed_dim_contrast),
        )
        self.attn_pool_caption = AttentionalPooler(
            dim=c.embed_dim_caption, context_dim=c.width,
            num_heads=c.pooler_heads, n_queries=c.n_queries_caption,
            name="attn_pool_caption",
        )
        self.ln_caption = LayerNorm(name="ln_caption")

    def __call__(self, images):
        """images ``[B, H, W, 3]`` → (contrast ``[B, 512]``, caption tokens)."""
        tokens = self.trunk(images)
        pooled = self.attn_pool_contrast(tokens)[:, 0]
        pooled = self.ln_contrast(pooled) @ self.proj_contrast
        caption = self.ln_caption(self.attn_pool_caption(tokens))
        return pooled, caption

    def forward_no_head(self, images):
        """Pooled embedding before the contrastive projection
        (ref ``forward_no_head``, ``vision_tower.py:120-129``)."""
        tokens = self.trunk(images)
        pooled = self.attn_pool_contrast(tokens)[:, 0]
        return self.ln_contrast(pooled)

    def forward_project(self, x):
        """Project arbitrary features into the contrastive space
        (MI-Zero patch path, ``vision_tower.py:105-111``)."""
        return x @ self.proj_contrast
