"""A timm-style Vision Transformer trunk in flax.

Behavioral reference: the CONCH vision trunk — ``timm`` ``VisionTransformer``
with ``num_classes=0`` built at 448px/patch16
(``/root/reference/models/conch/open_clip_custom/coca_model.py:76-86``):
conv patchify, prepended cls token, learned absolute position embeddings,
pre-LN blocks, final LayerNorm; ``forward_features`` returns ALL tokens
``[B, 1+HW, D]``. Position embeddings resample bilinearly when the grid
changes (``coca_model.py:348-370``), handled in ``resample_pos_embed``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.nn.transformer import LayerNorm, Transformer


class VisionTransformer(nn.Module):
    image_size: int = 448
    patch_size: int = 16
    dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    remat: bool = False
    lora_rank: int = 0
    lora_last_n: int | None = None
    block_lora_rank: int = 0  # whole-block residual LoRA (ref Block_LoRA)
    lora_experts: int = 1  # >1 = mixture-of-LoRA-experts (working MOELoRA)
    attn_impl: str = "dense"  # "flash" = Pallas attention (extraction tiers)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @nn.compact
    def __call__(self, images):
        """images ``[B, H, W, 3]`` (NHWC) → tokens ``[B, 1+HW/p², D]``."""
        b = images.shape[0]
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(images)
        x = x.reshape(b, -1, self.dim)  # [B, HW, D]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        n_tokens = self.grid * self.grid + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_tokens, self.dim))
        x = x + pos[:, : x.shape[1]]
        x = Transformer(self.dim, self.num_layers, self.num_heads,
                        self.mlp_ratio, remat=self.remat,
                        lora_rank=self.lora_rank, lora_last_n=self.lora_last_n,
                        block_lora_rank=self.block_lora_rank,
                        lora_experts=self.lora_experts,
                        attn_impl=self.attn_impl,
                        name="blocks")(x)
        return LayerNorm(name="norm")(x)


def resample_pos_embed(pos_embed: jnp.ndarray, new_grid: int,
                       num_prefix: int = 1,
                       method: str = "bilinear") -> jnp.ndarray:
    """Pos-embed resampling between image sizes — bilinear for CONCH/timm
    (``coca_model.py:348-370``: ``resample_abs_pos_embed`` with
    ``align_corners=False``), bicubic for MUSK/BEiT3
    (``musk/utils.py:193-235``). Prefix (cls/dist) rows pass through."""
    prefix, grid_part = pos_embed[:, :num_prefix], pos_embed[:, num_prefix:]
    old_grid = int(round(grid_part.shape[1] ** 0.5))
    d = grid_part.shape[-1]
    grid_part = grid_part.reshape(1, old_grid, old_grid, d)
    # antialias=False: timm's resample_abs_pos_embed interpolates WITHOUT
    # an antialiasing prefilter even when downsampling (F.interpolate
    # default) — jax's default antialias=True would widen the kernel on
    # any downsample and diverge from checkpoint-parity
    grid_part = jax.image.resize(grid_part, (1, new_grid, new_grid, d),
                                 method, antialias=False)
    return jnp.concatenate([prefix, grid_part.reshape(1, new_grid * new_grid, d)], axis=1)
