"""ResNet-50 feature trunk (CLAM-legacy patch encoder) + plain ViT factories.

Behavioral reference ``/root/reference/models/resnet_custom.py`` (ImageNet
ResNet-50 truncated after block 3 with adaptive average pooling → 1024-d
patch features — the CLAM-era encoder) and ``models/vit_mil.py`` (plain
timm ViT-S/ViT-L factories for Lunit-DINO / UNI / DeCUR backbones, loaded
from user checkpoints).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from moc_tpu.nn.vit import VisionTransformer


class BottleneckBlock(nn.Module):
    """1x1 → 3x3 → 1x1 bottleneck with projection shortcut when needed."""

    features: int  # inner width; output is 4x
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, name=name)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        # explicit (1, 1) padding, NOT "SAME": for the strided blocks SAME
        # pads (0, 1) while torch pads (1, 1) — converted torchvision
        # weights would see shifted windows in stages 2-3
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Sequence[int] = (3, 4, 6)  # blocks 1-3 only (ref truncation)
    widths: Sequence[int] = (64, 128, 256)


class ResNet50Trunk(nn.Module):
    """ResNet-50 up to block 3 + global average pool → ``[B, 1024]``
    (ref ``resnet50_baseline``)."""

    cfg: ResNetConfig = ResNetConfig()

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(images)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (n_blocks, width) in enumerate(
            zip(self.cfg.stage_sizes, self.cfg.widths)
        ):
            for block in range(n_blocks):
                strides = 2 if (block == 0 and stage > 0) else 1
                x = BottleneckBlock(width, strides,
                                    name=f"layer{stage + 1}_{block}")(x, train)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool → [B, 1024]


def vit_small(image_size: int = 224, **kw) -> VisionTransformer:
    """ViT-S/16 (Lunit-DINO class backbone, ref ``vit_mil.vit_small``)."""
    return VisionTransformer(image_size=image_size, patch_size=16, dim=384,
                             num_layers=12, num_heads=6, **kw)


def vit_large(image_size: int = 224, patch_size: int = 16, **kw) -> VisionTransformer:
    """ViT-L/16 (UNI / DeCUR class backbone, ref ``vit_mil.vit_large``)."""
    return VisionTransformer(image_size=image_size, patch_size=patch_size,
                             dim=1024, num_layers=24, num_heads=16, **kw)
