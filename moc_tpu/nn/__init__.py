"""moc_tpu.nn — shared flax transformer primitives.

The building blocks used by the CONCH-equivalent vision-language towers
(``moc_tpu.zeroshot``), the MIL heads (``moc_tpu.models``) and the
MUSK-equivalent encoder stack (``moc_tpu.parallel``): attention with additive
masks, pre-LN residual blocks, attentional poolers, and a timm-style ViT
trunk. Parameter layouts intentionally mirror the torch originals
(fused qkv in_proj, [out,in] kernels transposed on load) so checkpoint
conversion (``moc_tpu.zeroshot.convert``) is a pure re-layout.
"""

from moc_tpu.nn.transformer import (
    Attention,
    CrossAttention,
    AttentionalPooler,
    LayerNorm,
    MlpBlock,
    ResidualAttentionBlock,
    Transformer,
    gelu_exact,
)
from moc_tpu.nn.vit import VisionTransformer, resample_pos_embed
from moc_tpu.nn.encoder import (
    Encoder,
    EncoderConfig,
    EncoderLayer,
    MultiwayDense,
    MultiwayLayerNorm,
    RMSNorm,
    RelativePositionBias,
    SelfAttention,
    drop_path,
    xpos_rotary,
)
from moc_tpu.nn.encoder_decoder import EncoderDecoder, EncoderDecoderConfig
from moc_tpu.nn.decoder import (
    Decoder,
    DecoderConfig,
    DecoderLayer,
    greedy_generate,
    sample_generate,
)
from moc_tpu.nn.resnet import ResNet50Trunk, vit_large, vit_small
from moc_tpu.nn.retnet import (
    GLU,
    MultiScaleRetention,
    RetNetBlock,
    RetNetConfig,
    RetNetDecoder,
)

__all__ = [
    "Attention",
    "CrossAttention",
    "AttentionalPooler",
    "LayerNorm",
    "MlpBlock",
    "ResidualAttentionBlock",
    "Transformer",
    "VisionTransformer",
    "gelu_exact",
    "resample_pos_embed",
    "Encoder",
    "EncoderConfig",
    "EncoderLayer",
    "MultiwayDense",
    "MultiwayLayerNorm",
    "RelativePositionBias",
    "RMSNorm",
    "SelfAttention",
    "drop_path",
    "xpos_rotary",
    "EncoderDecoder",
    "EncoderDecoderConfig",
    "GLU",
    "MultiScaleRetention",
    "RetNetBlock",
    "RetNetConfig",
    "RetNetDecoder",
    "Decoder",
    "DecoderConfig",
    "DecoderLayer",
    "greedy_generate",
    "sample_generate",
    "ResNet50Trunk",
    "vit_large",
    "vit_small",
]
