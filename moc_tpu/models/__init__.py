"""moc_tpu.models — flax model zoo (MOC fusion net + MIL baselines + towers).

Rebuild of the reference model layer (SURVEY.md §2.4): the MOC ``senet``
fusion MLP, the MIL baseline heads (CLAM, ABMIL, MIL-fc, TransMIL, ViLa-MIL,
CHIEF, TITAN-style), and adapter/LoRA machinery. All modules are flax.linen,
consume padded bags with validity masks, and are vmap/pjit-friendly.
"""

from moc_tpu.models.senet import SENet
from moc_tpu.models.layers import (
    AttnNet,
    GatedAttnNet,
    StackedDense,
    masked_attention_weights,
    masked_topk_feats,
)
from moc_tpu.models.clam import CLAM, ClamConfig, abmil, clam_mb, clam_sb
from moc_tpu.models.convert_mil import (
    clean_torch_state_dict,
    convert_clam_checkpoint,
    load_torch_mil_checkpoint,
)
from moc_tpu.models.convert_resnet import convert_resnet50, load_resnet50
from moc_tpu.models.mil import MILFc, MILFcMC, MilFcConfig
from moc_tpu.models.transmil import NystromAttention, TransMIL, TransMILConfig
from moc_tpu.models.chief import CHIEF, ChiefConfig
from moc_tpu.models.vila import (
    PromptConstants,
    ViLaMIL,
    ViLaTextEncoder,
    VilaConfig,
    build_prompt_constants,
    load_vila_prompts,
)
from moc_tpu.models.titan import (TitanConfig, TitanEncoderUnavailable,
                                  TitanHead, convert_titan_probe,
                                  load_titan_probe_checkpoint)
from moc_tpu.models.adapters import (
    AMUAdapter,
    AdapterConfig,
    ClipAdapter,
    MoEClipAdapter,
    TipAdapter,
    fewshot_aux_features,
    gt_mask_keep,
    linear_adapter_init,
    load_balancing_loss,
    uncertainty,
    zero_shot_pooled,
)
from moc_tpu.models.lora import count_trainable, lora_mask, lora_optimizer, merge_lora
from moc_tpu.models.musk import (
    BEiT3,
    MUSK,
    MuskConfig,
    multiscale_image_features,
    split_chessboard,
)

__all__ = [
    "PromptConstants",
    "ViLaMIL",
    "ViLaTextEncoder",
    "VilaConfig",
    "build_prompt_constants",
    "load_vila_prompts",
    "TitanConfig",
    "TitanHead",
    "TitanEncoderUnavailable",
    "convert_titan_probe",
    "load_titan_probe_checkpoint",
    "AMUAdapter",
    "AdapterConfig",
    "ClipAdapter",
    "MoEClipAdapter",
    "TipAdapter",
    "fewshot_aux_features",
    "gt_mask_keep",
    "linear_adapter_init",
    "load_balancing_loss",
    "uncertainty",
    "zero_shot_pooled",
    "count_trainable",
    "lora_mask",
    "lora_optimizer",
    "merge_lora",
    "BEiT3",
    "MUSK",
    "MuskConfig",
    "multiscale_image_features",
    "split_chessboard",
    "SENet",
    "AttnNet",
    "GatedAttnNet",
    "StackedDense",
    "masked_attention_weights",
    "masked_topk_feats",
    "CLAM",
    "clean_torch_state_dict",
    "convert_clam_checkpoint",
    "convert_resnet50",
    "load_resnet50",
    "load_torch_mil_checkpoint",
    "ClamConfig",
    "abmil",
    "clam_mb",
    "clam_sb",
    "MILFc",
    "MILFcMC",
    "MilFcConfig",
    "NystromAttention",
    "TransMIL",
    "TransMILConfig",
    "CHIEF",
    "ChiefConfig",
]
