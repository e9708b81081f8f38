"""moc_tpu.zeroshot — prompt banks → classifier weight matrices (CONCH path).

Rebuild of the reference zero-shot layer (SURVEY.md L3-L4): a flax
re-implementation of the CONCH CoCa vision-language model (text tower with the
cls-token/causal-mask quirks, ViT trunk + attentional poolers), a
torch-checkpoint converter, the 127+1 tokenizer protocol, prompt-bank JSON
loading, and the classifier-weight builder with on-disk caching
(``/root/reference/utils/zeroshot_utils.py:20-51``,
``main_moc.py:139-287``).
"""

from moc_tpu.zeroshot.prompts import PromptBank, load_prompt_bank
from moc_tpu.zeroshot.text_tower import TextTower, TextConfig
from moc_tpu.zeroshot.vision_tower import VisionTower, VisionConfig
from moc_tpu.zeroshot.coca import CoCa, CoCaConfig, CONCH_VITB16
from moc_tpu.zeroshot.tokenizer import ConchTokenizer
from moc_tpu.zeroshot.musk_tokenizer import MuskTokenizer
from moc_tpu.zeroshot.classifier import (
    build_zero_shot_classifier,
    cached_zero_shot_classifier,
)
from moc_tpu.zeroshot.convert import convert_conch_checkpoint, load_conch
from moc_tpu.zeroshot.eval import (
    classification_metrics,
    multi_topj_pooling,
    run_mizero,
    run_zeroshot,
    run_zeroshot_tiles,
)

__all__ = [
    "PromptBank",
    "load_prompt_bank",
    "TextTower",
    "TextConfig",
    "VisionTower",
    "VisionConfig",
    "CoCa",
    "CoCaConfig",
    "CONCH_VITB16",
    "ConchTokenizer",
    "MuskTokenizer",
    "build_zero_shot_classifier",
    "cached_zero_shot_classifier",
    "convert_conch_checkpoint",
    "load_conch",
    "classification_metrics",
    "multi_topj_pooling",
    "run_mizero",
    "run_zeroshot",
    "run_zeroshot_tiles",
]
