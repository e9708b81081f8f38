"""Typed run configuration: dataset presets replace hard-coded source edits.

The reference's configuration mechanism is editing source lines — checkpoint
path at ``main_moc.py:135``, data dirs at 205/266, prompt files at 139 and
163-165/230-232 (the README documents this, ``README.md:18,36``). Here every
per-dataset constant lives in a ``DatasetPreset`` resolved against a
``--data_root``, and a run is a ``MocRunConfig`` built from CLI flags.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Mapping

# Vendored data assets (prompt banks, dataset CSVs, few-shot splits) — see
# ``moc_tpu/assets/ATTRIBUTION.md``. Dataset presets fall back to these when
# the ``--data_root`` copy is absent, so a fresh clone plus a checkpoint path
# is a runnable real command.
ASSETS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")
DEFAULT_PROMPT_ROOT = os.path.join(ASSETS_DIR, "prompts")


def _with_vendored_fallback(primary: str, vendored: str) -> str:
    return primary if os.path.exists(primary) else (
        vendored if os.path.exists(vendored) else primary
    )


@dataclasses.dataclass(frozen=True)
class DatasetPreset:
    """Everything ``main_moc.py:161-287`` hard-codes per dataset."""

    name: str
    csv_name: str
    feature_dir: str  # under data_root
    label_dict: Mapping[str, int]
    label_dict_ext: Mapping[str, int]
    prompt_file: str  # under prompt_root
    prompt_file_ext: str
    splits_subdir: str  # e.g. "nsclc_fewshot"
    n_classes: int

    @property
    def n_ext_classes(self) -> int:
        return len(set(self.label_dict_ext.values()))

    def repeat_num(self, shot: int) -> int:
        # ref: nsclc shot*2 (main_moc.py:220), rcc shot*3 (281) = shot*C
        return shot * self.n_classes

    def csv_path(self, data_root: str) -> str:
        return _with_vendored_fallback(
            os.path.join(data_root, "dataset_csv", self.csv_name),
            os.path.join(ASSETS_DIR, "dataset_csv", self.csv_name),
        )

    def data_dir(self, data_root: str) -> str:
        return os.path.join(data_root, self.feature_dir)

    def split_csv(self, data_root: str, shot: int, fold: int) -> str:
        rel = os.path.join(self.splits_subdir, f"{shot}shots", f"splits_{fold}.csv")
        return _with_vendored_fallback(
            os.path.join(data_root, "splits", rel),
            os.path.join(ASSETS_DIR, "splits", rel),
        )


NORMAL_TISSUE = {"Stroma", "Inflammation", "Vascular", "Necrosis"}

NSCLC = DatasetPreset(
    name="nsclc",
    csv_name="nsclc.csv",
    feature_dir="data/nsclc/merge_features_conch",
    label_dict={"LUAD": 0, "LUSC": 1},
    label_dict_ext={"LUAD": 0, "LUSC": 1, "Stroma": 2, "Inflammation": 3,
                    "Vascular": 4, "Necrosis": 5},
    prompt_file="nsclc_prompts_all_per_class_worse.json",
    prompt_file_ext="nsclc_prompts_w4normal.json",
    splits_subdir="nsclc_fewshot",
    n_classes=2,
)

RCC = DatasetPreset(
    name="rcc",
    csv_name="rcc.csv",
    feature_dir="data/rcc/merge_features_conch",
    label_dict={"KICH": 0, "KIRC": 1, "KIRP": 2},
    label_dict_ext={"KICH": 0, "KIRC": 1, "KIRP": 2, "Stroma": 3,
                    "Inflammation": 4, "Vascular": 5, "Necrosis": 6},
    prompt_file="rcc_prompts_all_per_class.json",
    prompt_file_ext="rcc_prompts_w4normal.json",
    splits_subdir="rcc_fewshot",
    n_classes=3,
)

_EBRAINS12_CLASSES = (
    "Adamantinomatous craniopharyngioma",
    "Anaplastic oligodendroglioma, IDH-mutant and 1p/19q codeleted",
    "Atypical meningioma",
    "Diffuse astrocytoma, IDH-mutant",
    "Ganglioglioma",
    "Glioblastoma, IDH-wildtype",
    "Haemangioblastoma",
    "Meningothelial meningioma",
    "Oligodendroglioma, IDH-mutant and 1p/19q codeleted",
    "Pilocytic astrocytoma",
    "Pituitary adenoma",
    "Schwannoma",
)

_EBRAINS30_CLASSES = (
    "Adamantinomatous craniopharyngioma",
    "Anaplastic astrocytoma, IDH-mutant",
    "Anaplastic astrocytoma, IDH-wildtype",
    "Anaplastic ependymoma",
    "Anaplastic meningioma",
    "Anaplastic oligodendroglioma, IDH-mutant and 1p/19q codeleted",
    "Angiomatous meningioma",
    "Atypical meningioma",
    "Diffuse astrocytoma, IDH-mutant",
    "Diffuse large B-cell lymphoma of the CNS",
    "Ependymoma",
    "Fibrous meningioma",
    "Ganglioglioma",
    "Glioblastoma, IDH-mutant",
    "Glioblastoma, IDH-wildtype",
    "Gliosarcoma",
    "Haemangioblastoma",
    "Haemangioma",
    "Haemangiopericytoma",
    "Langerhans cell histiocytosis",
    "Lipoma",
    "Medulloblastoma, non-WNT/non-SHH",
    "Meningothelial meningioma",
    "Metastatic tumours",
    "Oligodendroglioma, IDH-mutant and 1p/19q codeleted",
    "Pilocytic astrocytoma",
    "Pituitary adenoma",
    "Schwannoma",
    "Secretory meningioma",
    "Transitional meningioma",
)


def _ebrains_preset(name: str, classes: tuple[str, ...]) -> DatasetPreset:
    """EBRAINS 12/30-class brain-tumor presets (csvs ship with the reference,
    ``dataset_csv/ebrains{12,30}.csv``; prompts follow the same JSON schema —
    bank files supplied by the user alongside the feature dirs)."""
    label_dict = {c: i for i, c in enumerate(classes)}
    ext = dict(label_dict)
    for j, tissue in enumerate(sorted(NORMAL_TISSUE)):
        ext[tissue] = len(classes) + j
    return DatasetPreset(
        name=name,
        csv_name=f"{name}.csv",
        feature_dir=f"data/{name}/merge_features_conch",
        label_dict=label_dict,
        label_dict_ext=ext,
        # the reference ships these banks as {name}_prompts.json /
        # {name}_prompts_ext.json (vendored in moc_tpu/assets/prompts)
        prompt_file=f"{name}_prompts.json",
        prompt_file_ext=f"{name}_prompts_ext.json",
        splits_subdir=f"{name}_fewshot",
        n_classes=len(classes),
    )


EBRAINS12 = _ebrains_preset("ebrains12", _EBRAINS12_CLASSES)
EBRAINS30 = _ebrains_preset("ebrains30", _EBRAINS30_CLASSES)

PRESETS = {"nsclc": NSCLC, "rcc": RCC, "ebrains12": EBRAINS12,
           "ebrains30": EBRAINS30}

# CONCH logit-scale temperature (main_moc.py:175)
CONCH_TEMPERATURE = 56.3477


@dataclasses.dataclass(frozen=True)
class MocRunConfig:
    """One (dataset, fold, shot) MOC run — the reference CLI surface
    (``main_moc.py:29-47``) plus explicit paths."""

    dataset: str = "nsclc"
    fold: int = 0
    shot: int = 1
    topj: int = 400
    topk: int = 10
    result_dir: str = "results/moc_train"
    pretrain: str = "conch"
    discard_classifiers: tuple[str, ...] = ()
    load_weight: bool = True
    check_zeroshot: bool = True
    ablation_study: str = "none"  # none | avg | sum | max
    num_epochs: int = 25
    seed: int = 0
    # environment paths (the hard-coded lines, made explicit)
    data_root: str = "data"
    prompt_root: str = DEFAULT_PROMPT_ROOT
    conch_checkpoint: str = "models/conch_checkpoint.bin"
    tokenizer_file: str | None = None
    weights_cache_dir: str = "models/classifier_weights"

    @property
    def preset(self) -> DatasetPreset:
        return PRESETS[self.dataset]
