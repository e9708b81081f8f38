"""Vendored data assets: every bank/CSV/split parses and covers the presets.

The reference's runnable setup depends on 20 curated prompt JSONs, the ViLa
two-scale sentence CSVs, the dataset slide tables, and 100 few-shot split
files (``/root/reference/models/prompts``, ``dataset_csv``, ``splits``).
These are vendored under ``moc_tpu/assets`` (see ATTRIBUTION.md); this module
proves a fresh clone parses all of them through the real loaders.
"""

import json
import os
from glob import glob

import pytest

from moc_tpu.config import ASSETS_DIR, DEFAULT_PROMPT_ROOT, PRESETS
from moc_tpu.data import SlideTable, read_split_csv
from moc_tpu.models.vila import load_vila_prompts
from moc_tpu.zeroshot import load_prompt_bank

PROMPT_JSONS = sorted(glob(os.path.join(DEFAULT_PROMPT_ROOT, "*.json")))
VILA_CSVS = sorted(glob(os.path.join(DEFAULT_PROMPT_ROOT, "vila_text_prompt", "*.csv")))
SPLIT_CSVS = sorted(glob(os.path.join(ASSETS_DIR, "splits", "*", "*", "splits_*.csv")))


def test_asset_inventory_complete():
    assert len(PROMPT_JSONS) == 20, PROMPT_JSONS
    assert len(VILA_CSVS) == 2  # the TCGA Lung/RCC two-scale sentence banks
    assert len(SPLIT_CSVS) == 100  # {nsclc,rcc} x 5 shots x 5 folds (+ variants)


@pytest.mark.parametrize("path", PROMPT_JSONS, ids=os.path.basename)
def test_every_prompt_bank_parses(path):
    """Each JSON follows the schema and loads through ``load_prompt_bank``
    with a label map derived from its own class listing."""
    with open(path) as f:
        raw = json.load(f)["0"]
    assert raw["templates"], path
    label_map = {name: i for i, name in enumerate(raw["classnames"])}
    bank = load_prompt_bank(path, label_map)
    assert bank.n_classes == len(label_map)
    assert all(bank.classnames), "every class needs at least one alias"
    texts = bank.texts_for_class(0)
    assert texts and all("CLASSNAME" not in t for group in texts for t in group)


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_banks_cover_label_dicts(name):
    """The preset's configured banks exist and cover its label dicts exactly
    — the wiring a real zero-shot weight build depends on
    (ref ``main_moc.py:139-147,163-165,230-232``)."""
    preset = PRESETS[name]
    bank = load_prompt_bank(
        os.path.join(DEFAULT_PROMPT_ROOT, preset.prompt_file), preset.label_dict)
    assert bank.labels == tuple(sorted(preset.label_dict, key=preset.label_dict.get))
    ext = load_prompt_bank(
        os.path.join(DEFAULT_PROMPT_ROOT, preset.prompt_file_ext), preset.label_dict_ext)
    assert ext.n_classes == preset.n_ext_classes


@pytest.mark.parametrize("path", VILA_CSVS, ids=os.path.basename)
def test_vila_prompt_csvs_parse(path):
    prompts = load_vila_prompts(path)
    assert prompts and all(isinstance(p, str) and p for p in prompts)
    # the two-scale banks alternate low/high-resolution sentences per class
    if "two_scale" in path:
        assert len(prompts) % 2 == 0


@pytest.mark.parametrize("name", ["nsclc", "rcc", "ebrains12", "ebrains30"])
def test_dataset_csvs_parse(name):
    preset = PRESETS[name]
    csv_path = preset.csv_path("/nonexistent_data_root")  # forces vendored fallback
    assert csv_path.startswith(ASSETS_DIR), csv_path
    table = SlideTable.from_csv(csv_path, preset.label_dict)
    assert len(table.slide_ids) > 500
    assert set(table.labels) <= set(preset.label_dict.values())


def test_every_split_file_parses():
    seen = 0
    for path in SPLIT_CSVS:
        split = read_split_csv(path)
        assert split.train and split.val and split.test, path
        seen += 1
    assert seen == 100


@pytest.mark.parametrize("name", ["nsclc", "rcc"])
def test_split_ids_exist_in_dataset_csv(name):
    """Split slide ids resolve against the vendored slide table (the pairing
    a real run needs)."""
    preset = PRESETS[name]
    table = SlideTable.from_csv(preset.csv_path("/nonexistent"), preset.label_dict)
    ids = set(table.slide_ids)
    split = read_split_csv(preset.split_csv("/nonexistent", 8, 0))
    missing = [s for s in split.train + split.val + split.test if s not in ids]
    assert not missing, missing[:5]
