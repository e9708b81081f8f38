"""Split files and seeded split generation (full + few-shot).

Rebuild of the reference's split machinery:
  * split CSV reading with string dtypes (``dataset_generic.py:258-266``),
  * column/boolean split writers (``dataset_generic.py:22-35``),
  * seeded stratified generators ``generate_split`` / ``generate_split_few``
    (``/root/reference/utils/utils.py:296-370``).

A ``Split`` holds slide-id lists; the consumer resolves them against a
``SlideTable``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import pandas as pd

from moc_tpu.data.table import SlideTable


@dataclasses.dataclass(frozen=True)
class Split:
    train: tuple[str, ...]
    val: tuple[str, ...]
    test: tuple[str, ...]

    def tables(self, table: SlideTable) -> tuple[SlideTable, SlideTable, SlideTable]:
        return (
            table.subset_by_slide_ids(self.train),
            table.subset_by_slide_ids(self.val),
            table.subset_by_slide_ids(self.test),
        )

    def check_disjoint(self) -> None:
        """Reference invariant ``dataset_generic.py:325-327``: no overlap."""
        tr, va, te = set(self.train), set(self.val), set(self.test)
        assert not (tr & va), "train/val overlap"
        assert not (tr & te), "train/test overlap"
        assert not (va & te), "val/test overlap"


def read_split_csv(path: str) -> Split:
    """Read either split style the reference emits:

    * column style — columns ``train``/``val``/``test`` of slide ids (ragged,
      NaN-padded);
    * boolean style — index of slide ids, boolean ``train``/``val``/``test``
      columns.
    """
    df = pd.read_csv(path, dtype=str)
    cols = set(df.columns)
    if {"train", "val", "test"} <= cols and df.get("train", pd.Series(dtype=str)).isin(
        ["True", "False", "TRUE", "FALSE", "true", "false"]
    ).all() and len(df) > 0:
        # boolean style: first column is the slide id index
        id_col = df.columns[0]
        ids = df[id_col].astype(str)
        out = {}
        for key in ("train", "val", "test"):
            mask = df[key].str.lower() == "true"
            out[key] = tuple(ids[mask].tolist())
        return Split(out["train"], out["val"], out["test"])
    parts = {}
    for key in ("train", "val", "test"):
        col = df[key] if key in df.columns else pd.Series(dtype=str)
        parts[key] = tuple(col.dropna().astype(str).tolist())
    return Split(parts["train"], parts["val"], parts["test"])


def write_split_csv(path: str, split: Split, boolean_style: bool = False) -> None:
    if boolean_style:
        rows, flags = [], []
        for key in ("train", "val", "test"):
            ids = getattr(split, key)
            rows.extend(ids)
            flags.extend([key] * len(ids))
        onehot = pd.DataFrame(
            {k: [f == k for f in flags] for k in ("train", "val", "test")}, index=rows
        )
        onehot.to_csv(path)
        return
    parts = [pd.Series(list(getattr(split, key)), name=key) for key in ("train", "val", "test")]
    pd.concat(parts, axis=1).to_csv(path, index=False)


def _stratified_pick(rng: np.random.Generator, pool: np.ndarray, count: int) -> np.ndarray:
    if count > len(pool):
        raise ValueError(f"cannot sample {count} from pool of {len(pool)}")
    return rng.choice(pool, size=count, replace=False)


def _generate(
    table: SlideTable,
    *,
    n_splits: int,
    val_num: Sequence[int],
    test_num: Sequence[int],
    seed: int,
    label_frac: float,
    shot: int | None,
    patient_strat: bool = False,
    patient_voting: str = "max",
) -> list[Split]:
    """With ``patient_strat``, sampling units are PATIENTS (voted labels);
    each sampled patient contributes all its slides to the split — the
    reference's patient-level stratification (``dataset_generic.py:170-196``).
    """
    ids = table.slide_ids
    if patient_strat:
        patients = table.patient_table(patient_voting)
        case_ids = patients["case_id"].to_numpy()
        unit_labels = patients["label"].to_numpy()
        case_col = table.frame["case_id"].to_numpy()

        def expand(unit_rows):
            cases = set(case_ids[i] for i in unit_rows)
            return [i for i, c in enumerate(case_col) if c in cases]
    else:
        unit_labels = table.labels

        def expand(unit_rows):
            return list(unit_rows)

    class_pools = [np.where(unit_labels == c)[0] for c in range(table.num_classes)]
    splits = []
    rng = np.random.default_rng(seed)
    for _ in range(n_splits):
        train_rows: list[int] = []
        val_rows: list[int] = []
        test_rows: list[int] = []
        for c in range(table.num_classes):
            pool = class_pools[c]
            val_ids = _stratified_pick(rng, pool, val_num[c])
            remaining = np.setdiff1d(pool, val_ids)
            test_ids = _stratified_pick(rng, remaining, test_num[c])
            remaining = np.setdiff1d(remaining, test_ids)
            if shot is not None:
                train_ids = _stratified_pick(rng, remaining, shot)
            elif label_frac >= 1.0:
                train_ids = remaining
            else:
                count = int(np.ceil(len(remaining) * label_frac))
                train_ids = remaining[:count]
            val_rows.extend(expand(val_ids.tolist()))
            test_rows.extend(expand(test_ids.tolist()))
            train_rows.extend(expand(np.asarray(train_ids).tolist()))
        splits.append(
            Split(
                tuple(ids[i] for i in train_rows),
                tuple(ids[i] for i in val_rows),
                tuple(ids[i] for i in test_rows),
            )
        )
    return splits


def generate_splits(
    table: SlideTable,
    *,
    n_splits: int = 5,
    val_num: Sequence[int],
    test_num: Sequence[int],
    seed: int = 7,
    label_frac: float = 1.0,
    patient_strat: bool = False,
) -> list[Split]:
    """Fully-supervised stratified splits (ref ``generate_split``)."""
    return _generate(table, n_splits=n_splits, val_num=val_num, test_num=test_num,
                     seed=seed, label_frac=label_frac, shot=None,
                     patient_strat=patient_strat)


def generate_fewshot_splits(
    table: SlideTable,
    *,
    shot: int,
    n_splits: int = 5,
    val_num: Sequence[int],
    test_num: Sequence[int],
    seed: int = 7,
    patient_strat: bool = False,
) -> list[Split]:
    """Few-shot k-per-class splits (ref ``generate_split_few``): ``shot``
    train slides per class after carving out val/test."""
    return _generate(table, n_splits=n_splits, val_num=val_num, test_num=test_num,
                     seed=seed, label_frac=1.0, shot=shot,
                     patient_strat=patient_strat)
