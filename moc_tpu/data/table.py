"""Slide tables: dataset CSV parsing, label mapping, patient grouping.

Rebuild of ``Generic_WSI_Classification_Dataset``
(``/root/reference/datasets/dataset_generic.py:38-340``) as an immutable
value object over a pandas frame instead of a torch ``Dataset``: the table is
pure metadata; bag tensors are produced by ``moc_tpu.data.loader``.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import numpy as np
import pandas as pd


@dataclasses.dataclass(frozen=True)
class SlideTable:
    """A (case_id, slide_id, label) table with integer labels.

    ``label_dict`` maps raw CSV label strings to class indices; ``num_classes``
    is the number of distinct class indices (multiple strings may share one).
    """

    frame: pd.DataFrame  # columns: case_id, slide_id, label (int)
    label_dict: Mapping[str, int]
    num_classes: int

    # ---------------------------------------------------------------- build
    @classmethod
    def from_csv(
        cls,
        csv_path: str,
        label_dict: Mapping[str, int],
        *,
        label_col: str = "label",
        ignore: Sequence[str] = (),
        filter_dict: Mapping[str, Sequence[str]] | None = None,
        shuffle: bool = False,
        seed: int = 7,
    ) -> "SlideTable":
        """Load a dataset CSV (columns ``case_id, slide_id, <label_col>``).

        Reads every column as string to preserve zero-padded slide ids — the
        dtype pitfall the reference documents at ``dataset_generic.py:261-262``.
        """
        df = pd.read_csv(csv_path, dtype=str)
        return cls.from_frame(
            df, label_dict, label_col=label_col, ignore=ignore,
            filter_dict=filter_dict, shuffle=shuffle, seed=seed,
        )

    @classmethod
    def from_frame(
        cls,
        df: pd.DataFrame,
        label_dict: Mapping[str, int],
        *,
        label_col: str = "label",
        ignore: Sequence[str] = (),
        filter_dict: Mapping[str, Sequence[str]] | None = None,
        shuffle: bool = False,
        seed: int = 7,
    ) -> "SlideTable":
        df = df.copy()
        if filter_dict:
            keep = np.full(len(df), True)
            for key, vals in filter_dict.items():
                keep &= df[key].isin(list(vals)).to_numpy()
            df = df[keep]
        if label_col != "label":
            df["label"] = df[label_col]
        df = df[~df["label"].isin(list(ignore))].reset_index(drop=True)
        df["label"] = df["label"].map(lambda s: label_dict[s]).astype(np.int64)
        if "case_id" not in df.columns:
            df["case_id"] = df["slide_id"]
        if shuffle:
            df = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
        num_classes = len(set(label_dict.values()))
        return cls(frame=df[["case_id", "slide_id", "label"]], label_dict=dict(label_dict),
                   num_classes=num_classes)

    # ---------------------------------------------------------------- views
    def __len__(self) -> int:
        return len(self.frame)

    @property
    def slide_ids(self) -> np.ndarray:
        return self.frame["slide_id"].to_numpy()

    @property
    def labels(self) -> np.ndarray:
        return self.frame["label"].to_numpy()

    def class_indices(self, cls_idx: int) -> np.ndarray:
        """Row indices of slides with class ``cls_idx`` (slide-level registry,
        reference ``cls_ids_prep`` ``dataset_generic.py:88-97``)."""
        return np.where(self.labels == cls_idx)[0]

    def label_of(self, slide_id: str) -> int:
        # dict lookup, built once: the per-call boolean frame scan made
        # read_all quadratic in table size on the host IO hot path
        cache = self.__dict__.get("_label_cache")
        if cache is None:
            cache = dict(zip(self.frame["slide_id"].astype(str),
                             self.frame["label"].astype(int)))
            self.__dict__["_label_cache"] = cache
        if slide_id not in cache:
            raise KeyError(slide_id)
        return int(cache[slide_id])

    def subset_by_slide_ids(self, slide_ids: Sequence[str]) -> "SlideTable":
        """Row-select by membership, preserving table order
        (reference ``get_split_from_df``, ``dataset_generic.py:201-215``)."""
        mask = self.frame["slide_id"].isin(list(slide_ids))
        return SlideTable(self.frame[mask].reset_index(drop=True), self.label_dict, self.num_classes)

    def subset_by_rows(self, rows: Sequence[int]) -> "SlideTable":
        return SlideTable(self.frame.iloc[list(rows)].reset_index(drop=True),
                          self.label_dict, self.num_classes)

    # ------------------------------------------------------------- patients
    def patient_table(self, voting: str = "max") -> pd.DataFrame:
        """Unique patients with a voted label (``max`` = MIL convention, ``maj``
        = mode; reference ``patient_data_prep`` ``dataset_generic.py:99-115``)."""
        rows = []
        for case_id, group in self.frame.groupby("case_id", sort=True):
            labels = group["label"].to_numpy()
            if voting == "max":
                label = int(labels.max())
            elif voting == "maj":
                vals, counts = np.unique(labels, return_counts=True)
                label = int(vals[np.argmax(counts)])
            else:
                raise ValueError(f"unknown patient voting {voting!r}")
            rows.append({"case_id": case_id, "label": label})
        return pd.DataFrame(rows)

    def summary(self) -> str:
        counts = self.frame["label"].value_counts().sort_index()
        lines = [f"slides={len(self)} classes={self.num_classes}"]
        for cls_idx, count in counts.items():
            lines.append(f"  class {cls_idx}: {count} slides")
        return "\n".join(lines)
