"""Dual-scale bag loading for ViLa-MIL.

Behavioral reference ``Generic_MIL_Dataset_ViLa``
(``/root/reference/datasets/dataset_generic.py:443-481``): each slide has
two feature files — a small-scale (s) and a large-scale (l) ``pt_files``
directory — returned together as ``(feat_s, feat_l, label)``.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from moc_tpu.data.bags import read_bag
from moc_tpu.data.batching import bucket_size, pad_bag
from moc_tpu.data.table import SlideTable
from flax import struct


@struct.dataclass
class DualScaleBag:
    """One padded dual-scale slide (vmap a stack of these for batching)."""

    feats_s: jnp.ndarray  # [Ns, D]
    mask_s: jnp.ndarray
    feats_l: jnp.ndarray  # [Nl, D]
    mask_l: jnp.ndarray
    label: jnp.ndarray


@dataclasses.dataclass
class DualScaleLoader:
    table: SlideTable
    data_dir_s: str
    data_dir_l: str
    use_h5: bool = False
    num_workers: int = 8

    def read(self, slide_id: str) -> DualScaleBag:
        label = self.table.label_of(slide_id)
        bag_s = read_bag(self.data_dir_s, slide_id, use_h5=self.use_h5, label=label)
        bag_l = read_bag(self.data_dir_l, slide_id, use_h5=self.use_h5, label=label)
        fs, ms, _ = pad_bag(bag_s.features, bucket_size(bag_s.n_patches))
        fl, ml, _ = pad_bag(bag_l.features, bucket_size(bag_l.n_patches))
        return DualScaleBag(
            feats_s=jnp.asarray(fs), mask_s=jnp.asarray(ms),
            feats_l=jnp.asarray(fl), mask_l=jnp.asarray(ml),
            label=jnp.int32(label),
        )

    def read_all(self, slide_ids: Sequence[str] | None = None) -> list[DualScaleBag]:
        ids = list(slide_ids) if slide_ids is not None else list(self.table.slide_ids)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            return list(pool.map(self.read, ids))
