"""Raw-pixel patch bags: h5 patch images or coords + on-the-fly WSI reads.

Behavioral reference ``/root/reference/datasets/dataset_h5.py``:
  * ``Whole_Slide_Bag``     — h5 file holding pre-extracted patch IMAGES
    (``imgs [N, H, W, 3]`` + coords) (39-94);
  * ``Whole_Slide_Bag_FP``  — h5 file holding only coords; pixels come from
    ``OpenSlide.read_region`` at iteration time (96-157);
  * ``Dataset_All_Bags``    — a CSV of slide ids to iterate (191-200).

These feed the LoRA fine-tuning path (patch pixels → vision tower). Reads
are host-side numpy; normalization uses the CLIP transform by default, or
the PLIP variant (``transform="plip"`` ≙ ``Whole_Slide_Bag_FP_PLIP``,
``dataset_h5.py:159-189``) — see ``moc_tpu.zeroshot.transform``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import numpy as np

from moc_tpu.zeroshot.transform import (
    preprocess_image,
    preprocess_image_musk,
    preprocess_image_plip,
)


def _make_transform(kind: str, image_size: int):
    if kind == "clip":
        return lambda im: preprocess_image(im, image_size)
    if kind == "plip":
        return lambda im: preprocess_image_plip(im, image_size)
    if kind == "musk":
        return lambda im: preprocess_image_musk(im, image_size)
    raise ValueError(f"unknown transform {kind!r} (clip | plip | musk)")


@dataclasses.dataclass
class PatchBagReader:
    """Iterate image patches of one slide from an ``imgs``-bearing h5 file."""

    h5_path: str
    image_size: int = 224
    normalize: bool = True
    transform: str = "clip"  # "clip" | "plip" (ref Whole_Slide_Bag_FP_PLIP)

    def __len__(self) -> int:
        import h5py

        with h5py.File(self.h5_path, "r") as f:
            return len(f["imgs"])

    def batches(self, batch_size: int = 64) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        import h5py

        with h5py.File(self.h5_path, "r") as f:
            imgs = f["imgs"]
            coords = f["coords"][:] if "coords" in f else None
            tf = _make_transform(self.transform, self.image_size)
            for i in range(0, len(imgs), batch_size):
                chunk = np.asarray(imgs[i : i + batch_size])
                if self.normalize:
                    chunk = np.stack([tf(im) for im in chunk])
                c = coords[i : i + batch_size] if coords is not None else None
                yield chunk, c


@dataclasses.dataclass
class CoordPatchReader:
    """Coords-only h5 + live ``read_region`` pixels (requires OpenSlide)."""

    h5_path: str
    wsi_path: str
    patch_size: int = 256
    level: int = 0
    image_size: int = 224
    normalize: bool = True
    transform: str = "clip"  # "clip" | "plip" (ref Whole_Slide_Bag_FP_PLIP)

    def coords(self) -> np.ndarray:
        import h5py

        with h5py.File(self.h5_path, "r") as f:
            return np.asarray(f["coords"][:])

    def batches(self, batch_size: int = 64) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        import openslide

        slide = openslide.OpenSlide(self.wsi_path)
        coords = self.coords()
        tf = _make_transform(self.transform, self.image_size)
        for i in range(0, len(coords), batch_size):
            chunk = coords[i : i + batch_size]
            imgs = []
            for x, y in chunk:
                region = slide.read_region(
                    (int(x), int(y)), self.level, (self.patch_size, self.patch_size)
                ).convert("RGB")
                img = np.asarray(region)
                if self.normalize:
                    img = tf(img)
                imgs.append(img)
            yield np.stack(imgs), chunk


def list_bags(data_dir: str, csv_path: str | None = None) -> list[str]:
    """Slide ids with bag files present (ref ``Dataset_All_Bags``)."""
    if csv_path is not None:
        import pandas as pd

        return pd.read_csv(csv_path, dtype=str)["slide_id"].tolist()
    h5_dir = os.path.join(data_dir, "h5_files")
    return sorted(os.path.splitext(f)[0] for f in os.listdir(h5_dir)
                  if f.endswith(".h5"))
