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
    preprocess_image_imagenet,
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
    if kind == "imagenet":
        return lambda im: preprocess_image_imagenet(im, image_size)
    raise ValueError(
        f"unknown transform {kind!r} (clip | plip | musk | imagenet)")


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


class _PILSlide:
    """Plain-image slide adapter (PNG/JPEG/simple TIFF via PIL): the
    OpenSlide-free path for test fixtures, exported region images, and any
    cohort stored as ordinary images. Reads are level-0 only; crops past
    the image edge zero-fill (glass-background patches score ~0 everywhere,
    same as OpenSlide's transparent padding converted to RGB)."""

    def __init__(self, path: str):
        from PIL import Image

        self._im = Image.open(path).convert("RGB")

    @property
    def dimensions(self) -> tuple[int, int]:
        return self._im.size  # (w, h)

    def thumbnail(self, max_px: int) -> tuple[np.ndarray, float]:
        w, h = self._im.size
        scale = max(1.0, max(w, h) / float(max_px))
        tw = max(1, int(round(w / scale)))
        th = max(1, int(round(h / scale)))
        thumb = self._im.resize((tw, th))
        return np.asarray(thumb), w / float(tw)

    def read(self, coord: tuple[int, int], size: int) -> np.ndarray:
        x, y = int(coord[0]), int(coord[1])
        return np.asarray(self._im.crop((x, y, x + size, y + size)))


class _OpenSlide:
    """OpenSlide adapter with the same surface as :class:`_PILSlide`."""

    def __init__(self, path: str):
        import openslide

        self._s = openslide.OpenSlide(path)

    @property
    def dimensions(self) -> tuple[int, int]:
        return self._s.dimensions

    def thumbnail(self, max_px: int) -> tuple[np.ndarray, float]:
        w, h = self._s.dimensions
        scale = max(1.0, max(w, h) / float(max_px))
        tw = max(1, int(round(w / scale)))
        th = max(1, int(round(h / scale)))
        thumb = self._s.get_thumbnail((tw, th)).convert("RGB")
        return np.asarray(thumb), w / float(thumb.size[0])

    def read(self, coord: tuple[int, int], size: int) -> np.ndarray:
        region = self._s.read_region((int(coord[0]), int(coord[1])), 0,
                                     (size, size)).convert("RGB")
        return np.asarray(region)


def open_slide(path: str):
    """Open a slide for pixel reads: OpenSlide when importable and the file
    is one of its formats, else PIL (plain images). Both adapters expose
    ``dimensions (w, h)``, ``thumbnail(max_px) -> (rgb, scale)``, and
    ``read((x, y), size) -> [size, size, 3] uint8`` at level 0."""
    try:
        import openslide  # noqa: F401
    except ImportError:
        return _PILSlide(path)
    try:
        return _OpenSlide(path)
    except Exception:
        return _PILSlide(path)


@dataclasses.dataclass
class CoordPatchReader:
    """Coords-only h5 + live pixel reads (OpenSlide, or PIL for plain-image
    slides — see :func:`open_slide`)."""

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
        if self.level != 0:
            # non-zero pyramid levels are an OpenSlide-only concept; the
            # PIL fallback reads level 0 only
            import openslide

            slide = openslide.OpenSlide(self.wsi_path)
            read = lambda c, s: np.asarray(  # noqa: E731
                slide.read_region(c, self.level, (s, s)).convert("RGB"))
        else:
            slide = open_slide(self.wsi_path)
            read = slide.read
        coords = self.coords()
        tf = _make_transform(self.transform, self.image_size)
        for i in range(0, len(coords), batch_size):
            chunk = coords[i : i + batch_size]
            imgs = []
            for x, y in chunk:
                img = read((int(x), int(y)), self.patch_size)
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
