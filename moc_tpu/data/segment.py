"""Tissue segmentation + patch-grid generation: the WSI preprocessing step.

The reference ships NO preprocessing — its README sends users to the
external CLAM pipeline for segmentation/patching/feature extraction
(``/root/reference/README.md:15``: "This repository does not include
scripts for Whole Slide Image (WSI) preprocessing. Please follow the
official CLAM pipeline"), and the only in-repo trace is the dead
``Wsi_Region`` grid (``datasets/wsi_dataset.py``, rebuilt in
``data/regions.py``). This module closes the gap natively so raw slides →
trained/served predictions needs nothing outside this framework.

The algorithm follows CLAM's ``segmentTissue`` recipe (HSV saturation →
median blur → Otsu-or-fixed threshold → morphological close → area-filtered
tissue regions with per-region holes) but is rebuilt on numpy +
``scipy.ndimage`` MASK operations instead of cv2 polygon contours:
connected components replace ``cv2.findContours``, and downstream patch
filtering samples the SAME check points (top-left / center / four shifted
points, ``data/regions.contour_check`` semantics) against the rasterized
tissue mask — the rasterized equivalent of CLAM's point-in-polygon tests.
Mask-space filtering is also what a TPU-first design wants: one vectorized
gather over the whole grid, no per-point polygon loops.

Area thresholds (``a_t`` tissue, ``a_h`` hole) are expressed in units of
512×512 level-0 patch areas, matching CLAM's ``ref_patch_size`` scaling, so
the familiar defaults (``a_t=100, a_h=16``) carry over unchanged.
"""

from __future__ import annotations

import dataclasses

import numpy as np

REF_PATCH_SIZE = 512  # CLAM's area-unit reference patch (level 0)


def rgb_to_saturation(rgb: np.ndarray) -> np.ndarray:
    """HSV saturation channel of an ``[H, W, 3]`` uint8/float RGB image,
    scaled to 0..255 (the channel CLAM thresholds on)."""
    x = np.asarray(rgb, np.float32)
    mx = x.max(axis=-1)
    mn = x.min(axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        # (mx-mn)/mx is scale-invariant: uint8 and [0,1]-float inputs agree
        s = np.where(mx > 0, (mx - mn) / mx, 0.0)
    return (s * 255.0).astype(np.float32)


def otsu_threshold(img: np.ndarray) -> float:
    """Otsu's between-class-variance threshold over a 256-bin histogram
    (values are clipped to 0..255 first). Returns the threshold value;
    foreground is ``img > threshold``."""
    h, _ = np.histogram(np.clip(np.asarray(img, np.float32), 0, 255),
                        bins=256, range=(0, 256))
    h = h.astype(np.float64)
    total = h.sum()
    if total == 0:
        return 0.0
    p = h / total
    omega = np.cumsum(p)
    mu = np.cumsum(p * np.arange(256))
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = (mu_t * omega - mu) ** 2 / (omega * (1.0 - omega))
    sigma_b[~np.isfinite(sigma_b)] = -1.0
    return float(np.argmax(sigma_b))


@dataclasses.dataclass
class TissueSegmentation:
    """A tissue mask at segmentation scale.

    ``mask [h, w]`` bool (True = tissue, big holes excluded); ``scale`` =
    level-0 pixels per mask pixel; ``n_regions`` tissue components kept.
    """

    mask: np.ndarray
    scale: float
    n_regions: int

    def tissue_fraction(self) -> float:
        return float(self.mask.mean()) if self.mask.size else 0.0


def segment_tissue(thumb_rgb: np.ndarray, scale: float, *,
                   sthresh: float = 8, mthresh: int = 7, close: int = 4,
                   use_otsu: bool = False, a_t: float = 100.0,
                   a_h: float = 16.0, max_n_holes: int = 8,
                   exclude_borders: bool = False) -> TissueSegmentation:
    """Segment tissue on a downsampled thumbnail (CLAM ``segmentTissue``).

    ``thumb_rgb [h, w, 3]`` uint8; ``scale`` = level-0 pixels per thumbnail
    pixel. ``a_t``/``a_h`` are minimum region/hole areas in units of
    512×512 level-0 patches. Holes smaller than ``a_h`` (and beyond the
    ``max_n_holes`` largest per region) are filled — they count as tissue,
    matching CLAM's dropped-hole semantics.
    """
    from scipy import ndimage

    sat = rgb_to_saturation(thumb_rgb)
    if mthresh and mthresh > 1:
        sat = ndimage.median_filter(sat, size=mthresh)
    thr = otsu_threshold(sat) if use_otsu else float(sthresh)
    mask = sat > thr
    if close and close > 0:
        structure = np.ones((close, close), bool)
        mask = ndimage.binary_closing(mask, structure=structure)
    if exclude_borders:  # drop components touching the thumbnail edge
        labels, _ = ndimage.label(mask)
        border_ids = np.unique(np.concatenate([
            labels[0], labels[-1], labels[:, 0], labels[:, -1]]))
        mask &= ~np.isin(labels, border_ids[border_ids > 0])

    # area unit: one 512x512 level-0 patch, in mask pixels
    unit = (REF_PATCH_SIZE / float(scale)) ** 2
    min_tissue_px = a_t * unit
    min_hole_px = a_h * unit

    labels, n = ndimage.label(mask)
    if n == 0:
        return TissueSegmentation(np.zeros_like(mask), scale, 0)
    areas = ndimage.sum_labels(mask, labels, index=np.arange(1, n + 1))
    keep_ids = np.flatnonzero(areas >= min_tissue_px) + 1
    out = np.zeros_like(mask)
    kept = 0
    for rid in keep_ids:
        comp = labels == rid
        filled = ndimage.binary_fill_holes(comp)
        holes = filled & ~comp
        hlabels, hn = ndimage.label(holes)
        keep_holes = np.zeros_like(comp)
        if hn:
            hareas = ndimage.sum_labels(
                holes, hlabels, index=np.arange(1, hn + 1))
            big = np.flatnonzero(hareas >= min_hole_px) + 1
            if len(big) > max_n_holes:  # keep the largest max_n_holes
                order = np.argsort(-hareas[big - 1])
                big = big[order[:max_n_holes]]
            if len(big):
                keep_holes = np.isin(hlabels, big)
        out |= filled & ~keep_holes
        kept += 1
    return TissueSegmentation(out, scale, kept)


def _sample_mask(seg: TissueSegmentation, points: np.ndarray) -> np.ndarray:
    """Tissue test of level-0 ``points [N, 2]`` (x, y) against the mask;
    points outside the mask raster are non-tissue."""
    px = np.floor(points[:, 0] / seg.scale).astype(np.int64)
    py = np.floor(points[:, 1] / seg.scale).astype(np.int64)
    h, w = seg.mask.shape
    ok = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    out = np.zeros(len(points), bool)
    out[ok] = seg.mask[py[ok], px[ok]]
    return out


def segmented_grid(seg: TissueSegmentation, patch_size: int,
                   step_size: int | None = None,
                   contour_fn: str = "four_pt_hard",
                   center_shift: float = 0.5) -> np.ndarray:
    """Level-0 top-left patch coords on tissue (CLAM ``process_contours``).

    Grids each tissue region's bounding box and keeps patches whose check
    points (``data/regions.contour_check`` modes, rasterized) hit the mask:
    ``basic`` = top-left corner, ``center`` = patch center, ``four_pt_easy``
    = center or any shifted point, ``four_pt_hard`` = center and all four
    points shifted by ``center_shift·patch_size/2``.
    """
    from scipy import ndimage

    from moc_tpu.data.regions import grid_coords

    step = step_size or patch_size
    labels, n = ndimage.label(seg.mask)
    if n == 0:
        return np.zeros((0, 2), np.int64)
    slices = ndimage.find_objects(labels)
    out = []
    for sl in slices:
        if sl is None:
            continue
        ys, xs = sl
        tl = (int(xs.start * seg.scale), int(ys.start * seg.scale))
        br = (int(np.ceil(xs.stop * seg.scale)),
              int(np.ceil(ys.stop * seg.scale)))
        grid = grid_coords(tl, br, patch_size, step)
        if not len(grid):
            continue
        center = grid + patch_size / 2.0
        if contour_fn == "basic":
            ok = _sample_mask(seg, grid)
        elif contour_fn == "center" or center_shift == 0.0:
            ok = _sample_mask(seg, center)
        elif contour_fn in ("four_pt_easy", "four_pt_hard"):
            shift = center_shift * patch_size / 2.0
            offs = np.array([[-shift, -shift], [-shift, shift],
                             [shift, -shift], [shift, shift]])
            inside = np.stack([_sample_mask(seg, center + o) for o in offs])
            c = _sample_mask(seg, center)
            ok = ((inside.any(axis=0) | c) if contour_fn == "four_pt_easy"
                  else (inside.all(axis=0) & c))
        else:
            raise ValueError(f"unknown contour_fn {contour_fn!r}")
        if ok.any():
            out.append(grid[ok])
    if not out:
        return np.zeros((0, 2), np.int64)
    coords = np.concatenate(out, axis=0)
    # regions' bounding boxes can overlap → dedup (stable order)
    _, idx = np.unique(coords, axis=0, return_index=True)
    return coords[np.sort(idx)]


def save_patch_coords(path: str, coords: np.ndarray, *, patch_size: int,
                      patch_level: int = 0, downsample: float = 1.0,
                      name: str = "", imgs: np.ndarray | None = None) -> None:
    """Write a CLAM-schema patch h5: ``coords [N, 2]`` with the attrs the
    CLAM toolchain stamps (``patch_size``, ``patch_level``, ``downsample``,
    ``name``) — readable by ``data/patches.CoordPatchReader`` and any CLAM
    consumer. With ``imgs [N, S, S, 3]``, also stores the pixel patches
    (``PatchBagReader`` schema; the OpenSlide-free downstream path)."""
    import h5py

    with h5py.File(path, "w") as f:
        d = f.create_dataset("coords", data=np.asarray(coords, np.int64))
        d.attrs["patch_size"] = patch_size
        d.attrs["patch_level"] = patch_level
        d.attrs["downsample"] = downsample
        d.attrs["name"] = name
        if imgs is not None:
            f.create_dataset("imgs", data=np.asarray(imgs))
