"""WSI preprocessing: tissue segmentation + patch grids → CLAM-schema h5.

The reference repo ships NO preprocessing — its README points users at the
external CLAM pipeline (``/root/reference/README.md:15``). This CLI is that
step one, native: segment tissue on a slide thumbnail (CLAM's
saturation/Otsu/close recipe, ``data/segment.py``), lay a patch grid over
the tissue regions, and write ``patches/<slide>.h5`` coord files that
``cli.extract_features`` (and any CLAM consumer) reads directly. Raw
slides → features → training → serving now needs nothing outside this
framework.

  python -m moc_tpu.cli.create_patches --wsi_dir /data/slides \
      --out_dir /data/processed --patch_size 256 --step_size 256

Output layout (CLAM's):

* ``patches/<slide>.h5`` — ``coords [N, 2]`` level-0 top-left corners
  (+ ``imgs [N, S, S, 3]`` with ``--store_patches``: the OpenSlide-free
  downstream path — feature extraction then needs no slide files)
* ``masks/<slide>.png``  — QC overlay: thumbnail tinted green on tissue
* ``process_list.csv``   — per-slide status, patch counts, seg params

Slide IO goes through ``data.patches.open_slide``: OpenSlide when
installed (``.svs`` etc.), PIL otherwise (plain images, test fixtures).
Segmentation parameters carry CLAM's familiar defaults (``sthresh=8``,
``mthresh=7``, ``close=4``, ``a_t=100``, ``a_h=16`` in 512×512-patch area
units). Multi-process pods shard slides per process (perfectly parallel,
per-slide atomic writes).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

SLIDE_EXTS = (".svs", ".ndpi", ".mrxs", ".scn", ".vms", ".vmu", ".bif",
              ".tif", ".tiff", ".png", ".jpg", ".jpeg", ".bmp")


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Tissue segmentation + patching")
    p.add_argument("--wsi_dir", required=True,
                   help="dir of slides (OpenSlide formats, or plain images)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--slides", nargs="*", default=None,
                   help="slide filenames/ids to process (default: all found)")
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--step_size", type=int, default=256)
    p.add_argument("--thumb_max", type=int, default=2048,
                   help="segmentation thumbnail long side (px)")
    # CLAM seg_params defaults
    p.add_argument("--sthresh", type=float, default=8,
                   help="fixed saturation threshold (ignored with --use_otsu)")
    p.add_argument("--mthresh", type=int, default=7, help="median blur size")
    p.add_argument("--close", type=int, default=4,
                   help="morphological closing size (0 = off)")
    p.add_argument("--use_otsu", action="store_true")
    p.add_argument("--a_t", type=float, default=100.0,
                   help="min tissue-region area (512x512-patch units)")
    p.add_argument("--a_h", type=float, default=16.0,
                   help="min hole area to keep excluded (same units)")
    p.add_argument("--max_n_holes", type=int, default=8)
    p.add_argument("--exclude_borders", action="store_true",
                   help="drop tissue components touching the thumbnail edge")
    p.add_argument("--contour_fn", default="four_pt_hard",
                   choices=["basic", "center", "four_pt_easy",
                            "four_pt_hard"])
    p.add_argument("--store_patches", action="store_true",
                   help="also store the pixel patches in the h5 (imgs "
                        "dataset) — downstream extraction then needs no "
                        "slide files or OpenSlide")
    p.add_argument("--no_mask_png", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="skip slides whose patch h5 already exists")
    p.add_argument("--platform", default=None)
    return p.parse_args(argv)


def _mask_overlay(thumb: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Thumbnail tinted green where tissue (QC raster)."""
    from PIL import Image

    m = np.asarray(Image.fromarray(mask.astype(np.uint8) * 255).resize(
        (thumb.shape[1], thumb.shape[0]))) > 127
    out = thumb.astype(np.float32)
    green = np.array([0, 200, 0], np.float32)
    out[m] = 0.55 * out[m] + 0.45 * green
    return out.astype(np.uint8)


def process_slide(path: str, out_h5: str, args) -> dict:
    """Segment + grid one slide → its ``process_list`` row."""
    from moc_tpu.data.patches import open_slide
    from moc_tpu.data.segment import (save_patch_coords, segment_tissue,
                                      segmented_grid)

    slide = open_slide(path)
    thumb, scale = slide.thumbnail(args.thumb_max)
    seg = segment_tissue(
        thumb, scale, sthresh=args.sthresh, mthresh=args.mthresh,
        close=args.close, use_otsu=args.use_otsu, a_t=args.a_t,
        a_h=args.a_h, max_n_holes=args.max_n_holes,
        exclude_borders=args.exclude_borders)
    coords = segmented_grid(seg, args.patch_size, args.step_size,
                            contour_fn=args.contour_fn)
    name = os.path.splitext(os.path.basename(path))[0]
    tmp = out_h5 + ".tmp"
    save_patch_coords(tmp, coords, patch_size=args.patch_size,
                      patch_level=0, downsample=1.0, name=name)
    if args.store_patches and len(coords):
        # stream patch pixels one at a time (a 10k-patch slide at 256px is
        # ~2 GB — never materialize the whole stack host-side)
        import h5py

        s = args.patch_size
        with h5py.File(tmp, "a") as f:
            d = f.create_dataset(
                "imgs", shape=(len(coords), s, s, 3), dtype=np.uint8,
                chunks=(min(64, len(coords)), s, s, 3))
            for i, (x, y) in enumerate(coords):
                d[i] = slide.read((int(x), int(y)), s)
    os.replace(tmp, out_h5)  # atomic: --resume never sees half-written h5s

    if not args.no_mask_png:
        from PIL import Image

        mask_dir = os.path.join(args.out_dir, "masks")
        os.makedirs(mask_dir, exist_ok=True)
        Image.fromarray(_mask_overlay(thumb, seg.mask)).save(
            os.path.join(mask_dir, f"{name}.png"))
    w, h = slide.dimensions
    return dict(slide_id=name, status="processed", n_patches=len(coords),
                n_regions=seg.n_regions,
                tissue_pct=round(100 * seg.tissue_fraction(), 2),
                width=w, height=h, seg_scale=round(seg.scale, 2))


def main(argv=None) -> int:
    args = get_args(argv)
    from moc_tpu.cli.common import setup_runtime

    setup_runtime(args)
    import pandas as pd

    files = sorted(f for f in os.listdir(args.wsi_dir)
                   if f.lower().endswith(SLIDE_EXTS))
    if args.slides:
        want = set(args.slides)
        files = [f for f in files
                 if f in want or os.path.splitext(f)[0] in want]
        missing = want - {f for f in files} - {
            os.path.splitext(f)[0] for f in files}
        if missing:
            raise SystemExit(f"slides not found under {args.wsi_dir!r}: "
                             f"{sorted(missing)[:5]}")
    if not files:
        raise SystemExit(f"no slides found under {args.wsi_dir!r} "
                         f"(extensions: {', '.join(SLIDE_EXTS)})")
    import jax

    if jax.process_count() > 1:
        pid, n = jax.process_index(), jax.process_count()
        files = files[pid::n]
        print(f"process {pid}/{n}: {len(files)} slides", file=sys.stderr)

    patch_dir = os.path.join(args.out_dir, "patches")
    os.makedirs(patch_dir, exist_ok=True)
    rows = []
    for fname in files:
        name = os.path.splitext(fname)[0]
        out_h5 = os.path.join(patch_dir, f"{name}.h5")
        if args.resume and os.path.exists(out_h5):
            print(f"{name}: exists, skipping (--resume)")
            continue
        t0 = time.perf_counter()
        try:
            row = process_slide(os.path.join(args.wsi_dir, fname), out_h5,
                                args)
        except Exception as e:  # isolate per-slide failures (bad files)
            print(f"{name}: FAILED ({e})", file=sys.stderr)
            rows.append(dict(slide_id=name, status=f"failed: {e}",
                             n_patches=0))
            continue
        rows.append(row)
        print(f"{name}: {row['n_patches']} patches, {row['n_regions']} "
              f"regions ({time.perf_counter() - t0:.1f}s)")
    if rows:
        csv_path = os.path.join(args.out_dir, "process_list.csv")
        if jax.process_count() > 1:
            root, ext = os.path.splitext(csv_path)
            csv_path = f"{root}.proc{jax.process_index()}{ext}"
        frame = pd.DataFrame(rows)
        if os.path.exists(csv_path):
            # merge: a --resume / --slides-subset run must not clobber the
            # statuses of slides processed by earlier invocations
            prev = pd.read_csv(csv_path)
            fresh = set(frame["slide_id"].astype(str))
            prev = prev[~prev["slide_id"].astype(str).isin(fresh)]
            frame = pd.concat([prev, frame], ignore_index=True)
            frame = frame.sort_values("slide_id", kind="stable")
        frame.to_csv(csv_path, index=False)
        print(f"{len(rows)} slides -> {csv_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
