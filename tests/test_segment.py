"""Tissue segmentation + create_patches CLI (the CLAM preprocessing step
the reference outsources — /root/reference/README.md:15)."""

import numpy as np
import pytest

from moc_tpu.data.segment import (TissueSegmentation, otsu_threshold,
                                  rgb_to_saturation, save_patch_coords,
                                  segment_tissue, segmented_grid)

TISSUE = np.array([186, 85, 211], np.uint8)  # saturated purple
WHITE = np.array([255, 255, 255], np.uint8)


def make_slide(w=1600, h=1200, *, hole=True, speck=True):
    """White background + one big tissue blob (optional hole) + a speck."""
    img = np.full((h, w, 3), 255, np.uint8)
    img[300:700, 400:1000] = TISSUE  # 600x400 blob
    if hole:
        img[450:550, 600:700] = WHITE  # 100x100 hole
        img[320:323, 420:423] = WHITE  # 3x3 pinhole (filled as tissue)
    if speck:
        img[50:60, 50:60] = TISSUE  # 10x10 speck, below a_t
    return img


def test_rgb_to_saturation():
    sat = rgb_to_saturation(make_slide())
    assert sat[0, 0] == 0.0  # white background
    assert sat[500, 500] > 100  # tissue
    # scale invariance: uint8 and [0,1] float agree
    img = make_slide()
    np.testing.assert_allclose(rgb_to_saturation(img.astype(np.float32) / 255),
                               rgb_to_saturation(img), atol=1e-3)


def test_otsu_threshold_bimodal():
    rng = np.random.default_rng(0)
    img = np.concatenate([rng.normal(40, 5, 4000), rng.normal(200, 5, 2000)])
    t = otsu_threshold(img)
    assert 45 < t < 195  # between the two modes
    assert otsu_threshold(np.zeros((4, 4))) == 0.0


def test_segment_tissue_blob_hole_speck():
    seg = segment_tissue(make_slide(), scale=1.0, a_t=0.5, a_h=0.02)
    assert isinstance(seg, TissueSegmentation)
    assert seg.n_regions == 1  # speck filtered by a_t
    assert seg.mask[500, 500]  # tissue
    assert not seg.mask[500, 650]  # big hole stays excluded
    assert seg.mask[321, 421]  # pinhole below a_h is filled -> tissue
    assert not seg.mask[55, 55]  # speck dropped
    assert not seg.mask[100, 100]  # background
    assert 0.0 < seg.tissue_fraction() < 0.3

    # raising a_t past the blob area drops everything
    empty = segment_tissue(make_slide(), scale=1.0, a_t=5000.0)
    assert empty.n_regions == 0 and not empty.mask.any()


def test_segment_tissue_otsu_and_scale():
    # Otsu finds the same blob without the fixed threshold
    seg = segment_tissue(make_slide(), scale=1.0, use_otsu=True,
                         a_t=0.5, a_h=0.02)
    assert seg.n_regions == 1 and seg.mask[500, 500]
    # area thresholds are in 512x512 LEVEL-0 units: at scale 4 the same
    # a_t in units covers 16x fewer mask pixels
    thumb = make_slide()[::4, ::4]
    seg4 = segment_tissue(thumb, scale=4.0, a_t=0.5, a_h=0.02)
    assert seg4.n_regions == 1
    assert seg4.mask[125, 125]  # (500, 500) / 4


def test_segmented_grid_modes():
    seg = segment_tissue(make_slide(), scale=1.0, a_t=0.5, a_h=0.02)
    got = {}
    for fn in ("basic", "center", "four_pt_easy", "four_pt_hard"):
        coords = segmented_grid(seg, 64, 64, contour_fn=fn)
        assert len(coords), fn
        # center / four_pt_hard guarantee the patch center on tissue
        # (easy mode keeps center-off patches when a shifted point hits)
        if fn in ("center", "four_pt_hard"):
            centers = coords + 32
            assert seg.mask[centers[:, 1], centers[:, 0]].all(), fn
        got[fn] = {tuple(c) for c in coords}
    # strictness ordering: hard <= center <= easy
    assert got["four_pt_hard"] <= got["center"] <= got["four_pt_easy"]
    # no patch starts inside the big hole's interior
    for x, y in got["four_pt_hard"]:
        assert not (600 <= x + 32 < 700 and 450 <= y + 32 < 550)


def test_segmented_grid_empty():
    seg = TissueSegmentation(np.zeros((10, 10), bool), 1.0, 0)
    assert segmented_grid(seg, 64).shape == (0, 2)


def test_save_patch_coords_roundtrip(tmp_path):
    import h5py

    coords = np.array([[0, 0], [256, 0], [0, 256]], np.int64)
    path = str(tmp_path / "s.h5")
    save_patch_coords(path, coords, patch_size=256, patch_level=0,
                      downsample=2.0, name="s")
    with h5py.File(path, "r") as f:
        np.testing.assert_array_equal(f["coords"][:], coords)
        assert f["coords"].attrs["patch_size"] == 256
        assert f["coords"].attrs["downsample"] == 2.0
        assert f["coords"].attrs["name"] == "s"

    imgs = np.zeros((3, 8, 8, 3), np.uint8)
    save_patch_coords(path, coords, patch_size=8, name="s", imgs=imgs)
    with h5py.File(path, "r") as f:
        assert f["imgs"].shape == (3, 8, 8, 3)


def test_open_slide_pil_reader(tmp_path):
    from PIL import Image

    from moc_tpu.data.patches import open_slide

    img = make_slide(w=320, h=240)
    path = str(tmp_path / "s.png")
    Image.fromarray(img).save(path)
    slide = open_slide(path)
    assert slide.dimensions == (320, 240)
    thumb, scale = slide.thumbnail(80)
    assert max(thumb.shape[:2]) == 80 and scale == pytest.approx(4.0)
    patch = slide.read((10, 20), 32)
    np.testing.assert_array_equal(patch, img[20:52, 10:42])
    # over-edge crop zero-fills, shape preserved
    edge = slide.read((300, 220), 32)
    assert edge.shape == (32, 32, 3)
    assert (edge[-5:, -5:] == 0).all()


def test_create_patches_cli_and_extract_chain(tmp_path):
    """Raw image slides -> create_patches -> extract_features: the full
    preprocessing pipeline the reference README outsources to CLAM, with
    no OpenSlide installed (PIL fallback both stages)."""
    import h5py
    import pandas as pd
    from PIL import Image

    from moc_tpu.cli.create_patches import main as cp_main
    from moc_tpu.cli.extract_features import main as ex_main

    wsi = tmp_path / "wsi"
    wsi.mkdir()
    Image.fromarray(make_slide()).save(wsi / "slide_a.png")
    Image.fromarray(make_slide(hole=False, speck=False)).save(
        wsi / "slide_b.png")
    out = tmp_path / "proc"

    rc = cp_main(["--wsi_dir", str(wsi), "--out_dir", str(out),
                  "--patch_size", "64", "--step_size", "64",
                  "--a_t", "0.5", "--a_h", "0.02", "--platform", "cpu"])
    assert rc == 0
    plist = pd.read_csv(out / "process_list.csv")
    assert sorted(plist["slide_id"]) == ["slide_a", "slide_b"]
    assert (plist["status"] == "processed").all()
    assert (plist["n_patches"] > 0).all()
    with h5py.File(out / "patches" / "slide_a.h5", "r") as f:
        n_a = len(f["coords"])
        assert f["coords"].attrs["patch_size"] == 64
        assert "imgs" not in f
    assert (out / "masks" / "slide_a.png").exists()

    # --resume skips; --store_patches embeds pixels (OpenSlide-free path)
    rc = cp_main(["--wsi_dir", str(wsi), "--out_dir", str(out),
                  "--resume", "--platform", "cpu"])
    assert rc == 0

    # a --slides-subset re-run merges into process_list.csv instead of
    # clobbering the other slides' rows
    rc = cp_main(["--wsi_dir", str(wsi), "--out_dir", str(out),
                  "--patch_size", "64", "--step_size", "64", "--a_t", "0.5",
                  "--a_h", "0.02", "--slides", "slide_b", "--platform", "cpu"])
    assert rc == 0
    merged = pd.read_csv(out / "process_list.csv")
    assert sorted(merged["slide_id"]) == ["slide_a", "slide_b"]
    rc = cp_main(["--wsi_dir", str(wsi), "--out_dir", str(out / "px"),
                  "--patch_size", "64", "--step_size", "64", "--a_t", "0.5",
                  "--a_h", "0.02", "--store_patches", "--slides", "slide_a",
                  "--platform", "cpu"])
    assert rc == 0
    with h5py.File(out / "px" / "patches" / "slide_a.h5", "r") as f:
        assert f["imgs"].shape == (n_a, 64, 64, 3)
        assert f["imgs"][:].max() > 0

    # stage 2a: coords-h5 + PIL slide reads (CoordPatchReader fallback)
    feats1 = tmp_path / "f1"
    rc = ex_main(["--patch_dir", str(out / "patches"),
                  "--out_dir", str(feats1), "--backbone", "debug",
                  "--wsi_dir", str(wsi), "--wsi_ext", ".png",
                  "--patch_size", "64", "--image_size", "64",
                  "--batch_size", "16", "--platform", "cpu"])
    assert rc == 0
    with h5py.File(feats1 / "h5_files" / "slide_a.h5", "r") as f:
        assert f["features"].shape == (n_a, 512)
        assert np.isfinite(f["features"][:]).all()
        assert f["coords"].shape == (n_a, 2)

    # stage 2b: embedded pixels, no slide files at all
    feats2 = tmp_path / "f2"
    rc = ex_main(["--patch_dir", str(out / "px" / "patches"),
                  "--out_dir", str(feats2), "--backbone", "debug",
                  "--image_size", "64", "--batch_size", "16",
                  "--platform", "cpu"])
    assert rc == 0
    with h5py.File(feats2 / "h5_files" / "slide_a.h5", "r") as f:
        assert f["features"].shape == (n_a, 512)
