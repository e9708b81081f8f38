"""Capstone user-story test: the COMPLETE reference workflow, raw pixels to
predictions and heatmaps, with zero external tools.

The reference README (/root/reference/README.md:15-40) tells users to run an
external CLAM fork for segmentation/patching/feature-extraction, then its own
training scripts, then per-slide inference. This test drives the whole chain
through moc_tpu's CLIs on synthetic slides:

    raw PNG slides
      -> cli.create_patches   (tissue segmentation + coord grids)
      -> cli.extract_features (debug backbone: checkpoint-free, 512-d)
      -> cli.train_mil        (--dataset nsclc --data_root <here>, CLAM-SB)
      -> cli.predict          (sidecar-detected architecture)
      -> cli.visualize        (trained-model attention heatmaps)

Class signal: per-class tissue COLOR (purple vs green). The debug backbone is
a fixed random projection of raw pixels, so color separates linearly and a
few CLAM epochs must reach perfect test AUC. Everything runs in-process on
the CPU mesh; each stage asserts its own artifacts so a failure localizes.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

PURPLE = np.array([186, 85, 211], np.uint8)  # class LUAD
GREEN = np.array([85, 186, 120], np.uint8)  # class LUSC


def _slide(color, rng, w=1280, h=960):
    """White background + one jittered tissue blob of the class color."""
    img = np.full((h, w, 3), 255, np.uint8)
    x0 = 200 + int(rng.integers(0, 200))
    y0 = 150 + int(rng.integers(0, 150))
    blob = np.clip(
        color[None, None].astype(np.int16)
        + rng.integers(-25, 25, (400, 600, 3)), 0, 255).astype(np.uint8)
    img[y0:y0 + 400, x0:x0 + 600] = blob
    return img


@pytest.mark.slow
def test_raw_slides_to_predictions_and_heatmaps(tmp_path):
    import h5py
    from PIL import Image

    from moc_tpu.cli.create_patches import main as cp_main
    from moc_tpu.cli.extract_features import main as ex_main
    from moc_tpu.cli.predict import main as predict_main
    from moc_tpu.cli.train_mil import main as train_main
    from moc_tpu.cli.visualize import main as viz_main

    root = tmp_path / "root"
    wsi = tmp_path / "wsi"
    wsi.mkdir()
    rng = np.random.default_rng(7)

    # ---- stage 0: raw slides, 4 per class -------------------------------
    rows = []
    for label, color in (("LUAD", PURPLE), ("LUSC", GREEN)):
        for i in range(4):
            sid = f"{label.lower()}_{i}"
            Image.fromarray(_slide(color, rng)).save(wsi / f"{sid}.png")
            rows.append({"case_id": f"case_{sid}", "slide_id": sid,
                         "label": label})

    # ---- stage 1: tissue segmentation + patch grids ----------------------
    proc = tmp_path / "proc"
    rc = cp_main(["--wsi_dir", str(wsi), "--out_dir", str(proc),
                  "--patch_size", "64", "--step_size", "64",
                  "--a_t", "0.5", "--a_h", "0.02", "--platform", "cpu"])
    assert rc == 0
    plist = pd.read_csv(proc / "process_list.csv")
    assert len(plist) == 8 and (plist["status"] == "processed").all()
    assert (plist["n_patches"] >= 20).all()

    # ---- stage 2: feature extraction into the preset's data layout -------
    feat_dir = root / "data" / "nsclc" / "merge_features_conch"
    rc = ex_main(["--patch_dir", str(proc / "patches"),
                  "--out_dir", str(feat_dir), "--backbone", "debug",
                  "--wsi_dir", str(wsi), "--wsi_ext", ".png",
                  "--patch_size", "64", "--image_size", "64",
                  "--batch_size", "32", "--platform", "cpu"])
    assert rc == 0
    with h5py.File(feat_dir / "h5_files" / "luad_0.h5", "r") as f:
        assert f["features"].shape[1] == 512
        assert f["coords"].shape[0] == f["features"].shape[0]

    # ---- stage 3: dataset CSV + few-shot split in the nsclc layout -------
    (root / "dataset_csv").mkdir(parents=True)
    csv_path = root / "dataset_csv" / "nsclc.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    split_dir = root / "splits" / "nsclc_fewshot" / "2shots"
    split_dir.mkdir(parents=True)
    split = pd.DataFrame({
        "train": ["luad_0", "luad_1", "lusc_0", "lusc_1"],
        "val": ["luad_2", "lusc_2", None, None],
        "test": ["luad_3", "lusc_3", None, None],
    })
    split.to_csv(split_dir / "splits_0.csv", index=False)

    # ---- stage 4: CLAM-SB few-shot training -------------------------------
    res = tmp_path / "res"
    rc = train_main(["--dataset", "nsclc", "--data_root", str(root),
                     "--model_type", "clam_sb", "--model_size", "conch",
                     "--shot", "2", "--fold", "0", "--max_epochs", "4",
                     "--lr", "1e-3", "--result_dir", str(res),
                     "--platform", "cpu"])
    assert rc == 0
    payload = json.load(open(res / "clam_sb_shot_2_fold_0.json"))
    assert payload["test_auc"] == pytest.approx(1.0), payload
    model = res / "clam_sb_shot_2_fold_0.msgpack"
    assert model.exists() and model.with_suffix(".json").exists()

    # ---- stage 5: standalone prediction over the whole cohort ------------
    pred_csv = tmp_path / "pred.csv"
    rc = predict_main(["--platform", "cpu", "--dataset", "nsclc",
                       "--model", str(model), "--model_kind", "mil",
                       "--feature_dir", str(feat_dir),
                       "--csv", str(csv_path), "--out", str(pred_csv)])
    assert rc == 0
    pred = pd.read_csv(pred_csv).set_index("slide_id")
    assert len(pred) == 8
    np.testing.assert_allclose(pred[["prob_0", "prob_1"]].sum(axis=1),
                               1.0, atol=1e-5)
    want = {r["slide_id"]: 0 if r["label"] == "LUAD" else 1 for r in rows}
    got = pred[["prob_0", "prob_1"]].to_numpy().argmax(axis=1)
    acc = float(np.mean([got[i] == want[s] for i, s in enumerate(pred.index)]))
    assert acc == 1.0, dict(zip(pred.index, got))

    # ---- stage 6: trained-model attention heatmaps -----------------------
    viz_out = tmp_path / "viz"
    rc = viz_main(["--dataset", "nsclc", "--feature_dir", str(feat_dir),
                   "--out_dir", str(viz_out), "--slides", "luad_3", "lusc_3",
                   "--model_msgpack", str(model), "--model_kind", "mil",
                   "--patch_size", "64", "--downsample", "8",
                   "--platform", "cpu"])
    assert rc == 0
    made = os.listdir(viz_out)
    assert any("luad_3" in f for f in made), made
    assert any(f.endswith(".png") for f in made), made
