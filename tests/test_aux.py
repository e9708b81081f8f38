"""Tests for the auxiliary layers: MI-Zero eval, viz, pseudo bags, patch
readers, dual-scale loading, result reshaping."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from moc_tpu.data import (
    PatchBagReader,
    PatchPools,
    assemble_fixed_ratio_bag,
    assemble_mixed_bag,
    assemble_self_bag,
    list_bags,
    prisec_order,
    pseudo_epoch,
)
from moc_tpu.data.batching import BagBatch
from moc_tpu.moc.results import policy_json_to_csv
from moc_tpu.viz import render_heatmap, render_topk_overlay, slide_extent, topk_patch_coords
from moc_tpu.zeroshot import classification_metrics, run_mizero, run_zeroshot_tiles


def _bag_batch(rng, b=3, n=256, d=32, with_coords=True):
    feats = rng.normal(size=(b, n, d)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[:, 200:] = False
    labels = np.array([0, 1, 0], np.int32)
    coords = (rng.integers(0, 40, size=(b, n, 2)) * 256).astype(np.int32)
    return BagBatch(
        features=jnp.asarray(feats), mask=jnp.asarray(mask),
        labels=jnp.asarray(labels), n_patches=jnp.full((b,), 200, jnp.int32),
        coords=jnp.asarray(coords) if with_coords else None,
    )


def test_run_mizero_end_to_end():
    rng = np.random.default_rng(0)
    batch = _bag_batch(rng)
    w = rng.normal(size=(32, 2)).astype(np.float32)
    results, dump = run_mizero([batch], w, topj=(1, 5, 10), dump_patch_level=True)
    for metric in ("acc", "bacc", "kappa", "weighted_kappa", "roc_auc", "weighted_f1"):
        assert set(results[metric]) == {1, 5, 10}
        assert all(np.isfinite(v) for v in results[metric].values())
    assert dump["logits"][5].shape == (3, 2)
    # patch dumps are trimmed to the true patch counts
    assert len(dump["patch_logits"]) == 3
    assert dump["patch_logits"][0].shape == (200, 2)
    assert dump["coords"][0].shape == (200, 2)


def test_run_zeroshot_tiles():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(16, 3)).astype(np.float32)

    def encode(x):
        return x  # identity "encoder"

    batches = [
        (rng.normal(size=(8, 16)).astype(np.float32), rng.integers(0, 3, 8)),
        (rng.normal(size=(8, 16)).astype(np.float32), rng.integers(0, 3, 8)),
    ]
    results, dump = run_zeroshot_tiles(encode, batches, w)
    assert 0 <= results["acc"] <= 1
    assert dump["logits"].shape == (16, 3)


def test_classification_metrics_match_sklearn():
    from sklearn.metrics import cohen_kappa_score

    rng = np.random.default_rng(2)
    targets = rng.integers(0, 2, 40)
    probs = rng.dirichlet([1, 1], size=40)
    preds = probs.argmax(1)
    m = classification_metrics(probs, preds, targets, ())
    assert m["kappa"] == pytest.approx(cohen_kappa_score(targets, preds))


def test_topk_coords_and_renderers():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(50, 2)).astype(np.float32)
    coords = (rng.integers(0, 20, size=(50, 2)) * 256).astype(np.int64)
    top = topk_patch_coords(logits, coords, k=5)
    assert set(top) == {0, 1} and top[0].shape == (5, 2)
    best = np.argmax(logits[:, 0])
    assert any((top[0] == coords[best]).all(1))

    w, h = slide_extent(coords, 256)
    assert w > coords[:, 0].max() and h > coords[:, 1].max()

    hm = render_heatmap(logits[:, 0], coords, 256, downsample=64)
    assert np.isfinite(hm[~np.isnan(hm)]).all()
    overlay = render_topk_overlay(logits, coords, k=3, downsample=64)
    assert overlay.dtype == np.uint8 and overlay.ndim == 3
    assert (overlay != 255).any()  # something was drawn


def test_pseudo_bags():
    rng = np.random.default_rng(4)
    fg = rng.normal(size=(500, 8)).astype(np.float32)
    nm = rng.normal(size=(600, 8)).astype(np.float32)
    bag = assemble_mixed_bag(fg, nm, rng, bag_size=512)
    assert bag.shape == (512, 8)
    fixed = assemble_fixed_ratio_bag(fg, nm, bag_size=512, fg_proportion=0.9)
    np.testing.assert_allclose(fixed[:460], fg[:460])
    pools = PatchPools({"luad": fg, "normal": nm}, label=0)
    selfbag = assemble_self_bag(pools, rng, 512)
    assert selfbag.shape == (512, 8)

    order = prisec_order(5, 2, rng)
    assert len(order) == 15
    assert sorted(order[::3].tolist()) == [0, 1, 2, 3, 4]  # primary pass intact

    slides = [PatchPools({"luad": fg[:50], "normal": nm[:50]}, label=i % 2)
              for i in range(4)]
    bags = list(pseudo_epoch(slides, rng, mode="mixed", bag_size=64,
                             num_secondary=1))
    assert len(bags) == 8
    assert all(b.shape == (64, 8) for b, _ in bags)


def test_patch_bag_reader(tmp_path):
    import h5py

    rng = np.random.default_rng(5)
    imgs = (rng.random((10, 32, 32, 3)) * 255).astype(np.uint8)
    coords = (rng.integers(0, 10, (10, 2)) * 256).astype(np.int32)
    p = str(tmp_path / "h5_files" / "s.h5")
    os.makedirs(os.path.dirname(p))
    with h5py.File(p, "w") as f:
        f.create_dataset("imgs", data=imgs)
        f.create_dataset("coords", data=coords)
    reader = PatchBagReader(p, image_size=32)
    assert len(reader) == 10
    chunks = list(reader.batches(4))
    assert len(chunks) == 3
    assert chunks[0][0].shape == (4, 32, 32, 3)
    assert chunks[0][0].dtype == np.float32  # normalized
    assert list_bags(str(tmp_path)) == ["s"]

    # PLIP variant (ref Whole_Slide_Bag_FP_PLIP, dataset_h5.py:159-189):
    # direct square resize, [0,1] range, NO mean/std normalization
    plip = PatchBagReader(p, image_size=24, transform="plip")
    chunk = next(iter(plip.batches(4)))[0]
    assert chunk.shape == (4, 24, 24, 3)
    assert chunk.min() >= 0.0 and chunk.max() <= 1.0
    np.testing.assert_allclose(
        chunk[0], np.asarray(
            __import__("PIL.Image", fromlist=["Image"]).fromarray(imgs[0])
            .resize((24, 24), 2), np.float32) / 255.0, atol=1e-6)
    # MUSK variant (ref get_musk_transforms, model_musk.py:98-106):
    # bicubic short-side resize + center crop + inception mean/std (0.5)
    musk = PatchBagReader(p, image_size=16, transform="musk")
    chunk = next(iter(musk.batches(4)))[0]
    assert chunk.shape == (4, 16, 16, 3)
    from PIL import Image

    expect = (np.asarray(
        Image.fromarray(imgs[0]).resize((16, 16), Image.BICUBIC),
        np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(chunk[0], expect, atol=1e-6)
    assert chunk.min() >= -1.0 and chunk.max() <= 1.0  # inception range

    with pytest.raises(ValueError, match="clip | plip"):
        list(PatchBagReader(p, transform="typo").batches(4))


def test_preprocess_image_musk_short_side_and_crop():
    """Rectangular input: the SHORT side lands at image_size and the long
    side is center-cropped (torchvision Resize(size=int) + CenterCrop
    semantics of the reference musk transform)."""
    from moc_tpu.zeroshot.transform import preprocess_image_musk

    rng = np.random.default_rng(0)
    img = (rng.random((64, 128, 3)) * 255).astype(np.uint8)  # H=64 short
    out = preprocess_image_musk(img, image_size=32)
    assert out.shape == (32, 32, 3)
    from PIL import Image

    # manual: resize to (W=64, H=32) bicubic, crop center 32 cols
    resized = np.asarray(Image.fromarray(img).resize((64, 32), Image.BICUBIC),
                         np.float32) / 255.0
    expect = (resized[:, 16:48] - 0.5) / 0.5
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_transform_rounding_matches_torchvision():
    """torchvision semantics exactly: Resize(int) FLOORS the long side
    (``int(size * long / short)``) and CenterCrop ROUNDS the origin
    (``int(round((dim - size) / 2))``, banker's) — a round()/floor swap
    shifts every pixel of some inputs (review finding r3)."""
    from moc_tpu.zeroshot.transform import (
        _center_crop_origin,
        _resize_short_side_dims,
    )

    # 700x1000 (w,h): 384 * 1000 / 700 = 548.57 -> torchvision floors to 548
    assert _resize_short_side_dims(700, 1000, 384) == (384, 548)
    assert _resize_short_side_dims(1000, 700, 384) == (548, 384)
    # odd difference: (35 - 32) / 2 = 1.5 -> torchvision round() gives 2
    assert _center_crop_origin(35, 32, 32) == (2, 0)
    # even .5 rounds down under banker's: (33 - 32) / 2 = 0.5 -> 0
    assert _center_crop_origin(33, 33, 32) == (0, 0)

    from PIL import Image

    from moc_tpu.zeroshot.transform import preprocess_image_musk

    rng = np.random.default_rng(1)
    img = (rng.random((67, 128, 3)) * 255).astype(np.uint8)  # H=67 short
    out = preprocess_image_musk(img, image_size=32)
    assert out.shape == (32, 32, 3)
    # manual torchvision pipeline: resize to (W=int(32*128/67)=61, H=32),
    # crop left = int(round((61-32)/2)) = 14 (29/2=14.5 banker's -> 14)
    resized = np.asarray(Image.fromarray(img).resize((61, 32), Image.BICUBIC),
                         np.float32) / 255.0
    expect = (resized[:, 14:46] - 0.5) / 0.5
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_policy_json_to_csv(tmp_path):
    payload = {"topj": {"nsclc": 0.9, "rcc": 0.8}, "delta": {"nsclc": 0.85}}
    jp = str(tmp_path / "r.json")
    json.dump(payload, open(jp, "w"))
    out = str(tmp_path / "r.csv")
    frame = policy_json_to_csv(jp, out)
    assert os.path.exists(out)
    assert frame.loc["topj", "nsclc"] == 0.9
    assert np.isnan(frame.loc["delta", "rcc"])


def test_scalar_logger_and_average_meter(tmp_path):
    import json as _json

    from moc_tpu.utils.logging import AverageMeter, ScalarLogger

    m = AverageMeter()
    m.update(2.0, 3)
    m.update(5.0, 1)
    assert m.count == 4 and abs(m.avg - 11.0 / 4) < 1e-9 and m.val == 5.0

    d = str(tmp_path / "tb")
    with ScalarLogger(d) as w:
        assert w.enabled
        w.add_scalar("train/loss", 0.5, 0)
        w.add_scalars({"val/auc": 0.9, "val/error": 0.1}, 1)
        w.flush()
    lines = [_json.loads(l) for l in open(f"{d}/scalars.jsonl")]
    assert {l["tag"] for l in lines} == {"train/loss", "val/auc", "val/error"}
    assert lines[1]["step"] == 1

    # disabled logger is a no-op
    off = ScalarLogger(None)
    assert not off.enabled
    off.add_scalar("x", 1.0, 0)
    off.close()


def test_device_put_cached_semantics(monkeypatch):
    """Content-fingerprinted device cache: identical bytes reuse the live
    buffers, any mutation or salt change misses, deletion misses cleanly,
    and MOC_TPU_DEVICE_CACHE=0 disables reuse entirely."""
    import numpy as np

    from moc_tpu.utils.device_cache import clear_device_cache, device_put_cached

    clear_device_cache()
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    m = np.ones((3,), bool)
    (da, dm), hit = device_put_cached(a, m)
    assert not hit
    (da2, dm2), hit2 = device_put_cached(a.copy(), m.copy())
    assert hit2 and da2 is da and dm2 is dm

    # same bytes, different salt -> miss (placement tag semantics)
    (_, _), hit3 = device_put_cached(a, m, extra=b"mesh")
    assert not hit3

    # mutated content -> miss (and evicts: one-entry HBM bound)
    b = a.copy()
    b[0, 0] += 1
    (_, _), hit4 = device_put_cached(b, m)
    assert not hit4

    # deleted device buffers -> clean miss, fresh put
    clear_device_cache()
    (da5, dm5), _ = device_put_cached(a, m)
    da5.delete()
    (da6, _), hit6 = device_put_cached(a, m)
    assert not hit6 and not da6.is_deleted()
    np.testing.assert_array_equal(np.asarray(da6), a)

    # env kill-switch: never caches, never hits
    clear_device_cache()
    monkeypatch.setenv("MOC_TPU_DEVICE_CACHE", "0")
    (_, _), h1 = device_put_cached(a, m)
    (_, _), h2 = device_put_cached(a, m)
    assert not h1 and not h2
    monkeypatch.delenv("MOC_TPU_DEVICE_CACHE")
    clear_device_cache()


def test_digest_memo_readonly_only():
    """The fingerprint digest memo applies ONLY to read-only arrays (mutating
    one raises, so the memoized digest cannot go stale); writable arrays are
    re-hashed every call, and distinct read-only content gets a distinct
    digest."""
    import numpy as np

    from moc_tpu.utils import device_cache as dc

    a = np.arange(1024, dtype=np.float32)
    a.flags.writeable = False
    d1 = dc._array_digest(a)
    assert id(a) in dc._digest_memo
    assert dc._array_digest(a) == d1  # memo hit, same digest

    b = np.arange(1024, dtype=np.float32)  # writable: never memoized
    db = dc._array_digest(b)
    assert db == d1  # same content hashes equal regardless of memo
    assert id(b) not in dc._digest_memo

    c = np.arange(1024, dtype=np.float32)
    c[0] = 7.0
    c.flags.writeable = False
    assert dc._array_digest(c) != d1

    with np.testing.assert_raises(ValueError):
        a[0] = 1.0  # the invariant the memo relies on


def test_visualize_cli(tmp_path):
    """cli.visualize renders the reference conch_zs_topk_visual workflow
    from bags alone: per-slide overlay PNG, per-class heatmap PNGs, and a
    top-k coordinate CSV whose rows match topk_patch_coords."""
    from PIL import Image

    from moc_tpu.cli.visualize import main as viz_main
    from moc_tpu.data import make_synthetic_corpus
    from moc_tpu.data.bags import read_bag_h5
    from moc_tpu.data.synthetic import SyntheticWSIConfig

    corpus = make_synthetic_corpus(
        str(tmp_path / "corpus"),
        SyntheticWSIConfig(slides_per_class=4, min_patches=50,
                           max_patches=90, dim=64, seed=3, signal=0.9),
        shots=(1,), n_folds=1, val_per_class=1, test_per_class=1)
    np.savez(tmp_path / "w.npz", weights=corpus["weights"])
    out_dir = str(tmp_path / "viz")
    assert viz_main(["--platform", "cpu", "--dataset", "nsclc",
                     "--feature_dir", corpus["data_dir"],
                     "--weights_npz", str(tmp_path / "w.npz"),
                     "--out_dir", out_dir, "--topk", "5",
                     "--downsample", "64"]) == 0

    import glob as _glob

    slides = sorted(os.path.splitext(os.path.basename(p))[0] for p in _glob.glob(
        os.path.join(corpus["data_dir"], "h5_files", "*.h5")))
    assert slides
    for sid in slides:
        overlay = Image.open(os.path.join(out_dir, f"{sid}_overlay.png"))
        assert overlay.mode == "RGB"
        for cls in range(2):
            hm = np.asarray(Image.open(
                os.path.join(out_dir, f"{sid}_heatmap_c{cls}.png")))
            assert hm.ndim == 3 and hm.shape[2] == 3
        rows = open(os.path.join(out_dir, f"{sid}_topk.csv")).read().splitlines()
        assert rows[0] == "class,rank,x,y,score"
        body = [r.split(",") for r in rows[1:]]
        assert len(body) == 2 * 5  # 2 classes x topk 5
        # CSV coords match the library's top-k selection
        bag = read_bag_h5(os.path.join(corpus["data_dir"], "h5_files",
                                       f"{sid}.h5"))
        logits = np.asarray(bag.features, np.float32) @ np.asarray(
            corpus["weights"], np.float32)
        sel = topk_patch_coords(logits, np.asarray(bag.coords), k=5)
        for cls in range(2):
            got = [(int(r[2]), int(r[3])) for r in body if int(r[0]) == cls]
            want = [(int(x), int(y)) for x, y in sel[cls]]
            assert got == want
        # probability scores are calibrated to [0, 1]
        assert all(0.0 <= float(r[4]) <= 1.0 for r in body)
    # missing-slide request is a usage error
    with pytest.raises(SystemExit):
        viz_main(["--platform", "cpu", "--feature_dir", corpus["data_dir"],
                  "--weights_npz", str(tmp_path / "w.npz"),
                  "--out_dir", out_dir, "--slides", "nope"])


def test_visualize_cli_trained_model(tmp_path):
    """--model_msgpack renders trained-head maps: CLAM attention raster,
    per-class patch-score heatmaps, and a top-k CSV ordered by the head's
    own patch logits (ref quantities: model_clam.py attention A,
    eval_utils.eval_lynature patch logits)."""
    import glob as _glob

    import jax
    from PIL import Image

    from moc_tpu.cli.visualize import main as viz_main
    from moc_tpu.data import make_synthetic_corpus
    from moc_tpu.data.bags import read_bag_h5
    from moc_tpu.data.synthetic import SyntheticWSIConfig
    from moc_tpu.train.mil import MilTrainConfig, build_model
    from moc_tpu.utils.checkpoint import save_params
    from moc_tpu.viz.model_maps import trained_patch_maps

    corpus = make_synthetic_corpus(
        str(tmp_path / "corpus"),
        SyntheticWSIConfig(slides_per_class=4, min_patches=40,
                           max_patches=70, dim=64, seed=5, signal=0.9),
        shots=(1,), n_folds=1, val_per_class=1, test_per_class=1)

    cfg = MilTrainConfig(model_type="clam_sb", n_classes=2)
    _, _, init_fn = build_model(cfg)
    probe = np.zeros((16, 64), np.float32)
    params = init_fn(jax.random.PRNGKey(7), probe, np.ones(16, bool))
    ckpt = str(tmp_path / "head.msgpack")
    save_params(ckpt, params)

    out_dir = str(tmp_path / "viz_model")
    assert viz_main(["--platform", "cpu", "--dataset", "nsclc",
                     "--feature_dir", corpus["data_dir"],
                     "--model_msgpack", ckpt, "--model_type", "clam_sb",
                     "--out_dir", out_dir, "--topk", "4",
                     "--downsample", "64"]) == 0

    slides = sorted(os.path.splitext(os.path.basename(p))[0]
                    for p in _glob.glob(os.path.join(
                        corpus["data_dir"], "h5_files", "*.h5")))
    assert slides
    for sid in slides:
        attn = np.asarray(Image.open(
            os.path.join(out_dir, f"{sid}_model_attn.png")))
        assert attn.ndim == 3 and attn.shape[2] == 3
        for cls in range(2):
            assert os.path.exists(os.path.join(
                out_dir, f"{sid}_model_heatmap_c{cls}.png"))
        rows = open(os.path.join(
            out_dir, f"{sid}_model_topk.csv")).read().splitlines()
        assert rows[0] == "class,rank,x,y,score"
        body = [r.split(",") for r in rows[1:]]
        assert len(body) == 2 * 4
        assert all(0.0 <= float(r[4]) <= 1.0 for r in body)

    # CSV coords match the head's own patch-logit top-k (library parity)
    sid = slides[0]
    bag = read_bag_h5(os.path.join(corpus["data_dir"], "h5_files",
                                   f"{sid}.h5"))
    feats = np.asarray(bag.features, np.float32)
    maps, class_scores, are_probs = trained_patch_maps(
        cfg, params, feats, np.ones(feats.shape[0], bool))
    assert not are_probs and class_scores.shape == (feats.shape[0], 2)
    assert maps["attn"].shape == (feats.shape[0],)
    # attention weights are a masked softmax: non-negative, sum to 1
    assert maps["attn"].min() >= 0.0
    assert np.isclose(maps["attn"].sum(), 1.0, atol=1e-5)
    sel = topk_patch_coords(class_scores, np.asarray(bag.coords), k=4)
    rows = open(os.path.join(
        out_dir, f"{sid}_model_topk.csv")).read().splitlines()[1:]
    body = [r.split(",") for r in rows]
    for cls in range(2):
        got = [(int(r[2]), int(r[3])) for r in body if int(r[0]) == cls]
        want = [(int(x), int(y)) for x, y in sel[cls]]
        assert got == want


def test_trained_patch_maps_heads():
    """Map shapes/semantics across the model zoo: MB per-class attention,
    MIL probability scores, CHIEF patch_prob (ref model_chief.py:173-195),
    and the titan rejection."""
    import jax

    from moc_tpu.train.mil import MilTrainConfig, build_model
    from moc_tpu.viz.model_maps import trained_patch_maps

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(30, 64)).astype(np.float32)
    valid = np.ones(30, bool)

    for mt, n_maps, has_scores, probs in [
            ("clam_mb", 2, True, False), ("mil", 0, True, True),
            ("transmil", 0, True, False), ("chief", 2, False, False)]:
        cfg = MilTrainConfig(model_type=mt, n_classes=2)
        _, _, init_fn = build_model(cfg)
        params = init_fn(jax.random.PRNGKey(1), feats, valid)
        maps, scores, are_probs = trained_patch_maps(cfg, params, feats, valid)
        assert len(maps) == n_maps, mt
        assert (scores is not None) == has_scores, mt
        assert are_probs == probs, mt
        for v in maps.values():
            assert v.shape == (30,)
        if mt == "mil":
            assert np.allclose(scores.sum(axis=1), 1.0, atol=1e-5)
        if mt == "chief":
            assert maps["patchprob"].min() >= 0.0

    with pytest.raises(ValueError, match="titan"):
        cfg = MilTrainConfig(model_type="titan", n_classes=2)
        trained_patch_maps(cfg, {}, feats, valid)


def test_trained_patch_maps_pad_invariant():
    """Padding rows behind the validity mask must not move any real patch's
    map value (the repo-wide pad-invariance invariant, applied to the viz
    surface)."""
    import jax

    from moc_tpu.train.mil import MilTrainConfig, build_model
    from moc_tpu.viz.model_maps import trained_patch_maps

    rng = np.random.default_rng(3)
    feats = rng.normal(size=(25, 64)).astype(np.float32)
    valid = np.ones(25, bool)
    padded = np.concatenate([feats, np.full((7, 64), 9.9, np.float32)])
    pvalid = np.concatenate([valid, np.zeros(7, bool)])

    for mt in ("clam_sb", "clam_mb", "abmil", "chief"):
        cfg = MilTrainConfig(model_type=mt, n_classes=2)
        _, _, init_fn = build_model(cfg)
        params = init_fn(jax.random.PRNGKey(2), feats, valid)
        maps, scores, _ = trained_patch_maps(cfg, params, feats, valid)
        maps_p, scores_p, _ = trained_patch_maps(cfg, params, padded, pvalid)
        for name in maps:
            np.testing.assert_allclose(maps_p[name][:25], maps[name],
                                       rtol=1e-5, atol=1e-6, err_msg=f"{mt}:{name}")
        if scores is not None:
            np.testing.assert_allclose(scores_p[:25], scores,
                                       rtol=1e-5, atol=1e-6, err_msg=mt)


def test_visualize_cli_moc_senet(tmp_path):
    """--model_kind moc renders the flagship model's own maps: union-gated
    fused per-class heatmaps, the union-selection raster, and the four
    senet view-weight rasters (quantities of main_moc.py:322-410)."""
    import glob as _glob

    import jax

    from moc_tpu.cli.visualize import main as viz_main
    from moc_tpu.data import make_synthetic_corpus
    from moc_tpu.data.bags import read_bag_h5
    from moc_tpu.data.synthetic import SyntheticWSIConfig
    from moc_tpu.moc import MOCConfig, init_senet
    from moc_tpu.utils.checkpoint import save_params
    from moc_tpu.viz.model_maps import moc_patch_maps

    corpus = make_synthetic_corpus(
        str(tmp_path / "corpus"),
        SyntheticWSIConfig(slides_per_class=4, min_patches=40,
                           max_patches=70, dim=64, seed=9, signal=0.9),
        shots=(1,), n_folds=1, val_per_class=1, test_per_class=1)
    np.savez(tmp_path / "w.npz", weights=corpus["weights"])
    np.savez(tmp_path / "w_ext.npz", weights=corpus["weights_ext"])

    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=20, topk=5,
                    feature_dim=64)
    _, params = init_senet(jax.random.PRNGKey(3), cfg)
    ckpt = str(tmp_path / "senet.msgpack")
    save_params(ckpt, params)

    out_dir = str(tmp_path / "viz_moc")
    assert viz_main(["--platform", "cpu", "--dataset", "nsclc",
                     "--feature_dir", corpus["data_dir"],
                     "--model_msgpack", ckpt, "--model_kind", "moc",
                     "--weights_npz", str(tmp_path / "w.npz"),
                     "--weights_ext_npz", str(tmp_path / "w_ext.npz"),
                     "--topj", "20", "--topk_pool", "5",
                     "--out_dir", out_dir, "--topk", "4",
                     "--downsample", "64"]) == 0

    slides = sorted(os.path.splitext(os.path.basename(p))[0]
                    for p in _glob.glob(os.path.join(
                        corpus["data_dir"], "h5_files", "*.h5")))
    assert slides
    sid = slides[0]
    for suffix in (["moc_union"] +
                   [f"moc_w_{n}" for n in ("topk", "delta_softmax",
                                           "delta_diff", "bottomk")] +
                   [f"moc_heatmap_c{c}" for c in range(2)]):
        assert os.path.exists(os.path.join(out_dir, f"{sid}_{suffix}.png")), suffix
    rows = open(os.path.join(
        out_dir, f"{sid}_moc_topk.csv")).read().splitlines()
    assert rows[0] == "class,rank,x,y,score"
    assert len(rows) == 1 + 2 * 4

    # library semantics: union is the exact selection mask; every CSV coord
    # is union-eligible; senet weights are sigmoid outputs in (0, 1)
    bag = read_bag_h5(os.path.join(corpus["data_dir"], "h5_files",
                                   f"{sid}.h5"))
    feats = np.asarray(bag.features, np.float32)
    maps, fused = moc_patch_maps(
        params, feats, np.ones(feats.shape[0], bool),
        corpus["weights"], corpus["weights_ext"], cfg)
    assert set(maps) == {"union", "w_topk", "w_delta_softmax",
                         "w_delta_diff", "w_bottomk"}
    assert fused.shape == (feats.shape[0], 2)
    assert maps["union"].max() == 1.0
    for n in ("topk", "delta_softmax", "delta_diff", "bottomk"):
        assert 0.0 < maps[f"w_{n}"].min() and maps[f"w_{n}"].max() < 1.0
    coords = np.asarray(bag.coords)
    union_coords = {(int(x), int(y)) for x, y in coords[maps["union"] > 0.5]}
    for r in rows[1:]:
        cls, rank, x, y, score = r.split(",")
        assert (int(x), int(y)) in union_coords

    # topk larger than the union: the CSV caps at the union size — no
    # -inf-gated (ineligible) rows with finite-looking scores sneak in
    from moc_tpu.cli.visualize import visualize_slide_moc

    small_dir = tmp_path / "viz_moc_small_union"
    small_dir.mkdir()
    n_union = int((maps["union"] > 0.5).sum())
    visualize_slide_moc(
        bag, str(small_dir), moc_cfg=cfg, senet_params=params,
        w=corpus["weights"], w_ext=corpus["weights_ext"],
        topk=n_union + 50, patch_size=256, downsample=64,
        temperature=56.3477)
    small_rows = (small_dir / f"{sid}_moc_topk.csv").read_text().splitlines()
    assert len(small_rows) == 1 + 2 * n_union
    for r in small_rows[1:]:
        _, _, x, y, _ = r.split(",")
        assert (int(x), int(y)) in union_coords


def test_visualize_cli_sizes_json(tmp_path):
    """--sizes_json writes the reference wsi_size.py scan ({slide: [w, h]})
    from bag coords alone — no weights or model needed."""
    import json as _json

    from moc_tpu.cli.visualize import main as viz_main
    from moc_tpu.data import make_synthetic_corpus
    from moc_tpu.data.bags import read_bag_h5
    from moc_tpu.data.synthetic import SyntheticWSIConfig
    from moc_tpu.viz import slide_extent

    corpus = make_synthetic_corpus(
        str(tmp_path / "corpus"),
        SyntheticWSIConfig(slides_per_class=3, min_patches=30,
                           max_patches=60, dim=32, seed=2, signal=0.9),
        shots=(1,), n_folds=1, val_per_class=1, test_per_class=1)
    out_dir = str(tmp_path / "viz")
    assert viz_main(["--platform", "cpu", "--feature_dir",
                     corpus["data_dir"], "--out_dir", out_dir,
                     "--sizes_json", "sizes.json"]) == 0
    sizes = _json.load(open(os.path.join(out_dir, "sizes.json")))
    assert len(sizes) == 6
    sid = sorted(sizes)[0]
    bag = read_bag_h5(os.path.join(corpus["data_dir"], "h5_files",
                                   f"{sid}.h5"))
    w, h = slide_extent(np.asarray(bag.coords), 256)
    assert sizes[sid] == [int(w), int(h)]
