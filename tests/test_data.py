"""Tests for moc_tpu.data: bag IO, tables, splits, batching, loaders."""

import numpy as np
import pytest

from moc_tpu.data import (
    Bag,
    BagLoader,
    EpisodeBags,
    SlideTable,
    Split,
    bucket_size,
    generate_fewshot_splits,
    make_synthetic_corpus,
    pack_bags,
    read_bag,
    read_split_csv,
    write_bag_h5,
    write_split_csv,
)
from moc_tpu.data.synthetic import SyntheticWSIConfig


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    cfg = SyntheticWSIConfig(slides_per_class=8, min_patches=100, max_patches=500, seed=3)
    return make_synthetic_corpus(str(root), cfg, shots=(1, 2), n_folds=2,
                                 val_per_class=2, test_per_class=3)


def test_bag_roundtrip(tmp_path):
    feats = np.random.default_rng(0).normal(size=(37, 16)).astype(np.float32)
    coords = np.arange(74, dtype=np.int32).reshape(37, 2)
    write_bag_h5(str(tmp_path / "h5_files" / "s1.h5"), feats, coords)
    bag = read_bag(str(tmp_path), "s1", use_h5=True)
    np.testing.assert_allclose(bag.features, feats)
    np.testing.assert_array_equal(bag.coords, coords)
    assert bag.slide_id == "s1"
    assert bag.n_patches == 37 and bag.dim == 16


def test_slide_table(corpus):
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    assert len(table) == 16
    assert table.num_classes == 2
    assert len(table.class_indices(0)) == 8
    sub = table.subset_by_slide_ids(table.slide_ids[:3])
    assert len(sub) == 3
    # patient voting: each case has one slide here
    assert len(table.patient_table()) == 16


def test_table_ignore_and_label_col(tmp_path):
    import pandas as pd

    df = pd.DataFrame({
        "case_id": ["a", "b", "c"],
        "slide_id": ["001", "002", "003"],  # zero-padded: must stay strings
        "cls": ["x", "y", "skip"],
    })
    p = tmp_path / "t.csv"
    df.to_csv(p, index=False)
    table = SlideTable.from_csv(str(p), {"x": 0, "y": 1}, label_col="cls", ignore=["skip"])
    assert len(table) == 2
    assert list(table.slide_ids) == ["001", "002"]
    assert list(table.labels) == [0, 1]


def test_split_csv_roundtrip(tmp_path):
    split = Split(("a", "b"), ("c",), ("d", "e", "f"))
    p = str(tmp_path / "s.csv")
    write_split_csv(p, split)
    back = read_split_csv(p)
    assert back == split
    p2 = str(tmp_path / "s_bool.csv")
    write_split_csv(p2, split, boolean_style=True)
    back2 = read_split_csv(p2)
    assert set(back2.train) == {"a", "b"}
    assert set(back2.val) == {"c"}
    assert set(back2.test) == {"d", "e", "f"}


def test_fewshot_split_generation(corpus):
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    splits = generate_fewshot_splits(table, shot=2, n_splits=3,
                                     val_num=[2, 2], test_num=[3, 3], seed=11)
    assert len(splits) == 3
    for s in splits:
        s.check_disjoint()
        assert len(s.train) == 4  # 2 shots x 2 classes
        assert len(s.val) == 4
        assert len(s.test) == 6
        tr_labels = [table.label_of(sid) for sid in s.train]
        assert sorted(tr_labels) == [0, 0, 1, 1]
    # seeded: regeneration is identical
    again = generate_fewshot_splits(table, shot=2, n_splits=3,
                                    val_num=[2, 2], test_num=[3, 3], seed=11)
    assert splits == again


def test_bucket_size():
    assert bucket_size(1) == 512
    assert bucket_size(512) == 512
    assert bucket_size(513) == 1024
    assert bucket_size(200_000) == 200_192  # beyond buckets: next mult of 512
    assert bucket_size(200_000) % 512 == 0


def test_pack_bags_padding():
    rng = np.random.default_rng(0)
    bags = [
        Bag("a", rng.normal(size=(100, 8)).astype(np.float32), label=0),
        Bag("b", rng.normal(size=(300, 8)).astype(np.float32), label=1),
    ]
    batch = pack_bags(bags, device_put=False)
    assert batch.features.shape == (2, 512, 8)
    assert batch.mask.shape == (2, 512)
    assert int(batch.mask[0].sum()) == 100
    assert int(batch.mask[1].sum()) == 300
    assert list(batch.labels) == [0, 1]
    # pad rows are zero
    assert float(np.abs(np.asarray(batch.features[0, 100:])).sum()) == 0.0


def test_loader_and_episode(corpus):
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"], cache=True)
    split = read_split_csv(corpus["split_paths"][(2, 0)])
    ep = EpisodeBags.load(loader, split.train, split.val, split.test,
                          repeat_num=2 * 2, eval_batch_size=4)
    assert ep.train.batch_size == 4
    assert ep.repeat_num == 4
    order = ep.train_epoch_order(np.random.default_rng(0))
    assert sorted(order.tolist()) == [0, 1, 2, 3]
    n_val = sum(int((b.labels >= 0).sum()) for b in ep.val)
    n_test = sum(int((b.labels >= 0).sum()) for b in ep.test)
    assert n_val == 4 and n_test == 6
    # labels match the table
    for b in ep.val + ep.test:
        assert b.features.shape[0] == 4


def test_loader_batches_cover_everything(corpus):
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"])
    seen = 0
    for batch in loader.batches(batch_size=4):
        assert batch.features.shape[0] == 4
        seen += int((batch.labels >= 0).sum())
    assert seen >= len(table)  # filler duplicates possible, all real slides seen


def test_synthetic_corpus_is_separable(corpus):
    """Oracle weights must separate classes at the bag level — the property
    every end-to-end test depends on."""
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"])
    w = corpus["weights"]
    correct = 0
    for sid in table.slide_ids:
        bag = loader.read(sid)
        logits = bag.features @ w  # [N, C]
        top = np.sort(logits, axis=0)[-10:].mean(axis=0)  # top-10 mean per class
        correct += int(np.argmax(top) == table.label_of(sid))
    assert correct / len(table) >= 0.9


def test_patient_strat_splits():
    """Patient-level stratification keeps all of a patient's slides in one split."""
    import pandas as pd

    rows = []
    for p in range(12):
        label = "x" if p < 6 else "y"
        for s in range(2):  # two slides per patient
            rows.append({"case_id": f"p{p:02d}", "slide_id": f"p{p:02d}_s{s}",
                         "label": label})
    df = pd.DataFrame(rows)
    table = SlideTable.from_frame(df, {"x": 0, "y": 1})
    from moc_tpu.data import generate_splits

    splits = generate_splits(table, n_splits=2, val_num=[1, 1], test_num=[2, 2],
                             patient_strat=True, seed=5)
    for s in splits:
        s.check_disjoint()
        for part in (s.train, s.val, s.test):
            cases = {sid.rsplit("_", 1)[0] for sid in part}
            # every selected patient contributes BOTH slides
            assert len(part) == 2 * len(cases)
        assert len(s.val) == 4 and len(s.test) == 8  # (1+1, 2+2 patients) x 2 slides


def test_bagloader_sharded_batches(tmp_path):
    """shard=(i, k) splits slides disjointly and covers the table."""
    from moc_tpu.data import BagLoader, SlideTable, make_synthetic_corpus
    from moc_tpu.data.synthetic import SyntheticWSIConfig

    corpus = make_synthetic_corpus(
        str(tmp_path), SyntheticWSIConfig(slides_per_class=5, min_patches=40,
                                          max_patches=70, dim=16, seed=0),
        shots=(1,), n_folds=1, val_per_class=1, test_per_class=1)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"])

    def slide_set(shard):
        ids = set()
        for b in loader.batches(batch_size=2, shard=shard):
            labels = np.asarray(b.labels)
            n = np.asarray(b.n_patches)
            ids.update((int(l), int(k)) for l, k in zip(labels, n) if l >= 0)
        return ids

    full = slide_set(None)
    s0 = slide_set((0, 2))
    s1 = slide_set((1, 2))
    assert s0 | s1 == full
    # bag identities (label, n_patches) are unique enough in this corpus to
    # check disjointness by total count
    n_full = sum(1 for b in loader.batches(batch_size=1)
                 if int(np.asarray(b.labels)[0]) >= 0)
    n0 = sum(1 for b in loader.batches(batch_size=1, shard=(0, 2))
             if int(np.asarray(b.labels)[0]) >= 0)
    n1 = sum(1 for b in loader.batches(batch_size=1, shard=(1, 2))
             if int(np.asarray(b.labels)[0]) >= 0)
    assert n0 + n1 == n_full


def test_append_hdf5_streaming(tmp_path):
    """save_hdf5 semantics (ref utils/file_utils.py:16-34): create-resizable
    on first write with attrs, append along axis 0 afterwards."""
    import h5py

    from moc_tpu.data import append_hdf5

    path = str(tmp_path / "stream.h5")
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.arange(12, 24, dtype=np.float32).reshape(3, 4)
    append_hdf5(path, {"features": a, "coords": np.ones((3, 2), np.int32)},
                attr_dict={"features": {"patch_size": 256}})
    append_hdf5(path, {"features": b, "coords": 2 * np.ones((3, 2), np.int32)})
    with h5py.File(path, "r") as f:
        np.testing.assert_array_equal(f["features"][:], np.concatenate([a, b]))
        assert f["coords"].shape == (6, 2)
        assert f["features"].attrs["patch_size"] == 256
        assert f["features"].maxshape == (None, 4)


def test_pkl_roundtrip(tmp_path):
    from moc_tpu.data import load_pkl, save_pkl

    p = str(tmp_path / "x.pkl")
    save_pkl(p, {"a": [1, 2], "b": "c"})
    assert load_pkl(p) == {"a": [1, 2], "b": "c"}


def test_points_in_polygon_square_and_triangle():
    from moc_tpu.data.regions import points_in_polygon

    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    pts = np.array([[5, 5], [15, 5], [-1, 2], [9.9, 9.9], [5, 10.1]])
    np.testing.assert_array_equal(
        points_in_polygon(pts, square), [True, False, False, True, False])
    tri = np.array([[0, 0], [10, 0], [0, 10]])
    pts = np.array([[1, 1], [6, 6], [4, 4], [9, 0.5]])
    np.testing.assert_array_equal(
        points_in_polygon(pts, tri), [True, False, True, True])


def test_region_grid_contour_modes():
    """Hard ⊆ easy ⊆ everything; holes subtract; center mode matches a
    manual oracle on a square."""
    from moc_tpu.data.regions import RegionGrid, grid_coords

    square = np.array([[0, 0], [1000, 0], [1000, 1000], [0, 1000]])
    hole = [np.array([[400, 400], [600, 400], [600, 600], [400, 600]])]

    center = RegionGrid([square], patch_size=256, step_size=256,
                        contour_fn="center")
    # manual oracle: centers at coord+128 must lie in [0,1000]^2
    grid = grid_coords((0, 0), (1000, 1000), 256, 256)
    expect = grid[((grid + 128) <= 1000).all(axis=1)]
    np.testing.assert_array_equal(np.sort(center.coords, axis=0),
                                  np.sort(expect, axis=0))

    hard = RegionGrid([square], patch_size=256, step_size=256,
                      contour_fn="four_pt_hard", use_center_shift=True)
    easy = RegionGrid([square], patch_size=256, step_size=256,
                      contour_fn="four_pt_easy", use_center_shift=True)
    hard_set = {tuple(c) for c in hard.coords}
    easy_set = {tuple(c) for c in easy.coords}
    assert hard_set <= easy_set
    assert len(hard) > 0

    # hole must cover a grid center (centers are at 128 + 256k): use (384, 384)
    hole = [np.array([[300, 300], [500, 300], [500, 500], [300, 500]])]
    holed = RegionGrid([square], holes=[hole], patch_size=256, step_size=256,
                       contour_fn="center")
    assert len(holed) < len(center)
    # patches whose center falls in the hole are gone
    centers = holed.coords + 128
    inside_hole = ((centers >= 300) & (centers < 500)).all(axis=1)
    assert not inside_hole.any()


def test_region_grid_read_batches_and_downsample():
    from moc_tpu.data.regions import IMAGENET_MEAN, IMAGENET_STD, RegionGrid

    square = np.array([[0, 0], [64, 0], [64, 64], [0, 64]])
    rg = RegionGrid([square], patch_size=16, step_size=16, contour_fn="basic",
                    custom_downsample=2)
    assert rg.read_size == 32

    canvas = np.arange(128 * 128 * 3, dtype=np.uint8).reshape(128, 128, 3)

    def reader(coord, size):
        x, y = coord
        return canvas[y:y + size, x:x + size]

    batches = list(rg.read_batches(reader, batch_size=4, normalize=False))
    patches = np.concatenate([p for p, _ in batches])
    coords = np.concatenate([c for _, c in batches])
    assert patches.shape == (len(rg), 16, 16, 3)
    assert len(coords) == len(rg)
    # 2x2 mean pooling oracle on the first patch
    x, y = int(coords[0][0]), int(coords[0][1])
    raw = canvas[y:y + 32, x:x + 32].astype(np.float32)
    oracle = raw.reshape(16, 2, 16, 2, 3).mean((1, 3))
    np.testing.assert_allclose(patches[0], oracle, rtol=1e-6)

    normed = next(iter(rg.read_batches(reader, batch_size=4)))[0]
    un = normed[0] * IMAGENET_STD + IMAGENET_MEAN
    np.testing.assert_allclose(un * 255.0, oracle, atol=1e-3)


def test_episode_bags_host_resident_eval(tmp_path):
    """Above the eval HBM budget, eval chunks stay host numpy and the
    episode still evaluates identically (lazy per-call transfer)."""
    import jax

    from moc_tpu.data import BagLoader, EpisodeBags, SlideTable, make_synthetic_corpus
    from moc_tpu.data.synthetic import SyntheticWSIConfig
    from moc_tpu.data.splits import read_split_csv
    from moc_tpu.moc import MOCConfig, run_episode

    cfg_data = SyntheticWSIConfig(slides_per_class=6, min_patches=100,
                                  max_patches=220, dim=32, seed=2, signal=0.9)
    corpus = make_synthetic_corpus(str(tmp_path), cfg_data, shots=(1,), n_folds=1,
                                   val_per_class=1, test_per_class=2)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"], cache=True)
    split = read_split_csv(corpus["split_paths"][(1, 0)])

    dev = EpisodeBags.load(loader, split.train, split.val, split.test,
                           repeat_num=2)
    host = EpisodeBags.load(loader, split.train, split.val, split.test,
                            repeat_num=2, eval_device_budget_gb=0.0)
    assert isinstance(dev.val[0].features, jax.Array)
    assert isinstance(host.val[0].features, np.ndarray)
    # train batch is always device-resident
    assert isinstance(host.train.features, jax.Array)

    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=16, topk=8,
                    num_epochs=2, feature_dim=32)
    r_dev = run_episode(dev, corpus["weights"], corpus["weights_ext"], cfg, seed=0)
    r_host = run_episode(host, corpus["weights"], corpus["weights_ext"], cfg, seed=0)
    assert r_dev.best_val == r_host.best_val
    assert r_dev.test_at_best_val == r_host.test_at_best_val


def test_stream_batches_matches_batches(tmp_path):
    """The streaming loader yields the same bucketed batches as the eager
    one (metadata-driven bucketization, lookahead reads) and the prefetch
    wrapper is a pass-through."""
    from moc_tpu.data import BagLoader, SlideTable, make_synthetic_corpus, prefetch_to_device
    from moc_tpu.data.synthetic import SyntheticWSIConfig

    cfg_data = SyntheticWSIConfig(slides_per_class=7, min_patches=100,
                                  max_patches=900, dim=16, seed=6)
    corpus = make_synthetic_corpus(str(tmp_path), cfg_data, shots=(1,), n_folds=1,
                                   val_per_class=1, test_per_class=1)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"])

    eager = list(loader.batches(batch_size=4))
    stream = list(loader.stream_batches(batch_size=4))
    assert len(eager) == len(stream)
    for a, b in zip(eager, stream):
        assert a.features.shape == b.features.shape
        np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
        np.testing.assert_allclose(np.asarray(a.features), np.asarray(b.features))
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))

    pre = list(prefetch_to_device(loader.stream_batches(batch_size=4), depth=2))
    assert len(pre) == len(eager)
    np.testing.assert_allclose(np.asarray(pre[0].features),
                               np.asarray(eager[0].features))

    # sharding covers the table disjointly in streaming mode too
    ids = set()
    for s in range(3):
        for batch in loader.stream_batches(batch_size=2, shard=(s, 3)):
            ids.update(int(l) for l in np.asarray(batch.n_patches))
    total = sum(1 for _ in loader.stream_batches(batch_size=2))
    assert total == len(list(loader.batches(batch_size=2)))


def test_bag_cache_budget_evicts_lru(tmp_path):
    from moc_tpu.data import BagLoader, SlideTable, make_synthetic_corpus
    from moc_tpu.data.synthetic import SyntheticWSIConfig

    cfg_data = SyntheticWSIConfig(slides_per_class=4, min_patches=200,
                                  max_patches=200, dim=64, seed=9)
    corpus = make_synthetic_corpus(str(tmp_path), cfg_data, shots=(1,), n_folds=1,
                                   val_per_class=1, test_per_class=1)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    bag_bytes = 200 * 64 * 4
    budget_gb = (2 * bag_bytes + 1000) / 2**30  # room for ~2 bags + coords
    loader = BagLoader(table, corpus["data_dir"], cache=True,
                       cache_budget_gb=budget_gb)
    ids = list(table.slide_ids)
    for sid in ids[:4]:
        loader.read(sid)
    assert len(loader._cache) <= 3  # evicted down toward the budget
    # most-recently-read stays; the LRU victim was the oldest
    assert ids[3] in loader._cache and ids[0] not in loader._cache
    # reads still correct after eviction
    bag = loader.read(ids[0])
    assert bag.features.shape == (200, 64)
