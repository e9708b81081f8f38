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
