"""Tests for the fused (vmapped) episode sweep."""

import jax
import numpy as np
import pytest

from moc_tpu.data import BagLoader, EpisodeBags, SlideTable, make_synthetic_corpus, read_split_csv
from moc_tpu.data.synthetic import SyntheticWSIConfig
from moc_tpu.moc import MOCConfig, run_episode
from moc_tpu.moc.sweep import (
    episode_from_bags,
    pad_and_stack_episodes,
    run_sweep,
    sweep_episode_results,
)


@pytest.fixture(scope="module")
def sweep_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweep_corpus")
    cfg_data = SyntheticWSIConfig(slides_per_class=10, min_patches=150, max_patches=450,
                                  dim=64, seed=11, signal=0.9)
    corpus = make_synthetic_corpus(str(root), cfg_data, shots=(2,), n_folds=2,
                                   val_per_class=2, test_per_class=3)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"], cache=True)
    episode_bags = []
    for fold in range(2):
        split = read_split_csv(corpus["split_paths"][(2, fold)])
        ep = EpisodeBags.load(loader, split.train, split.val, split.test,
                              repeat_num=4, eval_batch_size=4)
        episode_bags.append(ep)
    stacked = pad_and_stack_episodes(
        [episode_from_bags(ep.train, ep.val, ep.test) for ep in episode_bags]
    )
    return corpus, stacked, episode_bags


def test_pad_and_stack_shapes(sweep_setup):
    _, stacked, episode_bags = sweep_setup
    assert stacked.train_feats.shape[0] == 2  # episode axis
    eps = [episode_from_bags(ep.train, ep.val, ep.test) for ep in episode_bags]
    # rows appended by pad_and_stack (beyond each episode's own size) must be
    # label -1 with an all-False mask; original rows must be untouched
    for name in ("val", "test"):
        labels = np.asarray(getattr(stacked, f"{name}_labels"))
        mask = np.asarray(getattr(stacked, f"{name}_mask"))
        for i, ep in enumerate(eps):
            own_m = np.asarray(getattr(ep, f"{name}_labels")).shape[0]
            own_n = np.asarray(getattr(ep, f"{name}_mask")).shape[1]
            np.testing.assert_array_equal(
                labels[i, :own_m], np.asarray(getattr(ep, f"{name}_labels")))
            assert np.all(labels[i, own_m:] == -1)
            assert not mask[i, own_m:, :].any()
            assert not mask[i, :, own_n:].any()


def test_pad_and_stack_rejects_mixed_shots(sweep_setup):
    _, _, episode_bags = sweep_setup
    eps = [episode_from_bags(ep.train, ep.val, ep.test) for ep in episode_bags]
    shrunk = type(eps[1])(
        train_feats=eps[1].train_feats[:2], train_mask=eps[1].train_mask[:2],
        train_labels=eps[1].train_labels[:2], val_feats=eps[1].val_feats,
        val_mask=eps[1].val_mask, val_labels=eps[1].val_labels,
        test_feats=eps[1].test_feats, test_mask=eps[1].test_mask,
        test_labels=eps[1].test_labels,
    )
    with pytest.raises(ValueError, match="one shot at a time"):
        pad_and_stack_episodes([eps[0], shrunk])


@pytest.mark.slow
def test_run_sweep_two_folds(sweep_setup):
    corpus, stacked, _ = sweep_setup
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=24, topk=10,
                    num_epochs=4, feature_dim=64)
    result = run_sweep(stacked, corpus["weights"], corpus["weights_ext"], cfg, repeat_num=4)
    best_val = np.asarray(result.best_val_auc)
    test_auc = np.asarray(result.test_auc_at_best)
    assert best_val.shape == (2,)
    assert np.all(best_val > 0.5)
    assert np.all(test_auc >= 0.7), f"separable corpus must classify: {test_auc}"
    assert np.all(np.asarray(result.best_epoch) < cfg.num_epochs)


@pytest.mark.slow
def test_fused_matches_streaming(sweep_setup):
    """The fused sweep and the streaming run_episode share RNG derivation and
    must produce the same best-val/test selections per fold."""
    corpus, stacked, episode_bags = sweep_setup
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=24, topk=10,
                    num_epochs=3, feature_dim=64)
    import jax.numpy as jnp

    fused = run_sweep(stacked, corpus["weights"], corpus["weights_ext"], cfg,
                      repeat_num=4, seeds=jnp.asarray([0, 1], jnp.int32))
    results = sweep_episode_results(fused)
    for fold, ep in enumerate(episode_bags):
        stream = run_episode(ep, corpus["weights"], corpus["weights_ext"], cfg,
                             seed=fold, check_zeroshot=False)
        f = results[fold]
        assert f.best_epoch == stream.best_epoch, (fold, f, stream)
        np.testing.assert_allclose(f.best_val, stream.best_val, atol=1e-5)
        np.testing.assert_allclose(f.test_at_best_val, stream.test_at_best_val, atol=1e-5)
        np.testing.assert_allclose(f.test_acc_at_best_val, stream.test_acc_at_best_val,
                                   atol=1e-5)
        # best-val params must match too (same init, same per-slide masks)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    rtol=1e-5, atol=1e-6),
            f.params, stream.params,
        )


@pytest.mark.slow
def test_run_sweep_on_mesh(sweep_setup):
    """Episode-parallel over a 2-device mesh slice of the virtual CPU mesh."""
    corpus, stacked, _ = sweep_setup
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=24, topk=10,
                    num_epochs=2, feature_dim=64)
    devices = np.array(jax.devices()[:2])
    mesh = jax.sharding.Mesh(devices, ("data",))
    result = run_sweep(stacked, corpus["weights"], corpus["weights_ext"], cfg,
                       repeat_num=4, mesh=mesh)
    no_mesh = run_sweep(stacked, corpus["weights"], corpus["weights_ext"], cfg, repeat_num=4)
    np.testing.assert_allclose(
        np.asarray(result.best_val_auc), np.asarray(no_mesh.best_val_auc), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(result.test_auc_at_best), np.asarray(no_mesh.test_auc_at_best), rtol=1e-4
    )


def test_stack_episode_bags_matches_two_stage(sweep_setup):
    """The one-pass stacker equals episode_from_bags + pad_and_stack (the
    CLI's host stacking path; composed pair kept as the oracle)."""
    from moc_tpu.moc import stack_episode_bags

    _, stacked, episode_bags = sweep_setup
    fast = stack_episode_bags(episode_bags)
    for name in ("train_feats", "train_mask", "train_labels", "val_feats",
                 "val_mask", "val_labels", "test_feats", "test_mask",
                 "test_labels"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fast, name)), np.asarray(getattr(stacked, name)),
            err_msg=name)


def test_stackers_trim_filler_fuzz():
    """Property fuzz of the filler-trim invariants: for random chunk layouts
    (odd buckets, filler-heavy chunks, whole-chunk filler), both stackers
    agree, keep exactly the real slides in order, and carry no filler
    between episodes beyond the cross-episode max."""
    import jax.numpy as jnp

    from moc_tpu.data.batching import BagBatch
    from moc_tpu.moc import stack_episode_bags
    from moc_tpu.moc.sweep import episode_from_bags, pad_and_stack_episodes

    rng = np.random.default_rng(7)

    def chunk(n_rows, n_real, n_patches, d=8):
        labels = np.full((n_rows,), -1, np.int32)
        labels[:n_real] = rng.integers(0, 2, n_real)
        feats = rng.normal(size=(n_rows, n_patches, d)).astype(np.float32)
        mask = rng.random((n_rows, n_patches)) < 0.8
        mask[n_real:] = False
        feats[~mask] = 0.0
        return BagBatch(features=jnp.asarray(feats), mask=jnp.asarray(mask),
                        labels=jnp.asarray(labels),
                        n_patches=jnp.asarray(mask.sum(1), jnp.int32))

    class Ep:
        def __init__(self, train, val, test):
            self.train, self.val, self.test = train, val, test

    for trial in range(4):
        eps = []
        for _ in range(3):
            train = chunk(4, 4, int(rng.integers(6, 20)))
            val = [chunk(int(rng.integers(2, 6)), int(rng.integers(0, 3)),
                         int(rng.integers(6, 20))) for _ in range(2)]
            test = [chunk(int(rng.integers(2, 6)), int(rng.integers(1, 3)),
                          int(rng.integers(6, 20)))]
            eps.append(Ep(train, val, test))
        fast = stack_episode_bags(eps)
        slow = pad_and_stack_episodes(
            [episode_from_bags(ep.train, ep.val, ep.test) for ep in eps])
        for name in ("train_feats", "train_mask", "train_labels", "val_feats",
                     "val_mask", "val_labels", "test_feats", "test_mask",
                     "test_labels"):
            np.testing.assert_array_equal(
                np.asarray(getattr(fast, name)), np.asarray(getattr(slow, name)),
                err_msg=f"trial {trial}: {name}")
        # row budget: exactly max-over-episodes of the real-slide count
        for split in ("val", "test"):
            reals = [sum(int((np.asarray(c.labels) >= 0).sum())
                         for c in getattr(ep, split)) for ep in eps]
            assert getattr(fast, f"{split}_labels").shape[1] == max(max(reals), 1)
            # real slides survive in original order
            for i, ep in enumerate(eps):
                want = np.concatenate(
                    [np.asarray(c.labels)[np.asarray(c.labels) >= 0]
                     for c in getattr(ep, split)])
                got = np.asarray(getattr(fast, f"{split}_labels"))[i][:len(want)]
                np.testing.assert_array_equal(got, want)


def _pooled_setup(corpus):
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"], cache=True)
    splits = [read_split_csv(corpus["split_paths"][(2, f)]) for f in range(2)]
    return loader, splits


def test_pool_episode_splits_dedupe(sweep_setup):
    """The pool holds each unique slide ONCE; index rows gather exactly that
    slide's padded bag; labels ride the index matrices."""
    from moc_tpu.moc import pool_episode_splits, unique_split_ids

    corpus, _, _ = sweep_setup
    loader, splits = _pooled_setup(corpus)
    ids = unique_split_ids(splits)
    total_rows = sum(len(s.train) + len(s.val) + len(s.test) for s in splits)
    assert len(ids) < total_rows  # folds share corpus slides -> pool shrinks
    pooled = pool_episode_splits(loader, splits)
    assert pooled.pool_feats.shape[0] == len(ids)
    for i, s in enumerate(splits):
        for split_name, idx, lab in (
            ("train", pooled.index.train_idx, pooled.index.train_labels),
            ("val", pooled.index.val_idx, pooled.index.val_labels),
            ("test", pooled.index.test_idx, pooled.index.test_labels),
        ):
            for j, sid in enumerate(getattr(s, split_name)):
                bag = loader.read(sid)
                feats = np.asarray(pooled.pool_feats[int(idx[i, j])])
                np.testing.assert_array_equal(feats[: bag.n_patches], bag.features)
                assert not feats[bag.n_patches:].any()
                assert int(lab[i, j]) == bag.label


def test_pool_episode_bags_ragged_filler():
    """Folds with unequal val/test sizes pad with label -1 rows (the
    StackedEpisode filler convention) and refuse mixed train sizes."""
    from moc_tpu.data.bags import Bag
    from moc_tpu.moc import pool_episode_bags

    rng = np.random.default_rng(3)
    ids = [f"s{i}" for i in range(6)]
    bags = [Bag(slide_id=sid, features=rng.normal(size=(10 + i, 8)).astype(np.float32),
                label=i % 2) for i, sid in enumerate(ids)]

    class S:
        def __init__(self, train, val, test):
            self.train, self.val, self.test = train, val, test

    splits = [S(["s0", "s1"], ["s2", "s3"], ["s4"]),
              S(["s1", "s2"], ["s3"], ["s4", "s5"])]
    pooled = pool_episode_bags(bags, ids, splits)
    ix = pooled.index
    assert ix.val_labels.shape == (2, 2) and ix.test_labels.shape == (2, 2)
    assert int(ix.val_labels[1, 1]) == -1  # fold 1 has one val slide
    assert int(ix.test_labels[0, 1]) == -1
    # shared slide s1 resolves to the same pool row in both folds
    assert int(ix.train_idx[0, 1]) == int(ix.train_idx[1, 0]) == 1
    with pytest.raises(ValueError, match="one shot at a time"):
        pool_episode_bags(bags, ids, [splits[0], S(["s0"], ["s2"], ["s4"])])


@pytest.mark.slow
def test_pooled_matches_stacked(sweep_setup):
    """run_sweep_pooled (deduped transfer + on-device gather assembly) must
    reproduce the stacked sweep: same best-val/test metrics, epochs, params,
    and in-program zero-shot floor."""
    from moc_tpu.moc import pool_episode_splits, run_sweep_pooled

    corpus, stacked, _ = sweep_setup
    loader, splits = _pooled_setup(corpus)
    pooled = pool_episode_splits(loader, splits)
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=24, topk=10,
                    num_epochs=3, feature_dim=64)
    import jax.numpy as jnp

    seeds = jnp.asarray([0, 1], jnp.int32)
    a = run_sweep(stacked, corpus["weights"], corpus["weights_ext"], cfg,
                  repeat_num=4, seeds=seeds, with_zs=True)
    b = run_sweep_pooled(pooled, corpus["weights"], corpus["weights_ext"], cfg,
                         repeat_num=4, seeds=seeds, with_zs=True)
    np.testing.assert_array_equal(np.asarray(a.best_epoch), np.asarray(b.best_epoch))
    for name in ("best_val_auc", "test_auc_at_best", "test_acc_at_best", "zs"):
        np.testing.assert_allclose(np.asarray(getattr(a, name)),
                                   np.asarray(getattr(b, name)),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                rtol=1e-5, atol=1e-6),
        a.best_params, b.best_params,
    )


@pytest.mark.slow
def test_pooled_on_mesh(sweep_setup):
    """Pooled sweep episode-sharded over 2 devices == single-device (pool
    replicated, index matrices sharded)."""
    from moc_tpu.moc import pool_episode_splits, run_sweep_pooled

    corpus, _, _ = sweep_setup
    loader, splits = _pooled_setup(corpus)
    pooled = pool_episode_splits(loader, splits)
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=24, topk=10,
                    num_epochs=2, feature_dim=64)
    devices = np.array(jax.devices()[:2])
    mesh = jax.sharding.Mesh(devices, ("data",))
    sharded = run_sweep_pooled(pooled, corpus["weights"], corpus["weights_ext"],
                               cfg, repeat_num=4, mesh=mesh, with_zs=True)
    single = run_sweep_pooled(pooled, corpus["weights"], corpus["weights_ext"],
                              cfg, repeat_num=4, with_zs=True)
    np.testing.assert_array_equal(np.asarray(sharded.best_epoch),
                                  np.asarray(single.best_epoch))
    for name in ("best_val_auc", "test_auc_at_best", "zs"):
        np.testing.assert_allclose(np.asarray(getattr(sharded, name)),
                                   np.asarray(getattr(single, name)),
                                   rtol=1e-4, err_msg=name)


@pytest.mark.slow
@pytest.mark.parametrize("kw", [
    {"discard": ("bottomk",)},
    {"approx_topk": True},
    {"score_dtype": "bfloat16"},
    {"exact_impl": "gather"},
    {"select_method": "sort"},
])
def test_fused_matches_streaming_config_variants(sweep_setup, kw):
    """fused == stream holds across the perf/config tiers, not just the
    defaults (a 10-variant campaign measured 0 mismatches; the five here
    cover each knob family)."""
    corpus, stacked, episode_bags = sweep_setup
    cfg = MOCConfig(n_classes=2, n_ext_classes=6, topj=24, topk=10,
                    num_epochs=2, feature_dim=64, **kw)
    import jax.numpy as jnp

    fused = run_sweep(stacked, corpus["weights"], corpus["weights_ext"], cfg,
                      repeat_num=4, seeds=jnp.asarray([0, 1], jnp.int32))
    results = sweep_episode_results(fused)
    for fold, ep in enumerate(episode_bags):
        stream = run_episode(ep, corpus["weights"], corpus["weights_ext"], cfg,
                             seed=fold, check_zeroshot=False)
        f = results[fold]
        assert f.best_epoch == stream.best_epoch, (kw, fold)
        np.testing.assert_allclose(f.best_val, stream.best_val, atol=1e-4)
        np.testing.assert_allclose(f.test_at_best_val, stream.test_at_best_val,
                                   atol=1e-4)


def test_empty_eval_split_stacks(sweep_setup):
    """A fold with NO val (or test) rows stacks to one -1-labeled filler row
    instead of crashing — both stackers, all-empty and mixed cases."""
    import dataclasses

    from moc_tpu.moc import stack_episode_bags
    from moc_tpu.moc.sweep import episode_from_bags, pad_and_stack_episodes

    _, _, episode_bags = sweep_setup
    for emptied in (  # all episodes empty; only the FIRST episode empty
        [dataclasses.replace(ep, val=[]) for ep in episode_bags],
        [dataclasses.replace(episode_bags[0], val=[]), episode_bags[1]],
    ):
        fast = stack_episode_bags(emptied)
        slow = pad_and_stack_episodes(
            [episode_from_bags(ep.train, ep.val, ep.test) for ep in emptied])
        for stacked in (fast, slow):
            labels = np.asarray(stacked.val_labels)
            mask = np.asarray(stacked.val_mask)
            assert labels.shape[0] == 2
            assert (labels[0] == -1).all()  # first episode: all filler
            assert not mask[0].any()
            # feature dim survives for schema-consistent stacking
            assert np.asarray(stacked.val_feats).shape[-1] == np.asarray(
                stacked.train_feats).shape[-1] or (labels == -1).all()
        # real rows of the non-empty episode are preserved in the mixed case
        if any(len(ep.val) for ep in emptied):
            real = np.asarray(slow.val_labels)[1]
            assert (real >= 0).any()
            np.testing.assert_array_equal(np.asarray(fast.val_labels)[1], real)


def test_auto_mode_falls_back_on_unequal_folds(capsys):
    """cli.sweep --mode auto: a shot whose folds have UNEQUAL train splits
    (class exhausted in one fold) falls back to streaming instead of dying
    on the shape-static fused path; --mode fused still raises."""
    import argparse
    from types import SimpleNamespace

    from moc_tpu.cli import sweep as sweep_cli

    pool_ctx = SimpleNamespace(row={"a": 0, "b": 1, "c": 2},
                               labels=np.array([0, 1, 0]))
    splits = [SimpleNamespace(train=["a", "b"], val=["c"], test=["c"]),
              SimpleNamespace(train=["a"], val=["c"], test=["c"])]
    args = argparse.Namespace(mode="auto", fused_hbm_gb=6.0, seed=0,
                              check_zeroshot=False)
    assert sweep_cli.run_fused_shot(
        args, 1, [0, 1], splits=splits, pool_ctx=pool_ctx, w=None,
        w_ext=None, cfg=None, n_classes=2, shot_dir=".") is None
    args.mode = "fused"
    with pytest.raises(ValueError, match="train split sizes differ"):
        sweep_cli.run_fused_shot(
            args, 1, [0, 1], splits=splits, pool_ctx=pool_ctx, w=None,
            w_ext=None, cfg=None, n_classes=2, shot_dir=".")


def test_synthetic_corpus_keyed_on_seed(tmp_path):
    """_synthetic_setup must not pair seed-B oracle weights with seed-A
    on-disk features: a different --seed gets its own corpus root."""
    import argparse

    from moc_tpu.cli.main_moc import _synthetic_setup

    a0 = argparse.Namespace(result_dir=str(tmp_path), seed=0,
                            synthetic_classes=2, synthetic_min_patches=60,
                            synthetic_max_patches=90)
    a1 = argparse.Namespace(result_dir=str(tmp_path), seed=1,
                            synthetic_classes=2, synthetic_min_patches=60,
                            synthetic_max_patches=90)
    c0 = _synthetic_setup(a0)
    c1 = _synthetic_setup(a1)
    c0 = c0[0] if isinstance(c0, tuple) else c0
    c1 = c1[0] if isinstance(c1, tuple) else c1
    assert c0["data_dir"] != c1["data_dir"]
    # rerunning seed 0 hits its own cached corpus with MATCHING weights
    c0b = _synthetic_setup(a0)
    c0b = c0b[0] if isinstance(c0b, tuple) else c0b
    np.testing.assert_array_equal(np.asarray(c0["weights"]),
                                  np.asarray(c0b["weights"]))
