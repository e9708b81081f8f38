"""Tests for the fused (vmapped) episode sweep."""

import jax
import numpy as np
import pytest

from moc_tpu.data import BagLoader, EpisodeBags, SlideTable, make_synthetic_corpus, read_split_csv
from moc_tpu.data.synthetic import SyntheticWSIConfig
from moc_tpu.moc import MOCConfig
from moc_tpu.moc.sweep import episode_from_bags, run_sweep, stack_episodes


@pytest.fixture(scope="module")
def sweep_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweep_corpus")
    cfg_data = SyntheticWSIConfig(slides_per_class=10, min_patches=150, max_patches=450,
                                  dim=64, seed=11, signal=0.9)
    corpus = make_synthetic_corpus(str(root), cfg_data, shots=(2,), n_folds=2,
                                   val_per_class=2, test_per_class=3)
    table = SlideTable.from_csv(corpus["csv_path"], corpus["label_dict"])
    loader = BagLoader(table, corpus["data_dir"], cache=True)
    episodes = []
    for fold in range(2):
        split = read_split_csv(corpus["split_paths"][(2, fold)])
        ep = EpisodeBags.load(loader, split.train, split.val, split.test,
                              repeat_num=4, eval_batch_size=4)
        episodes.append(episode_from_bags(ep.train, ep.val, ep.test))
    # common shapes across folds: repad bags to the max over folds
    n_max = max(e.train_feats.shape[1] for e in episodes)

    def repad(x, axis=1):
        import jax.numpy as jnp

        pad = n_max - x.shape[axis]
        if pad == 0 or x.ndim < 2:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    episodes = [
        jax.tree.map(lambda x: repad(x) if x.ndim >= 2 else x, e) for e in episodes
    ]
    stacked = stack_episodes(episodes)
    return corpus, stacked


@pytest.mark.slow
def test_run_sweep_two_folds(sweep_setup):
    corpus, stacked = sweep_setup
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
def test_run_sweep_on_mesh(sweep_setup):
    """Episode-parallel over a 2-device mesh slice of the virtual CPU mesh."""
    corpus, stacked = sweep_setup
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
