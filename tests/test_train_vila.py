"""ViLa-MIL fold trainer on separable synthetic dual-scale bags
(ref train_loop_vila / validate_vila in utils/core_utils.py)."""

import jax
import numpy as np
import pytest

from moc_tpu.data.vila_data import DualScaleBag
from moc_tpu.models.vila import VilaConfig, build_prompt_constants
from moc_tpu.train.vila import VilaTrainConfig, train_vila_fold
from moc_tpu.zeroshot.text_tower import TextConfig
from moc_tpu.zeroshot.tokenizer import ConchTokenizer

D = 24
SMALL_TEXT = TextConfig(context_length=128, vocab_size=32007, width=48,
                        heads=4, layers=1, output_dim=D)


def _dual_bag(rng, label, n=64, n_valid=48):
    # class-dependent mean shift on both scales → linearly separable
    mu = np.zeros(D, np.float32)
    mu[: D // 2] = 1.5 if label == 0 else -1.5
    def one(scale_shift):
        f = rng.normal(size=(n, D)).astype(np.float32) + mu + scale_shift
        f[n_valid:] = 0.0
        return f, (np.arange(n) < n_valid)
    fs, ms = one(0.0)
    fl, ml = one(0.25)
    import jax.numpy as jnp
    return DualScaleBag(feats_s=jnp.asarray(fs), mask_s=jnp.asarray(ms),
                        feats_l=jnp.asarray(fl), mask_l=jnp.asarray(ml),
                        label=jnp.asarray(label, jnp.int32))


def _prompts():
    rng = np.random.default_rng(7)
    tk = ConchTokenizer()
    table = rng.normal(size=(32007, 48)).astype(np.float32) * 0.02
    # class/scale words must land PAST token position 1+n_ctx=17: positions
    # 1..16 are replaced by the learned ctx vectors, so earlier words are
    # discarded and prompts would collapse to identical suffixes (zero grads)
    tmpl = ("an image patch of tissue sampled from a surgical resection "
            "specimen processed and stained with hematoxylin and eosin at "
            "SCALE magnification showing morphology consistent with TYPE")
    names = [tmpl.replace("TYPE", t).replace("SCALE", s)
             for s in ("low", "high") for t in ("adenocarcinoma", "squamous")]
    return build_prompt_constants(table, tk, names)


def test_prompt_collapse_warns():
    import warnings

    rng = np.random.default_rng(7)
    tk = ConchTokenizer()
    table = rng.normal(size=(32007, 48)).astype(np.float32) * 0.02
    # class word inside the discarded ctx window → identical suffixes
    names = [f"an image of {t} tissue" for t in ("adenocarcinoma", "squamous")]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        build_prompt_constants(table, tk, names)
    assert any("identical" in str(x.message) for x in w)


@pytest.mark.slow
def test_train_vila_fold_learns_separable():
    rng = np.random.default_rng(0)
    def split(n_per_class, seed_base):
        r = np.random.default_rng(seed_base)
        return [_dual_bag(r, c) for c in (0, 1) for _ in range(n_per_class)]

    splits = {"train": split(8, 1), "val": split(4, 2), "test": split(4, 3)}
    cfg = VilaTrainConfig(
        model=VilaConfig(n_classes=2, input_size=D, hidden_size=16,
                         prototype_number=4, text=SMALL_TEXT),
        lr=3e-3, max_epochs=10, seed=0,
    )
    logs = []
    res = train_vila_fold(splits, _prompts(), cfg, log=logs.append)
    assert len(logs) == 10
    assert np.isfinite(res.val_auc) and np.isfinite(res.test_auc)
    assert res.test_auc > 0.7, res
    assert res.stop_epoch == 10
    # best-val params were restored and are host-side pytrees
    leaves = jax.tree_util.tree_leaves(res.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)

    # standalone checkpoint eval reproduces the fold's test metrics
    from moc_tpu.train.vila import evaluate_vila

    ev = evaluate_vila(cfg, jax.device_put(res.params), splits["test"], _prompts())
    assert abs(ev["auc"] - res.test_auc) < 1e-9
    assert abs(ev["acc"] - res.test_acc) < 1e-9
    assert ev["probs"].shape == (8, 2)
