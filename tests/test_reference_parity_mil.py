"""Chain-level parity for the baseline-MIL fold trainer vs the reference's
OWN ``core_utils.train`` (VERDICT r4 missing #2).

The component oracles pin the models and the EarlyStopping trace; these
tests drive the reference's ACTUAL fold pipeline —
``/root/reference/utils/core_utils.py:105-291`` (weighted sampler → CLAM
train loop → validate → early stop → best-ckpt reload → summary) —
end-to-end on synthetic corpora and compare against
``moc_tpu.train.mil.train_fold``:

1. **Deterministic eval-side parity on shared weights**: a seeded reference
   ``CLAM_SB`` converted torch→flax (``models/convert_mil.py``), the
   reference ``summary()`` vs ``evaluate_model`` — per-slide probs, AUC and
   error to float tolerance.
2. **Statistical fold parity** (slow): full reference ``train()`` vs
   ``train_fold`` on identical bags/splits, 3 folds — mean val/test AUC
   within tolerance (bitwise impossible: torch vs jax init/order RNG).
3. **EarlyStopping trigger parity** (slow): on a saturating corpus both
   trainers peak at epoch 0, so the hardcoded reference stopper
   (patience 20, stop_epoch 40, strict ``>`` improvement) must fire at
   exactly the same epoch as ours — a deterministic chain-level pin.

Import note: ``core_utils`` needs three harmless stubs — the conch package
stubs the oracle suite already ships, a ``nystrom_attention`` stub that
RAISES on use (the pip package does not exist offline), and a
``datasets.dataset_generic.save_splits`` no-op (the reference's local
``datasets`` dir is shadowed by the HF package; ``save_splits`` is never
called because we pass ``notsavesplit=True``).
"""

from __future__ import annotations

import argparse
import contextlib
import importlib.machinery
import io
import re
import sys
import types

import numpy as np
import pytest

import jax

from moc_tpu.data import BagLoader, SlideTable, read_split_csv
from moc_tpu.data.synthetic import SyntheticWSIConfig, make_synthetic_corpus
from moc_tpu.models.clam import ClamConfig
from moc_tpu.models.convert_mil import convert_clam_checkpoint
from moc_tpu.train.mil import MilTrainConfig, evaluate_model, train_fold

torch = pytest.importorskip("torch")

DIM = 512  # size_arg="conch" input width on both sides
N_CLASSES = 2


# ---------------------------------------------------------------------------
# reference import (read-only) + dataset bridge
# ---------------------------------------------------------------------------


def _ref_core_utils():
    sys.path.insert(0, "/root/repo")
    from tests.test_vila_oracle import _install_conch_stubs

    _install_conch_stubs()
    if "nystrom_attention" not in sys.modules:
        na = types.ModuleType("nystrom_attention")

        class NystromAttention:  # noqa: N801 — reference package name
            def __init__(self, *a, **k):
                raise ModuleNotFoundError(
                    "nystrom_attention is a stub (pip package absent "
                    "offline)")

        na.NystromAttention = NystromAttention
        sys.modules["nystrom_attention"] = na
    if "datasets" not in sys.modules or not hasattr(
            sys.modules["datasets"], "dataset_generic"):
        dg = types.ModuleType("datasets.dataset_generic")
        dg.save_splits = lambda *a, **k: None
        dg.__spec__ = importlib.machinery.ModuleSpec(
            "datasets.dataset_generic", None)
        ds = types.ModuleType("datasets")
        ds.dataset_generic = dg
        # transformers probes importlib.util.find_spec("datasets") — a
        # spec-less stub makes that raise instead of returning None
        ds.__spec__ = importlib.machinery.ModuleSpec("datasets", None)
        sys.modules["datasets"] = ds
        sys.modules["datasets.dataset_generic"] = dg
    if not hasattr(np, "Inf"):
        # the reference's EarlyStopping reads np.Inf (core_utils.py:72),
        # removed in NumPy 2 — restore the alias for the read-only import
        np.Inf = np.inf
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.refutils import bind_reference_utils

    bind_reference_utils()
    from utils import core_utils

    return core_utils


class _RefSplit(torch.utils.data.Dataset):
    """Minimal dataset satisfying ``get_split_loader``/``summary``: indexed
    ``(features, label)`` + ``slide_cls_ids``/``getlabel`` (weighted
    sampler) + ``slide_data`` frame (patient_results slide ids)."""

    def __init__(self, bags, n_classes=N_CLASSES):
        import pandas as pd

        self.bags = bags
        labels = [b.label for b in bags]
        self.slide_cls_ids = [np.where(np.array(labels) == c)[0]
                              for c in range(n_classes)]
        self.slide_data = pd.DataFrame(
            {"slide_id": [b.slide_id for b in bags]})

    def __len__(self):
        return len(self.bags)

    def __getitem__(self, i):
        return torch.tensor(self.bags[i].features), self.bags[i].label

    def getlabel(self, i):
        return self.bags[i].label


def _ref_args(results_dir: str, model_type: str, *, max_epochs: int,
              early_stopping: bool, weighted: bool, lr: float = 2e-4,
              reg: float = 1e-5) -> argparse.Namespace:
    """The ``args`` namespace ``core_utils.train`` consumes
    (``main.py``'s argparse surface, values at the reference defaults)."""
    return argparse.Namespace(
        results_dir=results_dir, log_data=False, bag_loss="ce",
        model_type=model_type, model_size="conch", drop_out=False,
        n_classes=N_CLASSES, subtyping=False, B=8, inst_loss="ce",
        no_inst_cluster=False, opt="adam", lr=lr, reg=reg,
        weighted_sample=weighted, batch_size=1, testing=False,
        early_stopping=early_stopping, max_epochs=max_epochs, bag_size=None,
        conch_init=False, conch_freeze=False, bag_weight=0.7)


def _fold_bags(corpus, fold: int, shot: int = 4):
    c, loader = corpus
    split = read_split_csv(c["split_paths"][(shot, fold)])
    bags = {name: [loader.read(s) for s in ids]
            for name, ids in (("train", split.train), ("val", split.val),
                              ("test", split.test))}
    return split, bags


def _our_loaders(corpus, split):
    c, loader = corpus
    table = loader.table

    def mk(ids):
        return lambda: BagLoader(table.subset_by_slide_ids(ids),
                                 c["data_dir"], cache=True).batches(
                                     batch_size=1)

    return {"train": mk(split.train), "val": mk(split.val),
            "test": mk(split.test)}


def _mk_corpus(tmp_path_factory, name: str, signal: float, seed: int):
    root = tmp_path_factory.mktemp(name)
    cfg = SyntheticWSIConfig(
        slides_per_class=16, min_patches=60, max_patches=120, dim=DIM,
        seed=seed, signal=signal, tumor_frac=0.25)
    c = make_synthetic_corpus(str(root), cfg, shots=(4,), n_folds=3,
                              val_per_class=4, test_per_class=6)
    table = SlideTable.from_csv(c["csv_path"], c["label_dict"])
    loader = BagLoader(table, c["data_dir"], cache=True)
    return c, loader


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Separable corpus (eval parity + the deterministic early-stop pin)."""
    return _mk_corpus(tmp_path_factory, "milparity", signal=0.6, seed=21)


@pytest.fixture(scope="module")
def hard_corpus(tmp_path_factory):
    """Tuned off the AUC ceiling for the statistical arm — at signal 0.6
    both trainers hit AUC 1.0 and the comparison proves nothing."""
    return _mk_corpus(tmp_path_factory, "milparity_hard", signal=0.12,
                      seed=23)


# ---------------------------------------------------------------------------
# 1. deterministic eval-side parity on shared weights
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("model_type", ["clam_sb", "abmil"])
def test_mil_summary_parity_shared_weights(corpus, model_type):
    """Reference ``summary()`` (the fold's final val/test evaluation,
    ``core_utils.py:734-800``) vs ``evaluate_model`` with THE SAME weights:
    per-slide probs to float tolerance, identical AUC/error."""
    core = _ref_core_utils()
    from models.model_clam import CLAM_SB

    torch.manual_seed(3)
    tmodel = CLAM_SB(size_arg="conch", dropout=False, n_classes=N_CLASSES,
                     instance_loss_fn=torch.nn.CrossEntropyLoss())
    tmodel.eval()
    params = convert_clam_checkpoint(
        tmodel.state_dict(),
        ClamConfig(n_classes=N_CLASSES, size_arg="conch"))

    split, bags = _fold_bags(corpus, fold=0)
    loader = torch.utils.data.DataLoader(
        _RefSplit(bags["test"]), batch_size=1,
        sampler=torch.utils.data.SequentialSampler(_RefSplit(bags["test"])))
    # core_utils.summary iterates (data, label) batches like collate_MIL
    with contextlib.redirect_stdout(io.StringIO()):
        patient_results, test_error, test_auc, _ = core.summary(
            tmodel, _wrap_loader(bags["test"]), N_CLASSES,
            require_patient_results=True)

    cfg = MilTrainConfig(model_type=model_type, model_size="conch",
                         n_classes=N_CLASSES)
    ours = evaluate_model(cfg, params,
                          _our_loaders(corpus, split)["test"]())

    # abmil (CLAM_SB minus instance loss) shares the eval forward exactly.
    # our loader yields TABLE order (subset_by_slide_ids preserves it, the
    # reference get_split_from_df convention) — key the per-slide
    # comparison by slide id, not by position
    c, loader = corpus
    our_ids = loader.table.subset_by_slide_ids(split.test).slide_ids
    ref_probs = np.stack([patient_results[sid]["prob"][0]
                          for sid in our_ids])
    np.testing.assert_allclose(ours["probs"], ref_probs, rtol=1e-4,
                               atol=1e-5)
    assert ours["auc"] == pytest.approx(test_auc, abs=1e-6)
    assert 1.0 - ours["acc"] == pytest.approx(test_error, abs=1e-6)


def _wrap_loader(bags):
    """Batch-1 loader with the reference's ``collate_MIL`` squeeze."""
    ds = _RefSplit(bags)

    class _L:
        dataset = ds

        def __len__(self):
            return len(ds)

        def __iter__(self):
            for i in range(len(ds)):
                f, y = ds[i]
                yield f, torch.tensor([y])

    return _L()


# ---------------------------------------------------------------------------
# 2. statistical fold parity (full trainer both sides)
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("model_type", ["clam_sb", "abmil"])
def test_mil_fold_statistical_parity(hard_corpus, tmp_path, model_type):
    """Full reference fold (weighted sampler → train → validate → summary)
    vs ``train_fold`` across 3 folds: both learn, mean val/test AUC agree
    within the same tolerance as the MOC episode parity (fold noise + RNG
    streams differ by construction)."""
    core = _ref_core_utils()
    max_epochs = 8
    ref_rows, jax_rows = [], []
    for fold in range(3):
        split, bags = _fold_bags(hard_corpus, fold)
        torch.manual_seed(fold)
        np.random.seed(fold)
        args = _ref_args(str(tmp_path / f"r{fold}"), model_type,
                         max_epochs=max_epochs, early_stopping=False,
                         weighted=True)
        (tmp_path / f"r{fold}").mkdir(exist_ok=True)
        with contextlib.redirect_stdout(io.StringIO()):
            _, test_auc, val_auc, test_acc, val_acc = core.train(
                (_RefSplit(bags["train"]), _RefSplit(bags["val"]),
                 _RefSplit(bags["test"])), fold, args, notsavesplit=True,
                require_patient_results=False)
        ref_rows.append({"val": val_auc, "test": test_auc})

        cfg = MilTrainConfig(
            model_type=model_type, model_size="conch", n_classes=N_CLASSES,
            lr=2e-4, reg=1e-5, max_epochs=max_epochs, weighted_sample=True,
            steps_per_epoch=len(split.train), seed=fold)
        res = train_fold(_our_loaders(hard_corpus, split), cfg)
        jax_rows.append({"val": res.val_auc, "test": res.test_auc})

    mean = lambda rows, k: float(np.mean([r[k] for r in rows]))
    ref_val, jax_val = mean(ref_rows, "val"), mean(jax_rows, "val")
    ref_test, jax_test = mean(ref_rows, "test"), mean(jax_rows, "test")
    print(f"\n{model_type}: reference val={ref_val:.4f} test={ref_test:.4f}"
          f" | moc_tpu val={jax_val:.4f} test={jax_test:.4f}")
    assert ref_test >= 0.55 and jax_test >= 0.55  # both actually learn
    assert abs(ref_val - jax_val) <= 0.15
    assert abs(ref_test - jax_test) <= 0.15


# ---------------------------------------------------------------------------
# 3. EarlyStopping trigger parity at chain level
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_mil_earlystop_trigger_parity(corpus, tmp_path):
    """On the separable corpus both trainers reach val AUC 1.0 at epoch 0
    and never improve again, so the reference's hardcoded stopper
    (patience 20, stop_epoch 40, ``core_utils.py:225``) must fire at the
    first epoch > 40 with counter ≥ 20 — epoch 41 — on BOTH sides,
    deterministically."""
    core = _ref_core_utils()
    split, bags = _fold_bags(corpus, fold=0)
    torch.manual_seed(0)
    np.random.seed(0)
    args = _ref_args(str(tmp_path / "es"), "abmil", max_epochs=60,
                     early_stopping=True, weighted=True)
    (tmp_path / "es").mkdir(exist_ok=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _, test_auc, val_auc, _, _ = core.train(
            (_RefSplit(bags["train"]), _RefSplit(bags["val"]),
             _RefSplit(bags["test"])), 0, args, notsavesplit=True,
            require_patient_results=False)
    epochs_ran = [int(m) for m in re.findall(r"Current Epoch (\d+)",
                                             buf.getvalue())]
    assert val_auc == 1.0, "corpus must saturate for the deterministic pin"
    assert max(epochs_ran) == 41, epochs_ran

    cfg = MilTrainConfig(
        model_type="abmil", model_size="conch", n_classes=N_CLASSES,
        lr=2e-4, reg=1e-5, max_epochs=60, early_stopping=True, patience=20,
        stop_epoch=40, weighted_sample=True,
        steps_per_epoch=len(split.train), seed=0)
    res = train_fold(_our_loaders(corpus, split), cfg)
    assert res.val_auc == 1.0
    assert res.stop_epoch == 41, res.stop_epoch
