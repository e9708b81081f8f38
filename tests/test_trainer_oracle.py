"""Trainer-utility parity against the reference ``utils/core_utils.py``:
EarlyStopping stop/save traces and Accuracy_Logger tallies, driven with
identical input sequences. Reuses the conch/timm/torchvision stubs from the
ViLa oracle (core_utils imports the full model zoo at module scope).
Skipped without ``/root/reference``.
"""

import os
import sys

from tests._stub_spec import ensure_spec

import numpy as np
import pytest

from tests.test_vila_oracle import HAS_REFERENCE, REFERENCE, _install_conch_stubs

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference unavailable")


@pytest.fixture(scope="module")
def ref_core():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    _install_conch_stubs()
    import types

    if "nystrom_attention" not in sys.modules:
        na = types.ModuleType("nystrom_attention")
        na.NystromAttention = object
        sys.modules["nystrom_attention"] = na
    import importlib.machinery

    for name in ("cv2", "openslide"):  # dataset/adapters import-time only
        mod = sys.modules.setdefault(name, types.ModuleType(name))
        if getattr(mod, "__spec__", None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    # the reference's ``datasets`` dir has no __init__.py, so the installed
    # HF ``datasets`` wins the import; stub the one symbol core_utils needs
    ds = types.ModuleType("datasets")
    dg = types.ModuleType("datasets.dataset_generic")
    dg.save_splits = lambda *a, **k: None
    ds.dataset_generic = dg
    ds.__spec__ = importlib.machinery.ModuleSpec("datasets", None)
    dg.__spec__ = importlib.machinery.ModuleSpec("datasets.dataset_generic",
                                                 None)
    sys.modules["datasets"] = ds
    sys.modules["datasets.dataset_generic"] = dg
    ensure_spec("nystrom_attention", "datasets", "datasets.dataset_generic")
    if not hasattr(np, "Inf"):  # numpy 2 removed the alias the reference uses
        np.Inf = np.inf
    from utils import core_utils

    return core_utils


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_early_stopping_trace_parity(ref_core, seed):
    from moc_tpu.train.mil import EarlyStopping

    rng = np.random.default_rng(seed)
    # random walk of criteria with plateaus to exercise the tie branch
    criteria = np.round(rng.random(60), 1)

    ref = ref_core.EarlyStopping(patience=5, stop_epoch=10)
    saves_ref = []
    real_save = torch.save
    torch.save = lambda obj, name: saves_ref.append(name)
    try:
        mine = EarlyStopping(patience=5, stop_epoch=10)
        saves_mine = []
        for epoch, c in enumerate(criteria):
            if not ref.early_stop:
                ref(epoch, val_loss=0.0, model=torch.nn.Linear(1, 1),
                    ckpt_name=f"e{epoch}", criteria=float(c))
            if not mine.early_stop:
                before = mine.best_score
                mine(epoch, float(c), params={"epoch": epoch})
                if mine.best_score != before:
                    saves_mine.append(f"e{epoch}")
            assert ref.early_stop == mine.early_stop, epoch
            assert ref.counter == mine.counter, epoch
    finally:
        torch.save = real_save
    # same checkpoint-save epochs (strict improvements only, incl. epoch 0)
    assert saves_ref == saves_mine
    assert ref.best_score == mine.best_score


def test_accuracy_logger_parity(ref_core):
    from moc_tpu.train.mil import AccuracyLogger

    rng = np.random.default_rng(7)
    y = rng.integers(0, 3, 50)
    y_hat = rng.integers(0, 3, 50)
    ref = ref_core.Accuracy_Logger(n_classes=3)
    mine = AccuracyLogger(3)
    ref.log_batch(y_hat, y)
    mine.log_batch(y_hat, y)
    # plus the single-sample path on the reference
    ref2 = ref_core.Accuracy_Logger(n_classes=3)
    for a, b in zip(y_hat, y):
        ref2.log(a, b)
    for c in range(3):
        assert ref.get_summary(c) == mine.get_summary(c)
        assert ref2.get_summary(c) == mine.get_summary(c)
