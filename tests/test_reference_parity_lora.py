"""Chain parity for the LoRA fine-tune trainer vs the reference's OWN
``lora_utils`` (VERDICT r4 missing #4).

``/root/reference/utils/lora_utils.py:38-277`` — the sorted top-logit
queue trainer: patches stream through the tower in minibatches of 8, a
sorted queue keeps the rows with the largest row-max (train: 20 RAW-logit
rows; eval: 10 SOFTMAXED rows — ``update_sorted_queue`` 30-36, call sites
137-151/222-240), slide logits are the queue mean, CE + Adam per slide,
best-val-AUC selection.

The queue-trace test drives the reference's imported ``update_sorted_queue``
itself on identical logit streams; the eval-chain test runs the restated
``val_fn`` glue around a shared-weight tiny tower (the real ``Conch_LoRA``
needs the CONCH checkpoint bin, absent offline); the trainer test compares
full training runs statistically.

These tests pinned (and now guard) a REAL divergence: the r4
``update_queue`` kept independent per-class top-q columns, not whole rows
ranked by row-max — fixed in ``train/lora_finetune.py``.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moc_tpu.train.lora_finetune import (LoraFinetuneConfig,
                                         run_lora_finetune,
                                         streamed_slide_logits, update_queue)

torch = pytest.importorskip("torch")

TEMPERATURE = 56.3477  # ref conch_temperature, lora_utils.py:64
FDIM, CDIM, C = 16, 12, 2  # patch dim → tower feature dim → classes


def _ref_lora_utils():
    sys.path.insert(0, "/root/repo")
    from tests.test_vila_oracle import _install_conch_stubs

    _install_conch_stubs()
    if not hasattr(np, "Inf"):
        np.Inf = np.inf  # ref EarlyStopping reads np.Inf (NumPy-2 removal)
    import torch.nn as nn

    if "nystrom_attention" not in sys.modules:
        na = types.ModuleType("nystrom_attention")
        na.NystromAttention = object
        sys.modules["nystrom_attention"] = na
    if "datasets" not in sys.modules:
        dg = types.ModuleType("datasets.dataset_generic")
        dg.save_splits = lambda *a, **k: None
        dg.__spec__ = importlib.machinery.ModuleSpec(
            "datasets.dataset_generic", None)
        ds = types.ModuleType("datasets")
        ds.dataset_generic = dg
        ds.__spec__ = importlib.machinery.ModuleSpec("datasets", None)
        sys.modules["datasets"] = ds
        sys.modules["datasets.dataset_generic"] = dg
    vt = sys.modules["timm.models.vision_transformer"]
    if not hasattr(vt, "Block"):
        class Block(nn.Module):  # models/lora.py imports timm's ViT Block
            pass

        vt.Block = Block
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.refutils import bind_reference_utils

    bind_reference_utils()
    from utils import lora_utils

    return lora_utils


# ---------------------------------------------------------------------------
# 1. queue-trace parity against the imported reference queue
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,q", [(64, 10), (7, 10), (40, 20)])
def test_update_queue_trace_parity(n, q):
    """Identical logit stream → identical surviving rows and pooled mean,
    the reference's own ``update_sorted_queue`` as the oracle (including
    partial fill when n < q)."""
    lu = _ref_lora_utils()
    rng = np.random.default_rng(3)
    stream = rng.normal(size=(n, C)).astype(np.float32)

    ref_queue: list = []
    for i, row in enumerate(stream):
        lu.update_sorted_queue(ref_queue,
                               (i, torch.tensor(row).unsqueeze(0)), q)
    ref_rows = torch.cat([r[1] for r in ref_queue], dim=0).numpy()
    ref_pooled = ref_rows.mean(axis=0)

    pad = (-n) % 8
    padded = np.concatenate([stream, np.zeros((pad, C), np.float32)])
    ours = jnp.full((q, C), -1e30, jnp.float32)
    for i in range(0, n + pad, 8):
        mb = jnp.asarray(padded[i : i + 8])
        vm = jnp.asarray((np.arange(i, i + 8) < n))
        ours = update_queue(ours, jnp.where(vm[:, None], mb, -1e30))
    ours = np.asarray(ours)
    filled = ours.max(axis=1) > -1e29
    np.testing.assert_allclose(
        sorted(map(tuple, ours[filled])), sorted(map(tuple, ref_rows)),
        rtol=1e-6)
    np.testing.assert_allclose(ours[filled].mean(axis=0), ref_pooled,
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# 2. deterministic eval-chain parity on shared weights
# ---------------------------------------------------------------------------


def _toy_slides(n_slides, rng, n_patches=48, sig=1.5, k=8):
    slides = []
    for i in range(n_slides):
        y = i % C
        x = rng.normal(size=(n_patches, FDIM)).astype(np.float32)
        x[:k, y] += sig
        slides.append((x, np.ones(n_patches, bool), y))
    return slides


def _ref_val_fn(lu, w_tower_t, zs_t, slides):
    """Restated ``val_fn`` glue (``lora_utils.py:120-170``) around a tiny
    linear tower: minibatch-8 stream, L2-normalized features, SOFTMAXED
    rows into a 10-row sorted queue, queue-mean slide logits, CE on those
    probabilities-as-logits, temperature-softmax AUC."""
    import torch.nn.functional as F

    loss_fn = torch.nn.CrossEntropyLoss()
    pooled_all, labels = [], []
    losses = []
    with torch.no_grad():
        for x, _, y in slides:
            data = torch.tensor(x)
            queue: list = []
            for i in range(0, len(data), 8):
                feati = data[i : i + 8] @ w_tower_t
                feati = feati / feati.norm(dim=-1, keepdim=True)
                logiti = F.softmax(feati @ zs_t, dim=1)
                for j in range(logiti.shape[0]):
                    lu.update_sorted_queue(queue,
                                           (i + j, logiti[j].unsqueeze(0)),
                                           10)
            pooled = torch.cat([r[1] for r in queue], dim=0).mean(
                dim=0, keepdim=True)
            losses.append(float(loss_fn(pooled, torch.tensor([y]))))
            pooled_all.append(pooled)
            labels.append(y)
    probs = torch.softmax(torch.cat(pooled_all) * TEMPERATURE, dim=1).numpy()
    from sklearn.metrics import roc_auc_score

    return (np.concatenate([p.numpy() for p in pooled_all]),
            float(np.mean(losses)),
            float(roc_auc_score(labels, probs[:, 1])))


def test_lora_eval_chain_parity_shared_weights():
    lu = _ref_lora_utils()
    rng = np.random.default_rng(11)
    w_tower = rng.normal(size=(FDIM, CDIM)).astype(np.float32) * 0.4
    zs = rng.normal(size=(CDIM, C)).astype(np.float32) * 0.4
    slides = _toy_slides(10, rng)

    ref_pooled, _, ref_auc = _ref_val_fn(lu, torch.tensor(w_tower),
                                         torch.tensor(zs), slides)

    cfg = LoraFinetuneConfig(n_classes=C)
    zs_j = jnp.asarray(zs)

    def encode(p, mb):
        feat = mb @ p["params"]["head"]["w"]
        feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
        return feat @ zs_j

    params = {"params": {"head": {"w": jnp.asarray(w_tower)}}}
    for i, (x, v, _) in enumerate(slides):
        ours = np.asarray(streamed_slide_logits(
            encode, params, jnp.asarray(x), jnp.asarray(v), cfg,
            eval_mode=True))
        np.testing.assert_allclose(ours, ref_pooled[i], rtol=1e-5,
                                   atol=1e-6, err_msg=f"slide {i}")

    from moc_tpu.metrics import roc_auc_host, softmax_probs

    logits = np.stack([np.asarray(streamed_slide_logits(
        encode, params, jnp.asarray(x), jnp.asarray(v), cfg,
        eval_mode=True)) for x, v, _ in slides])
    probs = np.asarray(softmax_probs(jnp.asarray(logits), TEMPERATURE))
    ours_auc = roc_auc_host(probs, np.asarray([y for *_, y in slides]))
    assert ours_auc == pytest.approx(ref_auc, abs=1e-9)


# ---------------------------------------------------------------------------
# 3. full-trainer statistical comparison
# ---------------------------------------------------------------------------


def _ref_train(lu, slides, val_slides, zs_t, epochs, lr, seed):
    """Restated train loop glue (``lora_utils.py:207-272``): per-slide
    minibatch-8 stream, 20-row RAW-logit queue, queue-mean CE, Adam,
    best-val-AUC (strict ``>``) selection."""
    torch.manual_seed(seed)
    w = torch.nn.Parameter(torch.randn(FDIM, CDIM) * 0.3)
    optim = torch.optim.Adam([w], lr=lr)
    loss_fn = torch.nn.CrossEntropyLoss()
    best_val = 0.0
    for _ in range(epochs):
        for x, _, y in slides:
            data = torch.tensor(x)
            queue: list = []
            for i in range(0, len(data), 8):
                feati = data[i : i + 8] @ w
                feati = feati / feati.norm(dim=-1, keepdim=True)
                logiti = feati @ zs_t
                for j in range(logiti.shape[0]):
                    lu.update_sorted_queue(queue,
                                           (i + j, logiti[j].unsqueeze(0)),
                                           20)
            pooled = torch.cat([r[1] for r in queue], dim=0).mean(
                dim=0, keepdim=True)
            loss = loss_fn(pooled, torch.tensor([y]))
            optim.zero_grad()
            loss.backward()
            optim.step()
        with torch.no_grad():
            _, _, val_auc = _ref_val_fn(lu, w.detach(), zs_t, val_slides)
        if val_auc > best_val:
            best_val = val_auc
    return best_val


@pytest.mark.slow
def test_lora_train_chain_statistical():
    """Full trainer both sides on the same toy corpus: both learn and the
    best-val AUCs agree within fold-noise tolerance (init RNGs differ by
    construction — torch vs jax)."""
    lu = _ref_lora_utils()
    rng = np.random.default_rng(13)
    # class-aligned zero-shot weights (feature dims 0/1 ↔ classes) so the
    # tower has a learnable target at toy scale
    zs = np.zeros((CDIM, C), np.float32)
    zs[0, 0] = zs[1, 1] = 1.0
    train = _toy_slides(12, rng, sig=3.0, k=16)
    val = _toy_slides(8, rng, sig=3.0, k=16)
    zs_j = jnp.asarray(zs)

    refs, ours = [], []
    for seed in range(2):
        refs.append(_ref_train(lu, train, val, torch.tensor(zs), epochs=10,
                               lr=2e-2, seed=seed))

        def encode(p, mb):
            feat = mb @ p["params"]["head"]["w"]
            feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
            return feat @ zs_j

        w0 = jax.random.normal(jax.random.PRNGKey(seed),
                               (FDIM, CDIM)) * 0.3
        params = {"params": {"head": {"w": w0}}}
        cfg = LoraFinetuneConfig(n_classes=C, learning_rate=2e-2)
        _, best_auc = run_lora_finetune(encode, params, train, val, cfg,
                                        epochs=10)
        ours.append(best_auc)
    ref_m, our_m = float(np.mean(refs)), float(np.mean(ours))
    print(f"\nlora: reference best_val={ref_m:.4f} | moc_tpu "
          f"best_val={our_m:.4f}")
    assert ref_m >= 0.8 and our_m >= 0.8
    assert abs(ref_m - our_m) <= 0.15
