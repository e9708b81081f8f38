"""Per-fold MIL training: the reference ``utils/core_utils.py`` rebuilt.

Behavioral reference ``core_utils.py:105-291`` and its loops (294-731):
model-zoo dispatch, CE or SmoothTop1SVM bag loss, Adam/AdamW/SGD with a
cosine schedule, class-weighted sampling, patience-based early stopping on
a validation criterion (AUC), best-checkpoint reload, and val/test
summaries with per-class accuracy tallies and balanced accuracy.

TPU-native: slides are padded+masked bags streamed in bucketed batches; one
jitted train/eval step per bucket shape; metrics on host via sklearn for
parity (binary: P(class 1); multiclass: ovr-macro with per-class nanmean
fallback, ``core_utils.py:519-524,607-620``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from moc_tpu.metrics.classification import balanced_accuracy
from moc_tpu.models import (
    CHIEF,
    ChiefConfig,
    ClamConfig,
    CLAM,
    MILFc,
    MILFcMC,
    MilFcConfig,
    TitanConfig,
    TitanHead,
    TransMIL,
    TransMILConfig,
)
from moc_tpu.train.losses import bag_loss_fn


@dataclasses.dataclass(frozen=True)
class MilTrainConfig:
    """The ``args`` namespace consumed by the reference trainer
    (fields enumerated in SURVEY.md §5.6)."""

    model_type: str = "clam_sb"  # clam_sb|clam_mb|abmil|transmil|mil|chief|titan
    model_size: str = "conch"
    n_classes: int = 2
    drop_out: float = 0.0
    bag_loss: str = "ce"  # ce | svm
    inst_loss: str = "ce"
    subtyping: bool = False
    B: int = 8  # k_sample for the CLAM instance loss
    bag_weight: float = 0.7
    lr: float = 1e-4
    reg: float = 1e-5
    opt: str = "adam"  # adam | adamw | sgd
    max_epochs: int = 20
    early_stopping: bool = False
    patience: int = 20
    stop_epoch: int = 50
    weighted_sample: bool = False
    batch_size: int = 1  # slides per optimizer step (1 = reference semantics)
    # optimizer steps per epoch (ceil(n_train / batch_size)): the reference's
    # CosineAnnealingLR anneals per EPOCH (core_utils.py:206,253), so the
    # optax schedule must be stretched by this factor. 1 keeps the legacy
    # per-update annealing (decays within the first epoch at batch_size=1).
    steps_per_epoch: int = 1
    seed: int = 1
    conch_init: bool = False  # init CLAM classifier from zero-shot weights
    conch_freeze: bool = False  # freeze that classifier during training


# ------------------------------------------------------------------ helpers


class AccuracyLogger:
    """Per-class count/correct tallies (ref ``core_utils.py:16-50``)."""

    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self.data = [{"count": 0, "correct": 0} for _ in range(n_classes)]

    def log_batch(self, y_hat, y):
        y_hat = np.asarray(y_hat).astype(int)
        y = np.asarray(y).astype(int)
        for c in np.unique(y):
            m = y == c
            self.data[c]["count"] += int(m.sum())
            self.data[c]["correct"] += int((y_hat[m] == c).sum())

    def get_summary(self, c: int):
        count = self.data[c]["count"]
        correct = self.data[c]["correct"]
        return (correct / count if count else None), correct, count


class EarlyStopping:
    """Patience-based stopping on a validation criterion
    (ref ``core_utils.py:53-102``: higher criteria = better; stop only after
    ``stop_epoch``)."""

    def __init__(self, patience: int = 20, stop_epoch: int = 50):
        self.patience = patience
        self.stop_epoch = stop_epoch
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.best_params = None

    def __call__(self, epoch: int, criteria: float, params) -> None:
        if self.best_score is None or criteria > self.best_score:
            self.best_score = criteria
            self.best_params = jax.device_get(params)
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience and epoch > self.stop_epoch:
                self.early_stop = True


def build_model(cfg: MilTrainConfig, *, grad_friendly: bool = False):
    """Model-zoo dispatch (ref ``core_utils.py:140-200``). Returns
    ``(module, forward, init_fn)`` where ``forward(params, feats, valid,
    label, train, rng) -> (logits [C], instance_loss scalar)`` for ONE slide
    and ``init_fn(rng, feats, valid)`` creates the full parameter tree.

    ``grad_friendly`` picks formulations whose VJPs compile fast inside
    ``vmap(scan(grad))`` (the fused fold trainer): currently TransMIL's
    depthwise convs switch to shifted-add slices (identical values; the
    grouped-conv form is the faster forward — BENCH_NOTES r3)."""
    t = cfg.model_type
    if t in ("clam_sb", "clam_mb", "abmil"):
        model = CLAM(ClamConfig(
            n_classes=cfg.n_classes, size_arg=cfg.model_size,
            dropout=cfg.drop_out, k_sample=cfg.B, subtyping=cfg.subtyping,
            multi_branch=(t == "clam_mb"),
        ))
        instance_eval = t != "abmil"

        def init_fn(rng, feats, valid):
            # instance_eval=True so the instance-classifier params exist
            return model.init(rng, feats, valid, jnp.int32(0),
                              instance_eval=instance_eval)

        def forward(params, feats, valid, label, train=False, rng=None):
            kw = {"rngs": {"dropout": rng}} if (train and cfg.drop_out and rng is not None) else {}
            out = model.apply(params, feats, valid, label,
                              instance_eval=instance_eval and train, train=train, **kw)
            return out["logits"], out["instance_loss"]

        return model, forward, init_fn
    if t == "transmil":
        model = TransMIL(TransMILConfig(
            n_classes=cfg.n_classes, size_arg=cfg.model_size,
            conv_impl="slices" if grad_friendly else "conv"))

        def forward(params, feats, valid, label, train=False, rng=None):
            # attention dropout (ref NystromAttention(dropout=0.1)) is
            # active only in training steps that provide an rng
            kwargs = ({"train": True, "rngs": {"dropout": rng}}
                      if (train and rng is not None) else {})
            return (model.apply(params, feats, valid, **kwargs)["logits"],
                    jnp.float32(0.0))

        return model, forward, lambda rng, f, v: model.init(rng, f, v)
    if t == "mil":
        if cfg.n_classes == 2:
            model = MILFc(MilFcConfig(n_classes=2, size_arg=cfg.model_size,
                                      dropout=cfg.drop_out))
        else:
            model = MILFcMC(MilFcConfig(n_classes=cfg.n_classes,
                                        size_arg=cfg.model_size, dropout=cfg.drop_out))

        def forward(params, feats, valid, label, train=False, rng=None):
            return model.apply(params, feats, valid)["logits"], jnp.float32(0.0)

        return model, forward, lambda rng, f, v: model.init(rng, f, v)
    if t == "chief":
        model = CHIEF(ChiefConfig(n_classes=cfg.n_classes, size_arg=cfg.model_size,
                                  dropout=cfg.drop_out))

        def forward(params, feats, valid, label, train=False, rng=None):
            kw = {"rngs": {"dropout": rng}} if (train and cfg.drop_out and rng is not None) else {}
            out = model.apply(params, feats, valid, 0, train=train, **kw)
            return out["logits"], jnp.float32(0.0)

        return model, forward, lambda rng, f, v: model.init(rng, f, v, 0)
    if t == "titan":
        model = TitanHead(TitanConfig(n_classes=cfg.n_classes))

        def forward(params, feats, valid, label, train=False, rng=None):
            # coord-less fallback: zero coords (API takes coords via batch)
            coords = jnp.zeros((feats.shape[0], 2), jnp.int32)
            return model.apply(params, feats, coords, valid)["logits"], jnp.float32(0.0)

        def init_fn(rng, f, v):
            return model.init(rng, f, jnp.zeros((f.shape[0], 2), jnp.int32), v)

        return model, forward, init_fn
    raise ValueError(f"unknown model_type {cfg.model_type!r}")


def init_classifier_from_weights(params, zs_weights) -> dict:
    """Seed the CLAM slide classifier with zero-shot text weights
    (ref ``CLAM_SB.init_with_conch``, ``model_clam.py:104-112``:
    ``classifiers.weight ← Wᵀ``, bias zeroed; flax kernels are already
    ``[in, out]`` so the matrix is assigned as-is)."""
    w = np.asarray(zs_weights, np.float32)  # [hidden, C]
    clf = dict(params["params"]["classifiers"])
    if clf["kernel"].shape != w.shape:
        raise ValueError(f"classifier kernel {clf['kernel'].shape} != "
                         f"zero-shot weights {w.shape}")
    clf["kernel"] = jnp.asarray(w)
    clf["bias"] = jnp.zeros_like(clf["bias"])
    p = dict(params)
    p["params"] = dict(params["params"])
    p["params"]["classifiers"] = clf
    return p


def _freeze_classifier(optimizer: optax.GradientTransformation,
                       params) -> optax.GradientTransformation:
    """Zero updates for the slide-classifier leaves (ref ``conch_freeze``,
    ``model_clam.py:109-112``: requires_grad=False)."""
    def label_tree(p):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if any(
                getattr(k, "key", None) == "classifiers" for k in path
            ) else "train", p)

    return optax.multi_transform(
        {"train": optimizer, "frozen": optax.set_to_zero()}, label_tree)


def cosine_epoch_schedule(lr: float, steps_per_epoch: int, t_max: int = 20):
    """torch ``CosineAnnealingLR(T_max=20)`` stepped per EPOCH:
    ``lr * 0.5 * (1 + cos(pi * epoch / T_max))`` — periodic past T_max
    (the LR cosines back up), exactly like the torch formula."""
    spe = max(steps_per_epoch, 1)

    def schedule(step):
        epoch = step // spe
        return lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / t_max))

    return schedule


def make_optimizer(cfg: MilTrainConfig) -> optax.GradientTransformation:
    """``get_optim`` + CosineAnnealingLR(T_max=20)
    (ref ``utils/utils.py:270-279``, ``core_utils.py:205-206``). The torch
    scheduler steps per epoch; optax counts updates, hence the
    ``steps_per_epoch`` stretch. T_max stays 20 REGARDLESS of max_epochs
    (the reference hard-codes it), and torch's formula is periodic — past
    epoch 20 the LR cosines back UP; stretching the decay over max_epochs
    instead held the LR high through the mid-epochs (review r3)."""
    schedule = cosine_epoch_schedule(cfg.lr, cfg.steps_per_epoch)
    if cfg.opt == "adam":
        return optax.chain(optax.add_decayed_weights(cfg.reg),
                           optax.scale_by_adam(),
                           optax.scale_by_learning_rate(schedule))
    if cfg.opt == "adamw":
        return optax.adamw(schedule, weight_decay=cfg.reg)
    if cfg.opt == "sgd":
        return optax.chain(optax.add_decayed_weights(cfg.reg),
                           optax.sgd(schedule, momentum=0.9))
    raise ValueError(cfg.opt)


def weighted_order(labels: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Class-balanced sampling order with replacement (ref
    ``make_weights_for_balanced_classes_split``, ``utils/utils.py:383-397``)."""
    counts = np.bincount(labels, minlength=labels.max() + 1).astype(np.float64)
    w = (len(labels) / np.maximum(counts, 1))[labels]
    w /= w.sum()
    return rng.choice(len(labels), size=len(labels), replace=True, p=w)


def _weighted_batch_order(batches, rng: np.random.Generator) -> np.ndarray:
    """Batch-granularity WeightedRandomSampler (ref ``utils/utils.py:383-397``):
    draw ``len(batches)`` batches with replacement, each weighted by the sum
    of its valid slides' inverse-class-frequency weights. At the reference's
    ``batch_size=1`` this is exactly the per-slide sampler; for larger batches
    it is the batch-level analogue (slides were bucketized into batches before
    sampling, so per-slide resampling would need re-padding)."""
    valid = [np.asarray(b.labels)[np.asarray(b.labels) >= 0] for b in batches]
    all_lab = np.concatenate(valid)
    counts = np.bincount(all_lab, minlength=int(all_lab.max()) + 1)
    slide_w = len(all_lab) / np.maximum(counts.astype(np.float64), 1)
    bw = np.array([slide_w[v].sum() for v in valid])
    return rng.choice(len(batches), size=len(batches), replace=True,
                      p=bw / bw.sum())


# ------------------------------------------------------------------ driver


@dataclasses.dataclass
class FoldResult:
    val_auc: float
    val_acc: float
    test_auc: float
    test_acc: float
    test_bacc: float
    patient_results: dict
    stop_epoch: int
    params: dict
    class_summary: list


def _auc_host(probs: np.ndarray, labels: np.ndarray, n_classes: int) -> float:
    from sklearn.metrics import roc_auc_score

    try:
        if n_classes == 2:
            return float(roc_auc_score(labels, probs[:, 1]))
        return float(roc_auc_score(labels, probs, multi_class="ovr", average="macro"))
    except ValueError:
        # per-class ROC with nanmean fallback (ref core_utils.py:611-620)
        from sklearn.metrics import roc_auc_score as ras

        aucs = []
        for c in range(n_classes):
            try:
                aucs.append(ras((labels == c).astype(int), probs[:, c]))
            except ValueError:
                aucs.append(np.nan)
        return float(np.nanmean(aucs))


def half_precision_params(params, dtype=None):
    """Cast float32 leaves to ``dtype`` (default bfloat16) for inference.
    The MIL heads are HBM-bandwidth-bound; bf16 params+activations measured
    6.6× faster CLAM eval on v5e at ~2e-3 logit deviation. Train in f32;
    cast for serving."""
    dtype = jnp.bfloat16 if dtype is None else dtype
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, params)


def evaluate_model(cfg: MilTrainConfig, params, batches,
                   compute_dtype=None) -> dict:
    """Standalone checkpoint evaluation (ref ``eval_utils.eval``,
    ``/root/reference/utils/eval_utils.py:66-76``): run a trained model over
    a bag stream and return probs/preds + the summary metrics.

    ``compute_dtype=jnp.bfloat16`` casts params and features for the forward
    (see ``half_precision_params``); metrics stay f32 on host."""
    _, forward, _ = build_model(cfg)
    if compute_dtype is not None:
        params = half_precision_params(params, compute_dtype)

    @jax.jit
    def eval_step(params, feats, mask):
        if compute_dtype is not None:
            feats = feats.astype(compute_dtype)
        return jax.vmap(
            lambda f, v: forward(params, f, v, None)[0].astype(jnp.float32)
        )(feats, mask)

    all_logits, all_labels = [], []
    for batch in batches:
        logits = np.asarray(eval_step(params, batch.features, batch.mask))
        labels = np.asarray(batch.labels)
        keep = labels >= 0
        all_logits.append(logits[keep])
        all_labels.append(labels[keep])
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))
    preds = probs.argmax(1)
    logger = AccuracyLogger(cfg.n_classes)
    logger.log_batch(preds, labels)
    return {
        "auc": _auc_host(probs, labels, cfg.n_classes),
        "acc": float((preds == labels).mean()),
        "bacc": float(balanced_accuracy(jnp.asarray(logits), jnp.asarray(labels),
                                        cfg.n_classes)),
        "probs": probs,
        "preds": preds,
        "labels": labels,
        "class_summary": [logger.get_summary(c) for c in range(cfg.n_classes)],
        "patient_results": {
            str(i): {"prob": probs[i].tolist(), "label": int(labels[i])}
            for i in range(len(labels))
        },
    }


def evaluate_patch_level(cfg: MilTrainConfig, params, batches) -> list:
    """Per-slide patch-level logit dump (ref ``eval_lynature`` with
    ``patch_eval=True``, ``eval_utils.py:78-113``): returns one ``[n_i, C]``
    array per slide (pad rows stripped), for heatmaps/analysis."""
    t = cfg.model_type
    if t not in ("clam_sb", "clam_mb", "abmil", "mil", "transmil"):
        raise ValueError(f"patch-level eval not defined for {t!r}")
    model, _, _ = build_model(cfg)
    key = "patch_probs" if t == "mil" else "patch_logits"

    @jax.jit
    def step(params, feats, mask):
        def one(f, v):
            out = model.apply(params, f, v) if t in ("mil", "transmil") else \
                model.apply(params, f, v, None)
            return out[key]
        return jax.vmap(one)(feats, mask)

    dumps = []
    for batch in batches:
        pl = np.asarray(step(params, batch.features, batch.mask))
        labels = np.asarray(batch.labels)
        n = np.asarray(batch.n_patches)
        for i in range(pl.shape[0]):
            if labels[i] >= 0:
                dumps.append(pl[i, : int(n[i])])
    return dumps


def train_fold(
    loaders: dict,
    cfg: MilTrainConfig,
    *,
    log: Callable[[str], None] | None = None,
    writer=None,
    zs_classifier=None,
) -> FoldResult:
    """Train one fold. ``loaders`` maps split → callable yielding
    ``BagBatch`` iterables (e.g. ``lambda: loader.batches(batch_size=1)``).

    Mirrors ``core_utils.train``: per-slide steps with the CLAM bag/instance
    loss blend, early stopping on val AUC, best-params reload, final
    val/test summaries. ``writer`` is an optional
    ``moc_tpu.utils.logging.ScalarLogger`` receiving the same train/val
    scalars the reference logs behind ``args.log_data``
    (``core_utils.py:360-369,644-648``)."""
    model, forward, init_fn = build_model(cfg)
    bag_loss = bag_loss_fn(cfg.bag_loss)
    optimizer = make_optimizer(cfg)

    # init from the first train batch
    first = next(iter(loaders["train"]()))
    rng_init = jax.random.PRNGKey(cfg.seed)
    params = init_fn(rng_init, first.features[0], first.mask[0])
    if cfg.conch_init:
        if zs_classifier is None:
            raise ValueError("conch_init=True requires zs_classifier")
        params = init_classifier_from_weights(params, zs_classifier)
    if cfg.conch_freeze:
        optimizer = _freeze_classifier(optimizer, params)
    opt_state = optimizer.init(params)

    def slide_loss(params, feats, valid, label, rng):
        logits, inst_loss = forward(params, feats, valid, label, train=True, rng=rng)
        loss = bag_loss(logits[None], label[None])[0]
        if cfg.model_type in ("clam_sb", "clam_mb"):
            loss = cfg.bag_weight * loss + (1 - cfg.bag_weight) * inst_loss
        return loss

    @jax.jit
    def train_step(params, opt_state, feats, mask, labels, rng):
        def batch_loss(p):
            keep = (labels >= 0).astype(jnp.float32)
            rngs = jax.random.split(rng, feats.shape[0])
            losses = jax.vmap(lambda f, v, y, r: slide_loss(p, f, v, y, r))(
                feats, mask, labels, rngs
            )
            return jnp.sum(losses * keep) / jnp.maximum(jnp.sum(keep), 1.0)

        loss, grads = jax.value_and_grad(batch_loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, feats, mask):
        return jax.vmap(lambda f, v: forward(params, f, v, None)[0])(feats, mask)

    def evaluate(split: str):
        all_logits, all_labels, all_ids = [], [], []
        for batch in loaders[split]():
            logits = np.asarray(eval_step(params, batch.features, batch.mask))
            labels = np.asarray(batch.labels)
            keep = labels >= 0
            all_logits.append(logits[keep])
            all_labels.append(labels[keep])
        logits = np.concatenate(all_logits)
        labels = np.concatenate(all_labels)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))
        preds = probs.argmax(1)
        acc = float((preds == labels).mean())
        auc = _auc_host(probs, labels, cfg.n_classes)
        bacc = float(balanced_accuracy(jnp.asarray(logits), jnp.asarray(labels),
                                       cfg.n_classes))
        return {"auc": auc, "acc": acc, "bacc": bacc, "probs": probs,
                "labels": labels, "preds": preds}

    stopper = EarlyStopping(cfg.patience, cfg.stop_epoch)
    rng = jax.random.PRNGKey(cfg.seed + 1)
    stop_at = cfg.max_epochs
    # weighted_sample resamples the epoch order class-balanced with
    # replacement (ref WeightedRandomSampler, ``utils/utils.py:383-397``);
    # it needs an indexable epoch, so the train stream is materialized once
    # (few-shot train splits are small — this is the path the flag targets)
    train_batches = None
    rng_w = np.random.default_rng(cfg.seed + 7) if cfg.weighted_sample else None
    for epoch in range(cfg.max_epochs):
        from moc_tpu.utils.logging import AverageMeter

        loss_meter = AverageMeter()
        if cfg.weighted_sample:
            if train_batches is None:
                train_batches = list(loaders["train"]())
            order = _weighted_batch_order(train_batches, rng_w)
            epoch_batches = (train_batches[i] for i in order)
        else:
            epoch_batches = loaders["train"]()
        for batch in epoch_batches:
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss = train_step(
                params, opt_state, batch.features, batch.mask, batch.labels, step_rng
            )
            loss_meter.update(float(loss), int(np.sum(np.asarray(batch.labels) >= 0)))
        val = evaluate("val")
        if log:
            log(f"epoch {epoch}: val auc={val['auc']:.4f} acc={val['acc']:.4f}")
        if writer is not None:
            writer.add_scalars(
                {"train/loss": loss_meter.avg, "val/auc": val["auc"],
                 "val/error": 1.0 - val["acc"]}, epoch)
        stopper(epoch, val["auc"], params)
        if cfg.early_stopping and stopper.early_stop:
            stop_at = epoch
            break

    if stopper.best_params is not None:
        params = jax.device_put(stopper.best_params)

    val = evaluate("val")
    test = evaluate("test")
    if writer is not None:
        # final summaries (ref core_utils.py:644-648)
        writer.add_scalars(
            {"final/val_auc": val["auc"], "final/val_error": 1.0 - val["acc"],
             "final/test_auc": test["auc"],
             "final/test_error": 1.0 - test["acc"]}, 0)
        writer.flush()
    acc_logger = AccuracyLogger(cfg.n_classes)
    acc_logger.log_batch(test["preds"], test["labels"])
    patient_results = {
        str(i): {"prob": test["probs"][i].tolist(), "label": int(test["labels"][i])}
        for i in range(len(test["labels"]))
    }
    return FoldResult(
        val_auc=val["auc"], val_acc=val["acc"],
        test_auc=test["auc"], test_acc=test["acc"], test_bacc=test["bacc"],
        patient_results=patient_results, stop_epoch=stop_at,
        params=jax.device_get(params),
        class_summary=[acc_logger.get_summary(c) for c in range(cfg.n_classes)],
    )
