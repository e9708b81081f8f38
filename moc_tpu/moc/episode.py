"""MOC few-shot episode runner: scan-based training + best-val selection.

Rebuild of the reference train/eval/main loops
(``/root/reference/main_moc.py:378-644``). The per-slide Python loop with a
per-slide optimizer step becomes a ``lax.scan`` over the oversampled slide
order (order-dependent SGD semantics preserved: one Adam step per slide visit,
random 50% patch mask per visit). Evaluation vmaps the slide forward over
padded eval chunks. The epoch loop stays on host to stream eval chunks and to
mirror the reference's evaluate-test-only-on-val-improvement policy.

Optimizer matches torch ``Adam(lr=1e-3, weight_decay=1e-4)`` semantics: L2
decay added to the gradient *before* the Adam moments (``main_moc.py:316``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from moc_tpu.data.batching import BagBatch
from moc_tpu.data.loader import EpisodeBags
from moc_tpu.metrics import accuracy, roc_auc_host, softmax_probs
from moc_tpu.moc.core import MOCConfig, moc_slide_logits, moc_slide_logits_dense
from moc_tpu.models.senet import SENet
from moc_tpu import ops


@dataclasses.dataclass
class EvalMetrics:
    loss: float
    acc: float
    auc: float

    def to_dict(self) -> dict:
        return {"loss": self.loss, "acc": self.acc, "auc": self.auc}


@dataclasses.dataclass
class EpisodeResult:
    """Mirrors the reference's ``best_results_*.json`` schema
    (``main_moc.py:631-642``)."""

    zero_shot_train: dict | None
    zero_shot_val: dict | None
    zero_shot_test: dict | None
    best_val: float
    test_at_best_val: float
    test_acc_at_best_val: float
    best_epoch: int
    params: dict

    def to_dict(self) -> dict:
        return {
            "zero_shot_train": self.zero_shot_train if self.zero_shot_train else -1,
            "zero_shot_val": self.zero_shot_val if self.zero_shot_val else -1,
            "zero_shot_test": self.zero_shot_test if self.zero_shot_test else -1,
            "best_val": self.best_val,
            "test_at_best_val": self.test_at_best_val,
            "test_acc_at_best_val": self.test_acc_at_best_val,
            "best_epoch": self.best_epoch,
        }


def make_optimizer(cfg: MOCConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale(-cfg.learning_rate),
    )


def episode_init_key(seed) -> jax.Array:
    """Senet-init key. Shared by the streaming path (``run_episode``) and the
    fused sweep (``moc.sweep.make_sweep_fn``) so both train identically."""
    return jax.random.fold_in(jax.random.PRNGKey(17), seed)


def epoch_key(seed, epoch) -> jax.Array:
    """Root key of one training epoch's random patch masks (shared, see
    ``episode_init_key``). Per-slide keys are ``fold_in(epoch_key, i)`` over
    the visit index ``i`` — see ``epoch_slide_keys``."""
    return jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(23), seed), epoch)


def epoch_slide_keys(seed, epoch, n: int) -> jax.Array:
    """``[n, 2]`` per-slide-visit mask keys for one epoch."""
    ek = epoch_key(seed, epoch)
    return jax.vmap(lambda i: jax.random.fold_in(ek, i))(jnp.arange(n))


def init_senet(rng: jax.Array, cfg: MOCConfig):
    model = SENet(in_dim=cfg.feature_dim, out_dim=4)
    params = model.init(rng, jnp.zeros((1, cfg.feature_dim)))
    return model, params


@functools.lru_cache(maxsize=8)
def make_episode_fns(cfg: MOCConfig):
    """Build the jitted (train_epoch, eval_batch, zs_batch) triple.

    All three take the weight matrices as arguments so one compiled program
    serves every fold/shot episode of a dataset. Memoized on the (frozen,
    hashable) config: ``run_episode`` is called once per fold, and a fresh
    jit identity per fold would re-trace all three programs every episode
    (the persistent XLA cache only skips the compile, not tracing).
    """
    model = SENet(in_dim=cfg.feature_dim, out_dim=4)
    optimizer = make_optimizer(cfg)
    slide_fn = moc_slide_logits_dense if cfg.dense else moc_slide_logits

    def slide_loss(params, feats, valid, label, w, w_ext, rng):
        logits = slide_fn(model.apply, params, feats, valid, w, w_ext, cfg, rng)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits[None], label[None])[0]
        return loss

    @jax.jit
    def train_epoch(params, opt_state, batch: BagBatch, order, rngs, w, w_ext):
        """One oversampled epoch: scan of per-slide grad+Adam steps."""

        def body(carry, inp):
            params, opt_state = carry
            i, rng = inp
            feats = batch.features[i]
            valid = batch.mask[i]
            label = batch.labels[i]
            loss, grads = jax.value_and_grad(slide_loss)(
                params, feats, valid, label, w, w_ext, rng
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), (order, rngs))
        return params, opt_state, losses

    @jax.jit
    def eval_batch(params, batch: BagBatch, w, w_ext):
        """Pooled slide logits ``[B, C]`` for a padded eval chunk (no mask RNG).
        Handles the int8-resident tier transparently (``batch.scales`` —
        structure-level branch, so each tier compiles its own program)."""

        if batch.scales is not None:
            def per_slide_q(feats, valid, scale):
                return slide_fn(model.apply, params, feats, valid, w, w_ext,
                                cfg, None, scales=scale)

            return jax.vmap(per_slide_q)(batch.features, batch.mask,
                                         batch.scales)

        def per_slide(feats, valid):
            return slide_fn(model.apply, params, feats, valid, w, w_ext, cfg, None)

        return jax.vmap(per_slide)(batch.features, batch.mask)

    @jax.jit
    def zs_batch(batch: BagBatch, w, w_ext):
        if batch.scales is not None:  # int8-resident tier (W8A8 matmul)
            return jax.vmap(
                lambda f, v, s: zs_pooled_logits(f, v, w, w_ext, cfg,
                                                 scales=s))(
                batch.features, batch.mask, batch.scales)
        return jax.vmap(lambda f, v: zs_pooled_logits(f, v, w, w_ext, cfg))(
            batch.features, batch.mask)

    return train_epoch, eval_batch, zs_batch


def zs_pooled_logits(feats, valid, w, w_ext, cfg: MOCConfig, scales=None):
    """Zero-shot pooled logits of ONE slide via the configured pooling
    family (ref ``zs_evaluation``, ``main_moc.py:412-432``): the foreground
    families (topj/delta_*) pool ``feats @ w``; the bottomk families pool
    ``feats @ w_ext`` with ``n_fg = n_classes`` (the reference routes
    ``final_logits_ext`` with ``coords_list=args.n_classes``). ``scales``
    marks the int8-resident tier (W8A8 matmul, per-row dequant scales).

    THE single definition of the zs dispatch — the streaming eval
    (``make_episode_fns.zs_batch``) and the fused in-program floor
    (``sweep._zs_split_metrics``) both call it, so the routing cannot
    drift between the two paths."""
    pool_fn = ops.POOLING_REGISTRY[cfg.zs_pooling]
    fg = cfg.zs_pooling in ops.FOREGROUND_POOLINGS
    wx = w if fg else w_ext
    if scales is not None:
        from moc_tpu.ops.quant import int8_row_matmul

        logits = int8_row_matmul(feats, scales, wx)
    else:
        logits = feats @ wx
    if fg:
        return pool_fn(logits, valid, cfg.topk)
    return pool_fn(logits, valid, cfg.topk, n_fg=cfg.n_classes)


def _collect_metrics(
    logits: np.ndarray, labels: np.ndarray, cfg: MOCConfig
) -> EvalMetrics:
    """Host-side metric block shared by every eval loop
    (``main_moc.py:439-459``): mean CE, accuracy, temperature-calibrated AUC."""
    logits_j = jnp.asarray(logits)
    labels_j = jnp.asarray(labels)
    loss = float(
        jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits_j, labels_j))
    )
    acc = float(accuracy(logits_j, labels_j))
    probs = np.asarray(softmax_probs(logits_j, cfg.temperature))
    auc = roc_auc_host(probs, labels)
    return EvalMetrics(loss=loss, acc=acc, auc=auc)


def _eval_chunks(
    fn: Callable[[BagBatch], jax.Array], chunks: Sequence[BagBatch], cfg: MOCConfig
) -> EvalMetrics:
    all_logits, all_labels = [], []
    for chunk in chunks:
        logits = np.asarray(fn(chunk))
        labels = np.asarray(chunk.labels)
        keep = labels >= 0  # drop filler duplicates
        all_logits.append(logits[keep])
        all_labels.append(labels[keep])
    return _collect_metrics(np.concatenate(all_logits), np.concatenate(all_labels), cfg)


def zs_eval_batches(zs_batch_fn, chunks: Sequence[BagBatch], w, w_ext,
                    cfg: MOCConfig) -> EvalMetrics:
    return _eval_chunks(lambda b: zs_batch_fn(b, w, w_ext), chunks, cfg)


def ablation_evaluation(
    episode: EpisodeBags,
    w,
    w_ext,
    cfg: MOCConfig,
    mode: str,
) -> EvalMetrics:
    """Fixed avg/sum/max fusion over the test split — the reference's
    built-in ablation harness (``main_moc.py:523-592``)."""
    from moc_tpu.moc.core import ablation_slide_logits

    w = jnp.asarray(w)
    w_ext = jnp.asarray(w_ext)

    @jax.jit
    def batch_fn(batch: BagBatch):
        return jax.vmap(
            lambda f, v: ablation_slide_logits(f, v, w, w_ext, cfg, mode)
        )(batch.features, batch.mask)

    return _eval_chunks(batch_fn, episode.test, cfg)


def run_episode(
    episode: EpisodeBags,
    w: jax.Array,
    w_ext: jax.Array,
    cfg: MOCConfig,
    *,
    seed: int = 0,
    check_zeroshot: bool = True,
    log: Callable[[str], None] | None = None,
) -> EpisodeResult:
    """Full MOC episode: optional zero-shot floor, 25 epochs of per-slide
    training, best-val-AUC model selection with test-at-best-val reporting
    (``main_moc.py:586-644``)."""
    train_epoch, eval_batch, zs_batch = make_episode_fns(cfg)
    w = jnp.asarray(w)
    w_ext = jnp.asarray(w_ext)

    _, params = init_senet(episode_init_key(seed), cfg)
    opt_state = make_optimizer(cfg).init(params)

    train_chunk = [episode.train]  # train set doubles as an eval split

    zs = {"train": None, "val": None, "test": None}
    if check_zeroshot:
        for name, chunks in (("train", train_chunk), ("val", episode.val), ("test", episode.test)):
            zs[name] = zs_eval_batches(zs_batch, chunks, w, w_ext, cfg).to_dict()
        if log:
            log(f"zero-shot: {zs}")

    best_val, best_epoch = 0.0, 0
    test_at_best, test_acc_at_best = 0.0, 0.0
    best_params = params

    def eval_fn(chunks):
        # late-binds ``params`` so each epoch evaluates the current model
        return _eval_chunks(lambda b: eval_batch(params, b, w, w_ext), chunks, cfg)

    for epoch in range(cfg.num_epochs):
        order = jnp.asarray(episode.train_epoch_order())
        rngs = epoch_slide_keys(seed, epoch, len(order))
        params, opt_state, losses = train_epoch(
            params, opt_state, episode.train, order, rngs, w, w_ext
        )
        # train-split eval feeds ONLY the log lines (the reference prints it,
        # main_moc.py:611-620) — skip the full forward over the train bags
        # when nobody is reading it
        train_eval = eval_fn(train_chunk) if log else None
        val_eval = eval_fn(episode.val)
        if val_eval.auc > best_val:
            test_eval = eval_fn(episode.test)
            best_val = val_eval.auc
            best_epoch = epoch
            test_at_best = test_eval.auc
            test_acc_at_best = test_eval.acc
            best_params = params
            if log:
                log(f"epoch {epoch}: train={train_eval.to_dict()} val={val_eval.to_dict()} "
                    f"test={test_eval.to_dict()} (new best)")
        elif log:
            log(f"epoch {epoch}: train={train_eval.to_dict()} val={val_eval.to_dict()}")

    return EpisodeResult(
        zero_shot_train=zs["train"],
        zero_shot_val=zs["val"],
        zero_shot_test=zs["test"],
        best_val=best_val,
        test_at_best_val=test_at_best,
        test_acc_at_best_val=test_acc_at_best,
        best_epoch=best_epoch,
        params=jax.device_get(best_params),
    )
