"""Fold-parallel (vmapped) MIL baseline training: all folds, ONE program.

The reference trains baseline MIL models one fold per process
(``utils/core_utils.py:105-291`` driven by external scripts); the streaming
rebuild (``train.mil.train_fold``) runs one fold per call. Here the few-shot
fold grid gets the same treatment as the MOC sweep (``moc.sweep``): stack
the folds' padded bags, scan epochs / slides on device, evaluate with
device-side AUC, and ``vmap`` the whole fold over a leading axis —
shardable over the mesh ``data`` axis.

Faithfulness notes vs ``train_fold``:
  * slide order is the stacked order (the streaming path's order is the
    bucket-sorted loader order) — SGD trajectories therefore differ from
    the streaming trainer run-to-run, like any reordering; quality parity
    is asserted statistically in tests.
  * early stopping follows the reference ``EarlyStopping`` semantics
    (patience on val AUC, active only past ``stop_epoch``); a stopped fold
    freezes its parameters and best-tracking while the other folds continue
    (the scan is static-length).
  * multiclass AUC uses the baseline ``ovr``-macro protocol on device
    (``metrics.auc_ovr_macro``); binary is P(class 1), identical to host.
  * ``weighted_sample`` runs fused: a per-epoch on-device class-balanced
    resample with replacement (``jax.random.choice`` over inverse-class-
    frequency weights — the reference's ``WeightedRandomSampler`` epoch
    semantics with the jax RNG instead of torch's host RNG).
  * every model type compiles and trains fused, TransMIL included: the r2
    compile pathology (~105 s of XLA-CPU compile per ``scan(grad)`` nesting
    level) was the grouped depthwise-conv VJPs in NystromAttention/PPEG;
    with those as shifted-add slices the full
    ``vmap(scan(scan(grad(TransMIL))))`` grid compiles in ~54 s on XLA-CPU
    (measured round 3; CLAM-class models compile in seconds as before).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from moc_tpu.metrics.auc import auc_binary, auc_ovr_macro
from moc_tpu.metrics.classification import balanced_accuracy
from moc_tpu.moc.sweep import StackedEpisode
from moc_tpu.train.mil import MilTrainConfig, bag_loss_fn, build_model, make_optimizer


@struct.dataclass
class FusedFoldResult:
    """Per-fold outputs (leading fold axis when vmapped)."""

    val_auc: jax.Array
    val_acc: jax.Array
    test_auc: jax.Array
    test_acc: jax.Array
    test_bacc: jax.Array
    stop_epoch: jax.Array
    best_params: dict


def _device_auc(probs, labels, valid, n_classes: int):
    if n_classes == 2:
        return auc_binary(probs[:, 1], labels, valid)
    return auc_ovr_macro(probs, labels, valid, n_classes)


def _weighted_epoch_order(labels, key, n_classes: int):
    """On-device class-balanced resample with replacement — the fused
    equivalent of the reference's ``WeightedRandomSampler`` epoch
    (``make_weights_for_balanced_classes_split``, ``utils/utils.py:383-397``:
    per-sample weight ``N / count(class)``). Filler rows (label < 0) get
    weight 0 and are never drawn."""
    b = labels.shape[0]
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    oh = jax.nn.one_hot(safe, n_classes) * valid[:, None].astype(jnp.float32)
    counts = jnp.sum(oh, axis=0)  # [C]
    w = jnp.where(valid, (jnp.sum(valid) / jnp.maximum(counts, 1.0))[safe], 0.0)
    w = w / jnp.sum(w)
    return jax.random.choice(key, b, shape=(b,), replace=True, p=w)


def make_mil_fold_fn(cfg: MilTrainConfig):
    """Build ``run(episode, seed) -> FusedFoldResult`` for ONE fold;
    vmap over a leading fold axis for the grid."""
    model, forward, init_fn = build_model(cfg, grad_friendly=True)
    bag_loss = bag_loss_fn(cfg.bag_loss)
    optimizer = make_optimizer(cfg)

    def slide_loss(params, feats, valid, label, rng):
        logits, inst_loss = forward(params, feats, valid, label, train=True,
                                    rng=rng)
        loss = bag_loss(logits[None], label[None])[0]
        if cfg.model_type in ("clam_sb", "clam_mb"):
            loss = cfg.bag_weight * loss + (1 - cfg.bag_weight) * inst_loss
        return loss

    def eval_split(params, feats, mask, labels):
        logits = jax.vmap(lambda f, v: forward(params, f, v, None)[0])(feats, mask)
        valid = labels >= 0
        probs = jax.nn.softmax(logits, axis=1)
        auc = _device_auc(probs, labels, valid, cfg.n_classes)
        hit = (jnp.argmax(logits, axis=1) == labels) & valid
        acc = jnp.sum(hit) / jnp.maximum(jnp.sum(valid), 1)
        bacc = balanced_accuracy(logits, labels, cfg.n_classes, valid)
        return auc, acc, bacc

    def run(episode: StackedEpisode, seed) -> FusedFoldResult:
        b = episode.train_feats.shape[0]
        params = init_fn(jax.random.fold_in(jax.random.PRNGKey(cfg.seed), seed),
                         episode.train_feats[0], episode.train_mask[0])
        opt_state = optimizer.init(params)

        def epoch_body(carry, epoch):
            params, opt_state, best, best_params = carry
            best_val, counter, stopped, stop_epoch = best
            ekey = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), seed), epoch)

            def slide_body(inner, inp):
                params, opt_state = inner
                pos, i = inp  # visit position (rng) / slide row (data)
                rng = jax.random.fold_in(ekey, pos)
                loss, grads = jax.value_and_grad(slide_loss)(
                    params, episode.train_feats[i], episode.train_mask[i],
                    episode.train_labels[i], rng)
                updates, new_opt = optimizer.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                # a stopped fold freezes: parameters, moments, schedule.
                # Filler rows (label -1) must not step either — the CE's
                # take_along_axis would wrap -1 to class C-1 and silently
                # train toward it (the weighted order already excludes them
                # by weight 0; the plain arange order did not)
                skip = stopped | (episode.train_labels[i] < 0)
                params = jax.tree.map(
                    lambda new, old: jnp.where(skip, old, new),
                    new_params, params)
                opt_state = jax.tree.map(
                    lambda new, old: jnp.where(skip, old, new),
                    new_opt, opt_state)
                return (params, opt_state), loss

            if cfg.weighted_sample:
                # fold_in(ekey, b) cannot collide with the per-visit keys
                # (positions are < b)
                order = _weighted_epoch_order(
                    episode.train_labels, jax.random.fold_in(ekey, b),
                    cfg.n_classes)
            else:
                order = jnp.arange(b)
            (params, opt_state), _ = jax.lax.scan(
                slide_body, (params, opt_state), (jnp.arange(b), order))

            val_auc, _, _ = eval_split(params, episode.val_feats,
                                       episode.val_mask, episode.val_labels)
            improved = (~stopped) & (val_auc > best_val)
            best_val = jnp.where(improved, val_auc, best_val)
            best_params = jax.tree.map(
                lambda new, old: jnp.where(improved, new, old), params, best_params)
            counter = jnp.where(improved, 0, counter + 1)
            trip = (cfg.early_stopping & (counter >= cfg.patience)
                    & (epoch > cfg.stop_epoch) & (~stopped))
            stop_epoch = jnp.where(trip, epoch, stop_epoch)
            stopped = stopped | trip
            return (params, opt_state, (best_val, counter, stopped, stop_epoch),
                    best_params), None

        init_best = (jnp.float32(-jnp.inf), jnp.int32(0), jnp.bool_(False),
                     jnp.int32(cfg.max_epochs))
        (_, _, best, best_params), _ = jax.lax.scan(
            epoch_body, (params, opt_state, init_best, params),
            jnp.arange(cfg.max_epochs))

        # final summaries with the best-val params (ref core_utils.py:255-291)
        val_auc, val_acc, _ = eval_split(best_params, episode.val_feats,
                                         episode.val_mask, episode.val_labels)
        test_auc, test_acc, test_bacc = eval_split(
            best_params, episode.test_feats, episode.test_mask,
            episode.test_labels)
        return FusedFoldResult(
            val_auc=val_auc, val_acc=val_acc, test_auc=test_auc,
            test_acc=test_acc, test_bacc=test_bacc, stop_epoch=best[3],
            best_params=best_params,
        )

    return run


@functools.lru_cache(maxsize=8)
def _stacked_fold_jit(cfg: MilTrainConfig):
    """Jitted fold-vmapped MIL trainer, memoized on the frozen config —
    repeated grid/serving calls in one process re-dispatch instead of
    re-tracing (same reasoning as ``moc.sweep._stacked_sweep_jit``)."""
    return jax.jit(jax.vmap(make_mil_fold_fn(cfg), in_axes=(0, 0)))


@functools.lru_cache(maxsize=8)
def _pooled_fold_jit(cfg: MilTrainConfig):
    """Pooled variant of ``_stacked_fold_jit`` (on-device episode gathers
    from a shared slide pool)."""
    from moc_tpu.moc.sweep import assemble_episode

    run_one = make_mil_fold_fn(cfg)

    def run_pooled(pool_feats, pool_mask, ix, seed):
        return run_one(assemble_episode(pool_feats, pool_mask, ix), seed)

    return jax.jit(jax.vmap(run_pooled, in_axes=(None, None, 0, 0)))


def run_mil_folds_fused(
    episodes: StackedEpisode,
    cfg: MilTrainConfig,
    seeds=None,
    mesh: jax.sharding.Mesh | None = None,
    episode_axis: str = "data",
) -> FusedFoldResult:
    """Run ``F`` stacked folds (leading axis) as one compiled program,
    optionally sharded over the mesh ``data`` axis."""
    from moc_tpu.moc.sweep import shard_episodes

    fn = _stacked_fold_jit(cfg)
    f = np.asarray(episodes.train_feats).shape[0]
    if seeds is None:
        seeds = jnp.arange(f, dtype=jnp.int32)
    episodes = shard_episodes(episodes, mesh, episode_axis)
    seeds = shard_episodes(seeds, mesh, episode_axis)
    return fn(episodes, seeds)


def run_mil_folds_fused_pooled(
    pooled,
    cfg: MilTrainConfig,
    seeds=None,
    mesh: jax.sharding.Mesh | None = None,
    episode_axis: str = "data",
) -> FusedFoldResult:
    """``run_mil_folds_fused`` over a deduplicated slide pool
    (``moc.sweep.PooledEpisodes``): folds of one grid share corpus slides
    (typically the whole test cohort), so the union of slides transfers
    once and each fold's bags are assembled by on-device gathers inside
    the compiled program — the same transfer dedupe as the MOC pooled
    sweep (DESIGN.md §9b). Results match the stacked path (tested)."""
    from moc_tpu.moc.sweep import replicate_on_mesh, shard_episodes

    fn = _pooled_fold_jit(cfg)
    f = np.asarray(pooled.index.train_idx).shape[0]
    if seeds is None:
        seeds = jnp.arange(f, dtype=jnp.int32)
    pool_feats = replicate_on_mesh(pooled.pool_feats, mesh)
    pool_mask = replicate_on_mesh(pooled.pool_mask, mesh)
    index = shard_episodes(pooled.index, mesh, episode_axis)
    seeds = shard_episodes(seeds, mesh, episode_axis)
    return fn(pool_feats, pool_mask, index, seeds)
