"""Per-patch maps from TRAINED MIL heads — the heatmap quantities the
reference exposes for model inspection but never wires to a tool:

* CLAM/ABMIL attention weights (``model_clam.py:175-219``: ``A`` after the
  masked softmax) — the classic CLAM heatmap signal;
* CHIEF ``patch_probs`` (``model_chief.py:173-195``:
  ``sigmoid(attention) × P(class 1 | patch)``);
* patch-level class logits (``eval_utils.eval_lynature``,
  ``eval_utils.py:78-113`` with ``patch_eval=True``).

``trained_patch_maps`` runs one bag through a checkpointed head and returns
named ``[N]`` scalar maps plus (where defined) an ``[N, C]`` per-class score
matrix, both host numpy — ready for ``viz.render_heatmap``. The CLI face is
``python -m moc_tpu.cli.visualize --model_msgpack …``.
"""

from __future__ import annotations

import numpy as np


def trained_patch_maps(cfg, params, feats: np.ndarray, valid: np.ndarray,
                       *, anatomic: int = 0):
    """Run a trained MIL head over one bag → patch-level maps.

    ``cfg`` is a ``train.mil.MilTrainConfig``; ``params`` the loaded
    checkpoint tree; ``feats [N, D]``, ``valid [N]`` bool.

    Returns ``(maps, class_scores, scores_are_probs)``:

    * ``maps``: ``{name: np.ndarray [N]}`` scalar per-patch maps
      (``attn`` / ``attn_c<k>`` attention weights, CHIEF ``patchprob``);
    * ``class_scores``: ``[N, C]`` per-class patch scores or ``None``
      (CHIEF's heatmap quantity is class-1-only, per the reference);
    * ``scores_are_probs``: True when ``class_scores`` are already
      probabilities (the ``mil`` head emits softmax ``patch_probs``).
    """
    import jax.numpy as jnp

    from moc_tpu.train.mil import build_model

    t = cfg.model_type
    model, _, _ = build_model(cfg)
    f = jnp.asarray(feats, jnp.float32)
    v = jnp.asarray(valid, bool)

    if t in ("clam_sb", "clam_mb", "abmil"):
        out = model.apply(params, f, v)
        w = np.asarray(out["attention_weights"], np.float32)  # [K, N]
        if t == "clam_mb":
            maps = {f"attn_c{k}": w[k] for k in range(w.shape[0])}
        else:
            maps = {"attn": w[0]}
        return maps, np.asarray(out["patch_logits"], np.float32), False
    if t == "transmil":
        out = model.apply(params, f, v)
        return {}, np.asarray(out["patch_logits"], np.float32), False
    if t == "mil":
        out = model.apply(params, f, v)
        return {}, np.asarray(out["patch_probs"], np.float32), True
    if t == "chief":
        out = model.apply(params, f, v, anatomic, method="patch_probs")
        maps = {
            "patchprob": np.asarray(out["patch_prob"], np.float32),
            "attn": np.asarray(
                1.0 / (1.0 + np.exp(-np.asarray(out["attention_raw"],
                                                np.float64))), np.float32),
        }
        return maps, None, False
    raise ValueError(
        f"no patch-level maps for model_type {t!r} (titan pools coords into "
        "a slide embedding with no per-patch scores)")


def moc_patch_maps(senet_params, feats: np.ndarray, valid: np.ndarray,
                   w: np.ndarray, w_ext: np.ndarray, cfg):
    """Per-patch maps from a trained MOC senet — the flagship model's own
    interpretability surface (quantities the reference computes inside
    ``slide_process``/``train``, ``main_moc.py:322-410``, but never renders):

    * the FUSED per-patch class logits (senet-weighted view combination);
    * the union-selection eligibility mask (which patches the 4 index
      policies admitted to pooling, ``main_moc.py:335-354``);
    * the four senet view weights per patch (which classifier view drives
      each patch: topk / delta_softmax / delta_diff / bottomk).

    ``cfg`` is a ``moc.MOCConfig``. Returns ``(maps, fused)``: ``maps`` =
    ``{"union": [N] float 0/1, "w_<view>": [N]}``, ``fused [N, C]`` patch
    logits (computed for every valid row; gate by ``maps["union"]`` to show
    only pooling-eligible patches).
    """
    import jax.numpy as jnp

    from moc_tpu import ops
    from moc_tpu.moc.core import (CLASSIFIER_NAMES, _dense_views_weights,
                                  fuse_views)

    f = jnp.asarray(feats, jnp.float32)
    v = jnp.asarray(valid, bool)
    views, weights, logits, logits_ext = _dense_views_weights(
        None, senet_params, f, jnp.asarray(w), jnp.asarray(w_ext), cfg)
    if weights is None:
        raise ValueError("senet checkpoint did not produce view weights — "
                         "pass the params tree written by cli.main_moc/sweep")
    if cfg.approx_topk or cfg.select_method == "sort":
        union = ops.union_selection(logits, logits_ext, v, cfg.topj,
                                    cfg.n_classes, cfg.discard,
                                    cfg.approx_topk)
    else:
        union = ops.union_selection_threshold(logits, logits_ext, v,
                                              cfg.topj, cfg.n_classes,
                                              cfg.discard)
    fused = fuse_views(weights, views, cfg.include_flags())
    maps = {"union": np.asarray(union, np.float32)}
    wn = np.asarray(weights, np.float32)
    for i, name in enumerate(CLASSIFIER_NAMES):
        if cfg.include_flags()[i]:
            maps[f"w_{name}"] = wn[:, i]
    return maps, np.asarray(fused, np.float32)
