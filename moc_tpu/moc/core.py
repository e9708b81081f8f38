"""MOC slide processing: selection union, classifier views, fused pooling.

Rebuild of ``slide_process`` and the fusion math in the reference train/eval
loops (``/root/reference/main_moc.py:322-410``), as pure statically-shaped
functions over padded bags:

  reference                              here
  ---------                              ----
  Python-set union of 4 index policies → boolean-mask OR + fixed-capacity pack
  variable-length ``selected_feat``    → ``[capacity, D]`` + validity mask
  per-view ``[S, C]`` logit tensors    → ``views [4, capacity, C]`` stack
  ``topj_pooling(fused, [topk])``      → ``ops.topj_pooling`` (masked)

The reference's training-time random 50% patch mask (``main_moc.py:329-331``)
is a Bernoulli thinning of the validity mask — rows are masked, not moved, so
shapes stay static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from moc_tpu import ops

# The four classifier slots, in the senet output order used by the reference
# fusion (``main_moc.py:391-394``).
CLASSIFIER_NAMES = ("topk", "delta_softmax", "delta_diff", "bottomk")


def selection_capacity_for(topj: int, n_classes: int, n_padded: int) -> int:
    """Static capacity of the 4-policy selection union, 128-aligned.

    The raw worst-case bound comes from ``ops.selection.selection_capacity``
    (the single source of the formula); this wrapper adds the TPU lane
    alignment policy: round up to a multiple of 128, never beyond the bag.
    """
    from moc_tpu.ops.selection import selection_capacity

    cap = selection_capacity(topj, n_classes, n=n_padded)
    # min AFTER rounding: ceil128(cap) can overshoot a non-128-multiple bag
    # (cap=1500, n_padded=1510 → 1536), breaking the "never beyond the bag"
    # contract for callers that allocate buffers from the return value
    return min(max(128, -(-cap // 128) * 128), n_padded) if cap < n_padded \
        else n_padded


@dataclasses.dataclass(frozen=True)
class MOCConfig:
    """Static episode hyper-parameters (reference CLI defaults,
    ``main_moc.py:29-47`` + ``scripts/moc_train.sh``: topj=400, topk=10)."""

    n_classes: int
    n_ext_classes: int
    topj: int = 400
    topk: int = 10
    discard: tuple[str, ...] = ()
    drop_prob: float = 0.5
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    num_epochs: int = 25
    temperature: float = 56.3477
    feature_dim: int = 512
    approx_topk: bool = False  # TPU approximate top-k for the selection union
    # exact selection backend: "threshold" (bitwise radix threshold search,
    # default — measured 15% faster end-to-end on v5e) or "sort" (batched
    # top_k). Bit-identical outputs; see ``ops.union_selection_threshold``.
    select_method: str = "threshold"
    dense: bool = False  # selection-free fast path (see moc_slide_logits_dense)
    # scoring-matmul dtype for the full-bag pass: "bfloat16" halves its HBM
    # read (the eval hot path's largest term; measured +34% exact-path and
    # +~2.3x dense-path throughput on v5e). Selected rows are re-scored in
    # f32, so views/pooling stay exact; only the union membership can differ
    # for near-tied rows at the rank-topj boundary (same approximation class
    # as approx_topk). Default f32 = bit-exact selection semantics.
    score_dtype: str = "float32"
    # zero-shot pooling family (ref ``zs_evaluation(pooling_func=...)``,
    # main_moc.py:412-432): any ``ops.POOLING_REGISTRY`` key; foreground
    # families pool feats @ w, bottomk families pool feats @ w_ext.
    zs_pooling: str = "topj"
    # exact-path implementation. "masked" computes every classifier view
    # densely (one fused matmul pass) and gates POOLING by the union mask —
    # no gather/compaction/capacity buffers, same selected set, same values
    # (see moc_slide_logits_masked). "gather" is the original compact-then-
    # process formulation (also the bfloat16-scoring path, whose f32
    # re-score needs the gather, and the viz/index-consumer path). "auto"
    # (default) routes by mode, per v5e measurement: inference → masked
    # (1.83×: no [cap, D] gather), training → gather (1.8× at N=16k: the
    # backward only touches capacity rows instead of the whole bag).
    exact_impl: str = "auto"

    def include_flags(self) -> tuple[bool, bool, bool, bool]:
        return tuple(name not in self.discard for name in CLASSIFIER_NAMES)


@struct.dataclass
class SlideViews:
    """Fixed-capacity selection of one slide + the four classifier views.

    Attributes:
      feats:     ``[S, D]`` selected patch features (invalid rows zeroed).
      valid:     ``[S]`` bool — which capacity slots hold real selections.
      idx:       ``[S]`` original row indices (ascending; 0-padded).
      count:     scalar int — true union size.
      views:     ``[4, S, C]`` the four per-patch classifier logit views.
    """

    feats: jax.Array
    valid: jax.Array
    idx: jax.Array
    count: jax.Array
    views: jax.Array


def views_from_logits(logits: jax.Array, logits_ext: jax.Array,
                      n_classes: int) -> jax.Array:
    """The 4 classifier views (ref ``main_moc.py:335-354``) from per-row
    logits ``[M, C]`` + extended logits ``[M, C+C_bg]`` → ``[4, M, C]``:
    raw top, softmax, |top1−top2| margin (broadcast), bg-max (broadcast).

    THE single definition — the gather path (``slide_process``) and the
    masked dense path (``_dense_views_weights``) both call it, so the view
    math cannot drift between training and inference formulations."""
    top2 = jax.lax.top_k(logits, 2)[0]
    margin = jnp.abs(top2[:, 0] - top2[:, 1])
    return jnp.stack([
        logits,
        jax.nn.softmax(logits, axis=1),
        jnp.broadcast_to(margin[:, None], logits.shape),
        jnp.broadcast_to(jnp.max(logits_ext[:, n_classes:], axis=1)[:, None],
                         logits.shape),
    ])


def slide_process(
    feats: jax.Array,
    valid: jax.Array,
    w: jax.Array,
    w_ext: jax.Array,
    cfg: MOCConfig,
    rng: jax.Array | None = None,
) -> SlideViews:
    """Select informative patches and build the four classifier views.

    Args:
      feats: ``[N, D]`` padded bag.
      valid: ``[N]`` patch validity.
      w:     ``[D, C]`` tumor-class zero-shot weights.
      w_ext: ``[D, C_ext]`` extended (tumor+normal) weights.
      rng:   when given, apply the training-time random patch mask — each
             patch kept with prob ``1 - drop_prob`` (ref keeps ``rand > 0.5``).
    """
    n, _ = feats.shape
    if rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.drop_prob, (n,))
        valid = valid & keep

    # one combined matmul = one pass over the [N, D] features (they dominate
    # HBM traffic; two separate matmuls would read them twice)
    c = cfg.n_classes
    w_all = jnp.concatenate([w, w_ext], axis=1)
    if cfg.score_dtype == "bfloat16":
        logits_all = (feats.astype(jnp.bfloat16) @ w_all.astype(jnp.bfloat16)
                      ).astype(jnp.float32)  # [N, C+C_ext]
    else:
        logits_all = feats @ w_all
    logits = logits_all[:, :c]
    logits_ext = logits_all[:, c:]

    capacity = selection_capacity_for(cfg.topj, cfg.n_classes, n)
    idx, sel_valid, count = ops.select_and_gather(
        logits, logits_ext, valid, cfg.topj, cfg.n_classes, capacity,
        discard=cfg.discard, approx=cfg.approx_topk, method=cfg.select_method,
    )

    sel_feats = jnp.where(sel_valid[:, None], feats[idx], 0.0)  # [S, D]
    if cfg.score_dtype == "bfloat16":
        # re-score the selected rows in f32 so the views/pooling are exact
        # regardless of the reduced-precision ranking pass
        sel_all = sel_feats @ w_all  # [S, C+C_ext]
        sel_logits = sel_all[:, :c]
        sel_logits_ext = sel_all[:, c:]
    else:
        sel_logits = jnp.where(sel_valid[:, None], logits[idx], 0.0)  # [S, C]
        sel_logits_ext = jnp.where(sel_valid[:, None], logits_ext[idx], 0.0)

    views = views_from_logits(sel_logits, sel_logits_ext, c)  # [4, S, C]
    return SlideViews(feats=sel_feats, valid=sel_valid, idx=idx, count=count, views=views)


def fuse_views(weights: jax.Array, views: jax.Array, include: tuple[bool, ...]) -> jax.Array:
    """Weighted sum of classifier views (ref ``main_moc.py:390-403``).

    ``weights [S, 4]`` are the senet outputs; ``views [4, S, C]``. Discarded
    classifiers contribute nothing (their senet weight column is unused).
    """
    keep = jnp.asarray(include, weights.dtype)  # [4]
    w = weights * keep[None, :]  # [S, 4]
    return jnp.einsum("sk,ksc->sc", w, views)


def fuse_views_fixed(views: jax.Array, mode: str) -> jax.Array:
    """Ablation fusion without the senet (ref ``ablation_evaluation``,
    ``main_moc.py:538-553``): ``avg`` = 0.25-weighted sum, ``sum`` = plain
    sum, ``max`` = elementwise max over the four views."""
    if mode == "avg":
        return 0.25 * jnp.sum(views, axis=0)
    if mode == "sum":
        return jnp.sum(views, axis=0)
    if mode == "max":
        return jnp.max(views, axis=0)
    raise ValueError(f"unknown ablation mode {mode!r}")


def ablation_slide_logits(
    feats: jax.Array,
    valid: jax.Array,
    w: jax.Array,
    w_ext: jax.Array,
    cfg: MOCConfig,
    mode: str,
) -> jax.Array:
    """Fixed-fusion slide logits for the ablation study (eval-only, so the
    gather-free masked formulation applies under the same routing rule as
    ``moc_slide_logits``)."""
    if cfg.exact_impl != "gather" and cfg.score_dtype == "float32":
        views, _, logits, logits_ext = _dense_views_weights(
            None, {}, feats, w, w_ext, cfg)
        # same union routing as moc_slide_logits_masked so ablation results
        # agree across exact_impl settings under approx_topk/sort
        if cfg.approx_topk or cfg.select_method == "sort":
            union = ops.union_selection(logits, logits_ext, valid, cfg.topj,
                                        cfg.n_classes, cfg.discard,
                                        cfg.approx_topk)
        else:
            union = ops.union_selection_threshold(logits, logits_ext, valid,
                                                  cfg.topj, cfg.n_classes,
                                                  cfg.discard)
        return ops.topj_pooling(fuse_views_fixed(views, mode), union, cfg.topk)
    sel = slide_process(feats, valid, w, w_ext, cfg, None)
    fused = fuse_views_fixed(sel.views, mode)
    return ops.topj_pooling(fused, sel.valid, cfg.topk)


def _dense_views_weights(senet_apply, params, feats, w, w_ext, cfg: MOCConfig,
                         scales=None):
    """One-pass dense computation of every classifier view and the senet
    weights for ALL rows: the scoring matmuls and the senet's first layer
    share a single read of the ``[N, D]`` features (which dominate HBM
    traffic; separately they would stream the tensor twice).

    ``scales`` (``[N]`` f32) marks the int8-resident serving tier: ``feats``
    are per-row-quantized int8 and the fused matmul runs W8A8 on the MXU
    (``ops.quant.int8_row_matmul`` — int32 accumulation, scales applied to
    the small ``[N, C+...]`` result, never to the ``[N, D]`` operand).

    Returns ``(views [4, N, C], weights [N, 4], logits [N, C],
    logits_ext [N, C_ext])``.
    """
    c = cfg.n_classes
    senet_p = params.get("params", {}) if isinstance(params, dict) else {}
    fused_senet = {"Dense_0", "Dense_1"} <= set(senet_p)
    cols = [w, w_ext]
    if fused_senet:
        cols.append(senet_p["Dense_0"]["kernel"])
    w_cat = jnp.concatenate(cols, axis=1)
    if scales is not None:
        from moc_tpu.ops.quant import int8_row_matmul

        out_all = int8_row_matmul(feats, scales, w_cat)
    elif cfg.score_dtype == "bfloat16":
        out_all = (feats.astype(jnp.bfloat16) @ w_cat.astype(jnp.bfloat16)
                   ).astype(jnp.float32)
    else:
        out_all = feats @ w_cat
    logits = out_all[:, :c]
    logits_ext = out_all[:, c : c + w_ext.shape[1]]
    views = views_from_logits(logits, logits_ext, c)  # [4, N, C]
    if fused_senet:
        hidden = jax.nn.relu(out_all[:, c + w_ext.shape[1] :]
                             + senet_p["Dense_0"]["bias"])
        weights = jax.nn.sigmoid(hidden @ senet_p["Dense_1"]["kernel"]
                                 + senet_p["Dense_1"]["bias"])  # [N, 4]
    elif senet_apply is not None:
        if scales is not None:
            from moc_tpu.ops.quant import dequantize_rows

            weights = senet_apply(params, dequantize_rows(feats, scales))
        else:
            weights = senet_apply(params, feats)  # [N, 4]
    else:  # senet-free caller (ablation fixed fusion)
        weights = None
    return views, weights, logits, logits_ext


def moc_slide_logits_masked(
    senet_apply,
    params,
    feats: jax.Array,
    valid: jax.Array,
    w: jax.Array,
    w_ext: jax.Array,
    cfg: MOCConfig,
    rng: jax.Array | None = None,
    scales: jax.Array | None = None,
) -> jax.Array:
    """Exact MOC forward without gather/compaction (the default exact path).

    The selection union's only effect on the final prediction is pooling
    *eligibility*: every classifier view and the senet weighting are
    row-local functions of a patch's own features/logits. So instead of
    compacting the union into a ``[capacity, D]`` buffer and re-processing
    it (``slide_process``), compute all views densely in ONE fused matmul
    pass and gate ``topj_pooling`` with the union BOOLEAN mask. Same
    selected SET exactly; per-row values match the gather path to float
    tolerance (the reductions run at different shapes — ``[S, *]`` vs
    ``[N, *]`` — so summation trees differ at the last ulp; tests assert
    allclose, not bit equality), no
    capacity buffers, no ``[cap, D]`` gather — measured ~2× the gather
    formulation on v5e at topj=400/N=16k (the gather/compaction machinery
    was 0.64 + 0.35 ms of the 1.67 ms batch-8 forward).
    """
    n = feats.shape[0]
    if rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.drop_prob, (n,))
        valid = valid & keep
    views, weights, logits, logits_ext = _dense_views_weights(
        senet_apply, params, feats, w, w_ext, cfg, scales=scales)
    if cfg.approx_topk or cfg.select_method == "sort":
        union = ops.union_selection(logits, logits_ext, valid, cfg.topj,
                                    cfg.n_classes, cfg.discard, cfg.approx_topk)
    else:
        union = ops.union_selection_threshold(logits, logits_ext, valid,
                                              cfg.topj, cfg.n_classes,
                                              cfg.discard)
    fused = fuse_views(weights, views, cfg.include_flags())
    return ops.topj_pooling(fused, union, cfg.topk)


def moc_slide_logits(
    senet_apply,
    params,
    feats: jax.Array,
    valid: jax.Array,
    w: jax.Array,
    w_ext: jax.Array,
    cfg: MOCConfig,
    rng: jax.Array | None = None,
    scales: jax.Array | None = None,
) -> jax.Array:
    """Full MOC forward for one slide: pooled slide logits ``[C]``.

    Routing (see ``MOCConfig.exact_impl``): the gather-free masked
    formulation for inference (``rng is None``) and the compact-then-process
    path for training steps under the default ``"auto"`` — both produce the
    same values (tested), they differ only in speed per mode. bfloat16
    SCORING of f32-resident features always takes the gather path (its
    exactness guarantee depends on the f32 re-score of the gathered rows,
    ``slide_process``) — but bf16-RESIDENT features (the opt-in
    ``storage_dtype`` serving tier: stored/transferred at half width) stay
    on the masked path: there is no wider original to re-score, so the
    masked formulation is as exact as the gather one given the quantized
    inputs (measured 1.41× on v5e at 16k patches — the eval wall is the
    HBM read of the features).
    """
    if scales is not None:
        # int8-resident serving tier: masked-only (there is no wider original
        # to gather-and-re-score, and the W8A8 matmul IS the point); the
        # gather/training formulation would have to materialize dequantized
        # rows, re-paying the bytes the tier exists to avoid.
        if rng is not None:
            raise ValueError(
                "int8-resident features are a serving tier: training "
                "(rng != None) needs f32/bf16 bags")
        return moc_slide_logits_masked(senet_apply, params, feats, valid,
                                       w, w_ext, cfg, rng, scales=scales)
    use_masked = cfg.exact_impl == "masked" or (
        cfg.exact_impl == "auto" and rng is None
    )
    if use_masked and (cfg.score_dtype == "float32"
                       or feats.dtype == jnp.bfloat16):
        return moc_slide_logits_masked(senet_apply, params, feats, valid,
                                       w, w_ext, cfg, rng)
    sel = slide_process(feats, valid, w, w_ext, cfg, rng)
    weights = senet_apply(params, sel.feats)  # [S, 4]
    fused = fuse_views(weights, sel.views, cfg.include_flags())
    return ops.topj_pooling(fused, sel.valid, cfg.topk)


@struct.dataclass
class EvalPack:
    """Epoch-invariant eval precomputation for one slide.

    With ``rng=None`` (every eval), the selection union and all four
    classifier views depend only on the frozen zero-shot weights — the
    trained senet enters the forward ONLY through the per-row weighting.
    The reference recomputes the whole pipeline per slide per epoch
    (``slide_process`` inside ``evaluation``, ``main_moc.py:462-520``);
    precomputing it once per episode removes the selection searches and the
    scoring matmuls from the epoch loop and shrinks every remaining eval op
    from bag rows ``N`` to union capacity ``S``.

    Attributes:
      feats: ``[S, D]`` selected patch features (invalid rows zeroed).
      valid: ``[S]`` which capacity slots hold real selections.
      views: ``[4, S, C]`` the four classifier views of the selected rows.
    """

    feats: jax.Array
    valid: jax.Array
    views: jax.Array


def precompute_eval_pack(
    feats: jax.Array,
    valid: jax.Array,
    w: jax.Array,
    w_ext: jax.Array,
    cfg: MOCConfig,
) -> EvalPack:
    """Selection + views of one slide, hoisted out of the epoch loop.

    The exact tiers (incl. ``score_dtype="bfloat16"``, whose f32 re-score
    lives in ``slide_process``) pack the compacted union; the ``dense`` tier
    has no selection, so its pack is the full bag with dense views."""
    if cfg.dense:
        views, _, _, _ = _dense_views_weights(None, {}, feats, w, w_ext, cfg)
        return EvalPack(feats=feats, valid=valid, views=views)
    sel = slide_process(feats, valid, w, w_ext, cfg, None)
    return EvalPack(feats=sel.feats, valid=sel.valid, views=sel.views)


def moc_logits_packed(senet_apply, params, pack: EvalPack, cfg: MOCConfig) -> jax.Array:
    """Pooled slide logits from a precomputed ``EvalPack`` — the per-epoch
    remainder of the eval forward: senet weighting, view fusion, pooling."""
    weights = senet_apply(params, pack.feats)  # [S, 4]
    fused = fuse_views(weights, pack.views, cfg.include_flags())
    return ops.topj_pooling(fused, pack.valid, cfg.topk)


def moc_slide_logits_dense(
    senet_apply,
    params,
    feats: jax.Array,
    valid: jax.Array,
    w: jax.Array,
    w_ext: jax.Array,
    cfg: MOCConfig,
    rng: jax.Array | None = None,
    scales: jax.Array | None = None,
) -> jax.Array:
    """Selection-free MOC forward (the TPU "dense" fast path).

    Like ``moc_slide_logits_masked`` but with the union mask dropped
    entirely: every valid row is pool-eligible. An approximation of the
    reference semantics — differs only when a row outside the 4×topj union
    would rank in the fused top-``topk``.
    """
    n = feats.shape[0]
    if rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.drop_prob, (n,))
        valid = valid & keep
    views, weights, _, _ = _dense_views_weights(
        senet_apply, params, feats, w, w_ext, cfg, scales=scales)
    fused = fuse_views(weights, views, cfg.include_flags())
    return ops.topj_pooling(fused, valid, cfg.topk)
