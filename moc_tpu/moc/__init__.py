"""moc_tpu.moc — the MOC algorithm core (the paper's contribution), TPU-native.

Rebuild of ``/root/reference/main_moc.py``: zero-shot patch scoring against
two prompt-derived weight matrices, union-of-four-policies patch selection,
an SE-net per-patch fusion of four classifier views, top-k pooling, and the
few-shot episode protocol (25 epochs, per-slide Adam steps, best-val-AUC
model selection, zero-shot floor).

Everything inside an episode is statically shaped: bags are padded+masked,
the selection union is packed to a fixed capacity, the train epoch is a
``lax.scan`` over an oversampled slide order, and evaluation is vmapped over
slides — so one XLA program per (bucket, shape) services every fold/shot.
"""

from moc_tpu.moc.core import (
    MOCConfig,
    SlideViews,
    ablation_slide_logits,
    selection_capacity_for,
    slide_process,
    fuse_views,
    fuse_views_fixed,
    moc_slide_logits,
    moc_slide_logits_dense,
    moc_slide_logits_masked,
)
from moc_tpu.moc.episode import (
    EpisodeResult,
    EvalMetrics,
    ablation_evaluation,
    init_senet,
    make_episode_fns,
    run_episode,
    zs_eval_batches,
)
from moc_tpu.moc.sweep import (
    EpisodeIndex,
    PooledEpisodes,
    StackedEpisode,
    SweepResult,
    assemble_episode,
    episode_from_bags,
    episode_index,
    make_sweep_fn,
    pack_slide_pool,
    pad_and_stack_episodes,
    pool_episode_bags,
    pool_episode_splits,
    pooled_bytes_estimate,
    run_sweep,
    run_sweep_pooled,
    stack_episode_bags,
    stack_episodes,
    sweep_episode_results,
    unique_split_ids,
)

__all__ = [
    "MOCConfig",
    "SlideViews",
    "selection_capacity_for",
    "slide_process",
    "fuse_views",
    "fuse_views_fixed",
    "ablation_slide_logits",
    "ablation_evaluation",
    "moc_slide_logits",
    "moc_slide_logits_dense",
    "moc_slide_logits_masked",
    "EpisodeResult",
    "EvalMetrics",
    "init_senet",
    "make_episode_fns",
    "run_episode",
    "zs_eval_batches",
    "EpisodeIndex",
    "PooledEpisodes",
    "StackedEpisode",
    "SweepResult",
    "assemble_episode",
    "episode_from_bags",
    "episode_index",
    "make_sweep_fn",
    "pack_slide_pool",
    "pad_and_stack_episodes",
    "pool_episode_bags",
    "pool_episode_splits",
    "pooled_bytes_estimate",
    "run_sweep",
    "run_sweep_pooled",
    "stack_episode_bags",
    "stack_episodes",
    "sweep_episode_results",
    "unique_split_ids",
]
