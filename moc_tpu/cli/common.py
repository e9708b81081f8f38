"""Shared CLI plumbing: the performance-tier flags of ``MOCConfig``.

The reference has no equivalent knobs (its hot path is eager torch,
``/root/reference/main_moc.py:322-375``); these expose the TPU fast paths —
dense selection-free forward, bfloat16 scoring, threshold/sort/approx top-k —
on every entry point so the benchmarked tiers are user-reachable.
"""

from __future__ import annotations

import argparse
import sys


def setup_runtime(args: argparse.Namespace) -> None:
    """Per-CLI runtime setup: optional platform override + the persistent
    XLA compilation cache (``utils.compile_cache``) so re-invocations load
    compiled programs from disk instead of re-paying minute-scale compiles.
    Call before any jax program is built.

    ``--xprof DIR`` starts a ``jax.profiler`` trace for the whole
    invocation (stopped at interpreter exit via atexit); open the dir in
    TensorBoard/XProf for the device timeline with collective attribution
    (``utils.profiling``, SURVEY §5.1)."""
    # multi-process pods: join the global runtime BEFORE any backend use.
    # Env-driven (MOC_TPU_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID); a no-op
    # in the ordinary single-process case.
    from moc_tpu.parallel.runtime import initialize_runtime

    initialize_runtime()
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    from moc_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    if getattr(args, "xprof", None):
        import atexit

        import jax

        jax.profiler.start_trace(args.xprof)
        atexit.register(jax.profiler.stop_trace)


def serving_mesh():
    """Visible devices as a 1-axis ``data`` mesh, or ``None`` on a single
    device. The serving CLIs (``predict``, ``extract_features``) use it for
    pure batch sharding: params replicated, inputs split on ``data``,
    results elementwise-identical to the single-device run.

    In a multi-process runtime (``parallel.runtime``) this is the LOCAL
    devices only: serving work is sharded by slide across processes (each
    feeds its own inputs), so each process batches over its own chips —
    a global mesh would require every process to feed identical batches."""
    import numpy as np

    import jax

    devices = (jax.local_devices() if jax.process_count() > 1
               else jax.devices())
    if len(devices) <= 1:
        return None
    return jax.sharding.Mesh(np.array(devices), ("data",))


def replicate_to_mesh(tree, mesh):
    """Replicate a pytree of arrays onto every device of ``mesh`` (identity
    when ``mesh`` is ``None``) — the placement for serving-CLI parameters
    and closed-over weight matrices whose batches shard on ``data``."""
    if mesh is None:
        return tree
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.device_put(tree, NamedSharding(mesh, PartitionSpec()))


def round_up_to_mesh(batch_size: int, mesh) -> int:
    """Round ``batch_size`` up to a ``mesh``-device-count multiple so data
    batches divide evenly (stderr note when it changes)."""
    if mesh is None or batch_size % mesh.size == 0:
        return batch_size
    rounded = -(-batch_size // mesh.size) * mesh.size
    print(f"data-parallel over {mesh.size} devices: batch_size rounded up "
          f"to {rounded}", file=sys.stderr)
    return rounded


def add_perf_flags(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("performance tiers")
    g.add_argument("--dense", action="store_true",
                   help="selection-free fused forward (fastest; differs from "
                        "reference semantics only when a row outside the "
                        "4xtopj union would rank in the fused top-k)")
    g.add_argument("--score_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="dtype of the full-bag scoring matmul; bfloat16 "
                        "halves its HBM read (selected rows re-scored in f32)")
    g.add_argument("--select_method", default="threshold",
                   choices=["threshold", "sort"],
                   help="exact selection backend (bit-identical outputs)")
    g.add_argument("--approx_topk", action="store_true",
                   help="TPU approximate top-k for the selection union")
    from moc_tpu.ops import POOLING_REGISTRY

    p.add_argument("--zs_pooling", default="topj",
                   choices=sorted(POOLING_REGISTRY),
                   help="zero-shot pooling family (ref zs_evaluation "
                        "pooling_func; bottomk families use the extended bank)")


def perf_cfg_kwargs(args: argparse.Namespace) -> dict:
    """``MOCConfig`` kwargs for the flags added by ``add_perf_flags``."""
    return dict(
        dense=args.dense,
        score_dtype=args.score_dtype,
        select_method=args.select_method,
        approx_topk=args.approx_topk,
        zs_pooling=args.zs_pooling,
    )
