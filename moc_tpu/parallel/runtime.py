"""Multi-process runtime bootstrap: N host processes → one JAX runtime.

The reference's multi-node story is launcher-initialized
``torch.distributed`` process groups (torchscale
``component/xmoe/global_groups.py:11-61``); the MOC path itself never
leaves one process. Here multi-process execution is a first-class runtime
concern: each process (one per TPU host on a pod, or per slice worker in a
multi-slice job) calls :func:`initialize_runtime` once at startup, after
which ``jax.devices()`` is the GLOBAL device set and every mesh helper
(``parallel.mesh.make_mesh`` / ``make_hybrid_mesh``) and jitted program in
the framework runs unchanged — XLA routes collectives over ICI within a
slice and DCN across slices.

Division of labor with the rest of the framework:

  * ``data/loader.py`` shards slide lists per process via
    ``(jax.process_index(), jax.process_count())`` — each host reads only
    its own bags; :func:`host_local_to_global` assembles the per-host
    shards into one global array for pjit programs.
  * ``utils/checkpoint.py`` (orbax) already coordinates multi-process
    saves once the runtime is initialized.
  * ``cli/common.setup_runtime`` calls :func:`initialize_runtime` (the
    env-driven form) on every entry point, so any CLI becomes pod-ready by
    exporting ``MOC_TPU_COORDINATOR`` / ``MOC_TPU_NUM_PROCESSES`` /
    ``MOC_TPU_PROCESS_ID`` — and stays a no-op single-process otherwise.

Exercised for real in ``tests/test_runtime.py``: two OS processes × 4 CPU
devices form one 8-device mesh and agree on psum/broadcast results.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

_initialized = False


def _env(*names: str) -> str | None:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def initialize_runtime(coordinator_address: str | None = None,
                       num_processes: int | None = None,
                       process_id: int | None = None,
                       local_device_ids: Sequence[int] | None = None) -> bool:
    """Join this process to a multi-process JAX runtime. Idempotent.

    Resolution order per field: explicit argument → ``MOC_TPU_*`` env var
    (``MOC_TPU_COORDINATOR``, ``MOC_TPU_NUM_PROCESSES``,
    ``MOC_TPU_PROCESS_ID``) → JAX's own cluster auto-detection (GCE TPU
    pod metadata, SLURM, …) when a coordinator address is present but
    counts are not. Returns ``True`` if the distributed client was (or
    already is) initialized, ``False`` when nothing is configured — the
    ordinary single-process case, where this is a cheap no-op.

    Must run BEFORE any jax device/compile call (the backend binds the
    device topology at first use; ``cli/common.setup_runtime`` orders
    this correctly for every CLI).
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or _env("MOC_TPU_COORDINATOR")
    if num_processes is None:
        v = _env("MOC_TPU_NUM_PROCESSES")
        num_processes = int(v) if v else None
    if process_id is None:
        v = _env("MOC_TPU_PROCESS_ID")
        process_id = int(v) if v else None
    if coordinator_address is None and num_processes is None:
        return False  # single-process run; leave jax untouched

    import jax

    kwargs: dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # e.g. a framework launcher beat us to it
        # jax >= 0.4 wording: "distributed.initialize should only be called
        # once"; older/other builds say "already initialized"
        msg = str(e).lower()
        if ("already initialized" not in msg
                and "should only be called once" not in msg):
            raise
    _initialized = True
    return True


def is_initialized() -> bool:
    return _initialized


def barrier(name: str = "moc_tpu_barrier") -> None:
    """Block until every process reaches this point (no-op single-process).

    The TPU-native replacement for the reference MoE layer's
    shape-agreement ``dist.all_reduce(MAX)`` barrier
    (``xmoe/moe_layer.py:179-183``): use it around non-SPMD host work
    (checkpoint writes, result-file publication) — SPMD programs need no
    explicit barriers."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_from_leader(tree):
    """Every process returns process 0's value of ``tree`` (pytree of
    arrays/scalars). Use for run-level agreement: seeds, sampled episode
    orders, config digests. Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def assert_same_across_processes(x, name: str = "value") -> None:
    """Raise if ``x`` (array/scalar) differs between processes — the
    desynchronization tripwire (differing shapes/values across hosts hang
    or corrupt SPMD programs far from the cause). No-op single-process."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    gathered = np.asarray(multihost_utils.process_allgather(np.asarray(x)))
    if not (gathered == gathered[0]).all():
        raise AssertionError(
            f"{name} differs across processes: {gathered.tolist()}")


def host_local_to_global(x, mesh, spec):
    """Assemble per-process host-local shards into one global jax.Array
    laid out as ``NamedSharding(mesh, spec)``. Each process passes ONLY
    its local shard (e.g. the bags its ``BagLoader`` read); the result
    feeds pjit programs addressing the full global batch."""
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(x, mesh, spec)


def global_to_host_local(x, mesh, spec):
    """Inverse of :func:`host_local_to_global`: split a global array back
    into this process's host-local shard (e.g. to write per-host result
    files)."""
    from jax.experimental import multihost_utils

    return multihost_utils.global_array_to_host_local_array(x, mesh, spec)
