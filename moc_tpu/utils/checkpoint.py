"""Parameter checkpointing: flax msgpack files + orbax directories.

The reference checkpoints with ``torch.save(model.state_dict())`` on
val-improvement and reloads at the end (``main_moc.py:628``,
``core_utils.py:94-102,255-258``); eval-time loading strips DataParallel
``.module`` prefixes and instance-loss keys (``eval_utils.py:49-57``) —
concerns that don't exist here (pure pytrees). Two formats:

  * ``save_params``/``load_params`` — single-file msgpack via
    flax.serialization (the ``best_model_*.msgpack`` files the CLI writes);
  * ``save_checkpoint``/``restore_checkpoint`` — orbax directories for
    large/sharded trees (the distributed pretrain path), including optimizer
    state, with step-based retention.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_params(path: str, params: Any) -> str:
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    return path


def load_params(path: str, template: Any) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_checkpoint(directory: str, step: int, tree: Any, *, keep: int = 3) -> str:
    """Orbax checkpoint of an arbitrary pytree (params + opt state + ...).

    Multi-process runtimes (``parallel.runtime``) hand orbax the live
    ``jax.Array`` leaves — orbax writes each host's addressable shards and
    coordinates the commit; a ``device_get`` would raise on any leaf sharded
    across processes (non-fully-addressable). Single-process keeps the host
    copy (cheap, and decouples the write from donated device buffers)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    if jax.process_count() == 1:
        tree = jax.device_get(tree)
    with ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(tree))
    return os.path.join(directory, str(step))


def restore_checkpoint(directory: str, template: Any, step: int | None = None) -> Any:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    with ocp.CheckpointManager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        return mgr.restore(step, args=ocp.args.StandardRestore(template))


def latest_step(directory: str) -> int | None:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    with ocp.CheckpointManager(directory) as mgr:
        return mgr.latest_step()
