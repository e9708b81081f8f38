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
    """Orbax checkpoint of an arbitrary pytree (params + opt state + ...)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(jax.device_get(tree)))
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
