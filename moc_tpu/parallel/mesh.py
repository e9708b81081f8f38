"""Mesh construction and sharding helpers.

Canonical axis names used throughout the framework (the TPU equivalent of
the reference's process-group topology, ``torchscale/component/xmoe/
global_groups.py``):

  * ``data``   — batch / episode parallelism (the reference's bash fan-out
    of (fold, shot) processes and DDP groups);
  * ``seq``    — sequence/context parallelism (LongNet ``seq_parallel``);
  * ``tensor`` — tensor parallelism for wide projections (absent in the
    reference; first-class here);
  * ``expert`` — MoE expert parallelism (GShard all2all groups).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_TENSOR = "tensor"
AXIS_EXPERT = "expert"

DEFAULT_AXES = (AXIS_DATA, AXIS_SEQ, AXIS_TENSOR, AXIS_EXPERT)


def make_mesh(axis_sizes: Mapping[str, int] | None = None,
              devices: Sequence | None = None) -> Mesh:
    """Build a mesh over ``devices`` with the given axis sizes.

    Unspecified axes get size 1; one unspecified-or--1 axis absorbs the
    remaining devices. Example: ``make_mesh({"data": -1, "expert": 2})`` on 8
    devices → data=4, expert=2 mesh.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    sizes = dict(axis_sizes or {AXIS_DATA: n})
    unknown = sorted(set(sizes) - set(DEFAULT_AXES))
    if unknown:
        # silently dropping a name (while its size still fed the device
        # budget) produced half-empty meshes with no error; "pipe" is a
        # per-module shard_map axis (parallel/pipeline.py), not a mesh axis
        raise ValueError(
            f"unknown mesh axes {unknown}; valid: {list(DEFAULT_AXES)} "
            "(pipeline stages use parallel.pipeline's own axis, not the mesh)")
    names = [a for a in DEFAULT_AXES if a in sizes] or [AXIS_DATA]
    fill = [a for a in names if sizes.get(a, 1) == -1]
    fixed = int(np.prod([s for s in sizes.values() if s != -1]))
    if fill:
        assert len(fill) == 1, "only one axis may be -1"
        assert n % fixed == 0, (n, sizes)
        sizes[fill[0]] = n // fixed
        fixed = n
    assert fixed <= n, f"mesh {sizes} needs {fixed} devices, have {n}"
    shape = tuple(sizes[a] for a in names)
    dev_array = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, tuple(names))


def shard_spec(mesh: Mesh, *axes: str | None) -> NamedSharding:
    """``NamedSharding`` for per-dimension axis names (None = replicated),
    skipping axes the mesh doesn't have."""
    names = [a if (a is None or a in mesh.axis_names) else None for a in axes]
    return NamedSharding(mesh, PartitionSpec(*names))


def local_slice(axis_name: str) -> int:
    """Current index along a mesh axis (inside shard_map/pjit)."""
    return jax.lax.axis_index(axis_name)
