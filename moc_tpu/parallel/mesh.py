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
AXIS_PIPE = "pipe"  # pipeline stages (train/pretrain_pipe.py); innermost so
#                     the per-microbatch ppermute transfers ride ICI neighbors

DEFAULT_AXES = (AXIS_DATA, AXIS_SEQ, AXIS_TENSOR, AXIS_EXPERT, AXIS_PIPE)


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
        # budget) produced half-empty meshes with no error
        raise ValueError(
            f"unknown mesh axes {unknown}; valid: {list(DEFAULT_AXES)}")
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


def make_hybrid_mesh(
    axis_sizes: Mapping[str, int],
    dcn_axes: Sequence[str] = (AXIS_DATA,),
    devices: Sequence | None = None,
    num_slices: int | None = None,
) -> Mesh:
    """Multi-slice mesh with DCN-crossing axes OUTERMOST.

    On multi-slice TPU deployments (several pods/slices joined by the
    data-center network), collectives along a mesh axis whose neighboring
    devices live in different slices ride DCN — orders of magnitude less
    bandwidth than ICI. The reference has no such topology awareness (its
    NCCL groups are flat rank splits, ``torchscale/component/xmoe/
    global_groups.py:11-61``); here the device array is laid out so that:

      * axes in ``dcn_axes`` (default: ``data`` — gradient/episode
        parallelism, whose collectives are small and latency-tolerant) vary
        ACROSS slices;
      * every other axis (``tensor``/``expert``/``seq`` — whose all-gathers,
        all-to-alls and reduce-scatters move activation-sized tensors every
        layer) varies WITHIN a slice, so those collectives stay on ICI.

    The product of ``dcn_axes`` sizes must equal the slice count; the
    remaining axes must multiply to the per-slice device count (one of
    either group may be ``-1`` to absorb the remainder). Slices come from
    each device's ``slice_index`` when the runtime exposes it; otherwise
    pass ``num_slices`` explicitly (also how CPU tests simulate slices —
    contiguous equal groups of the flat device list).
    """
    if devices is None:
        devices = jax.devices()
    unknown = sorted(set(axis_sizes) - set(DEFAULT_AXES))
    if unknown:
        raise ValueError(
            f"unknown mesh axes {unknown}; valid: {list(DEFAULT_AXES)}")
    bad_dcn = sorted(set(dcn_axes) - set(axis_sizes))
    if bad_dcn:
        raise ValueError(f"dcn_axes {bad_dcn} missing from axis_sizes")

    # group devices into slices (DCN islands)
    slice_ids = [getattr(d, "slice_index", None) for d in devices]
    if num_slices is None and all(s is not None for s in slice_ids):
        groups: dict[int, list] = {}
        for d, s in zip(devices, slice_ids):
            groups.setdefault(s, []).append(d)
        slices = [groups[k] for k in sorted(groups)]
    else:
        k = num_slices or 1
        if len(devices) % k:
            raise ValueError(f"{len(devices)} devices do not split into "
                             f"{k} equal slices")
        per = len(devices) // k
        slices = [list(devices[i * per : (i + 1) * per]) for i in range(k)]
    if len({len(s) for s in slices}) != 1:
        raise ValueError("slices have unequal device counts: "
                         f"{[len(s) for s in slices]}")
    n_slices, per_slice = len(slices), len(slices[0])

    def resolve(names: Sequence[str], budget: int, kind: str) -> dict[str, int]:
        sizes = {a: axis_sizes[a] for a in names}
        fill = [a for a, s in sizes.items() if s == -1]
        fixed = int(np.prod([s for s in sizes.values() if s != -1]))
        if len(fill) > 1:
            raise ValueError(f"only one {kind} axis may be -1, got {fill}")
        if fill:
            if budget % fixed:
                raise ValueError(f"{kind} axes {sizes} do not divide "
                                 f"{budget} devices")
            sizes[fill[0]] = budget // fixed
            fixed = budget
        if fixed != budget:
            raise ValueError(
                f"{kind} axes {sizes} multiply to {fixed}, need {budget} "
                f"({'slice count' if kind == 'dcn' else 'devices per slice'})")
        return sizes

    dcn_names = [a for a in DEFAULT_AXES if a in dcn_axes]
    ici_names = [a for a in DEFAULT_AXES
                 if a in axis_sizes and a not in dcn_axes]
    dcn_sizes = resolve(dcn_names, n_slices, "dcn")
    ici_sizes = resolve(ici_names, per_slice, "ici") if ici_names else {}

    # [n_slices, per_slice] → (dcn..., ici...): ici dims index within a
    # slice, so any walk along an ici axis never leaves its DCN island
    flat = np.empty((n_slices, per_slice), dtype=object)
    for i, s in enumerate(slices):
        flat[i, :] = s
    shape = tuple(dcn_sizes[a] for a in dcn_names) + tuple(
        ici_sizes[a] for a in ici_names)
    return Mesh(flat.reshape(shape), tuple(dcn_names + ici_names))


def shard_spec(mesh: Mesh, *axes: str | None) -> NamedSharding:
    """``NamedSharding`` for per-dimension axis names (None = replicated),
    skipping axes the mesh doesn't have."""
    names = [a if (a is None or a in mesh.axis_names) else None for a in axes]
    return NamedSharding(mesh, PartitionSpec(*names))


def local_slice(axis_name: str) -> int:
    """Current index along a mesh axis (inside shard_map/pjit)."""
    return jax.lax.axis_index(axis_name)
