"""Padded, masked bag batches with bucketed static shapes.

The reference feeds models one variable-length ``[N, D]`` bag at a time
(batch-1 loaders, ``/root/reference/utils/utils.py:154-215``) — shape
polymorphism that would force an XLA recompile per slide. Here bags are padded
to a small set of *bucket* sizes so each bucket compiles once, and every op
downstream consumes a ``[B, N, D]`` batch plus a ``[B, N]`` validity mask
(vmappable, shardable on a mesh ``data`` axis).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from moc_tpu.data.bags import Bag

# Bucket boundaries for patch counts. Geometric-ish so at most ~2x padding
# waste; multiples of 512 keep the sublane dimension tile-aligned for both
# f32 (8) and bf16 (16) tiles.
DEFAULT_BUCKETS: tuple[int, ...] = (512, 1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072)


@struct.dataclass
class BagBatch:
    """A batch of padded bags — the universal on-device input format.

    Attributes:
      features:  ``[B, N, D]`` patch embeddings (pad rows are zero).
      mask:      ``[B, N]`` bool, True on real patches.
      labels:    ``[B]`` int32 slide labels (-1 when unknown).
      n_patches: ``[B]`` int32 true patch counts.
      coords:    ``[B, N, 2]`` int32 patch coordinates or None.
      scales:    ``[B, N]`` f32 per-row dequantization scales when
                 ``features`` is the int8-resident serving tier
                 (``features ~= q * scales[..., None]``), else None.
    """

    features: jax.Array
    mask: jax.Array
    labels: jax.Array
    n_patches: jax.Array
    coords: jax.Array | None = None
    scales: jax.Array | None = None

    @property
    def batch_size(self) -> int:
        return self.features.shape[0]

    @property
    def padded_len(self) -> int:
        return self.features.shape[1]

    def __len__(self) -> int:
        return self.batch_size

    def real_rows(self):
        """Host bool ``[B]``: True on real slides, False on bucketization
        filler rows (label ``-1``, all-False mask). THE single definition of
        the filler convention — the sweep stackers and the fused-mode HBM
        estimate all key off this, so a sentinel change stays in one place."""
        return np.asarray(self.labels) >= 0

    def slice_batch(self, start: int, size: int) -> "BagBatch":
        return jax.tree.map(lambda x: x[start : start + size], self)


def bucket_size(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket ≥ n; beyond the largest bucket, round up to 512."""
    for b in buckets:
        if n <= b:
            return b
    return int(-(-n // 512) * 512)


def pad_bag(
    features: np.ndarray,
    n_pad: int,
    coords: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Pad one bag's features (and coords) to ``n_pad`` rows with a mask."""
    n = features.shape[0]
    if n > n_pad:
        raise ValueError(f"bag with {n} patches does not fit pad size {n_pad}")
    mask = np.zeros((n_pad,), dtype=bool)
    mask[:n] = True
    out = np.zeros((n_pad,) + features.shape[1:], dtype=features.dtype)
    out[:n] = features
    out_coords = None
    if coords is not None:
        out_coords = np.zeros((n_pad,) + coords.shape[1:], dtype=coords.dtype)
        out_coords[:n] = coords
    return out, mask, out_coords


def pack_bags(
    bags: Sequence[Bag],
    *,
    n_pad: int | None = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    dtype: jnp.dtype = jnp.float32,
    with_coords: bool = False,
    device_put: bool = True,
) -> BagBatch:
    """Pad a list of bags to a common bucketed length and stack to a batch."""
    if not bags:
        raise ValueError("pack_bags needs at least one bag")
    max_n = max(b.n_patches for b in bags)
    if n_pad is None:
        n_pad = bucket_size(max_n, buckets)
    elif max_n > n_pad:
        # the packers would silently TRUNCATE (all-True mask over dropped
        # patches, n_patches > padded_len) — fail loudly like pad_bag does
        long = [b.slide_id for b in bags if b.n_patches > n_pad]
        raise ValueError(
            f"bags longer than n_pad={n_pad}: {long[:5]} (max {max_n}); "
            "raise n_pad/bag_size or subsample the bags first")
    dims = {b.features.shape[1] for b in bags}
    if len(dims) > 1:
        # the native packer memcpys lengths[i]*dim floats assuming uniform D
        # — mixed-extractor bags would read out of bounds (silent garbage)
        raise ValueError(
            f"bags mix feature dims {sorted(dims)}; one batch must come "
            "from one extractor")
    from moc_tpu.data.native import pack_bags_native

    features, mask = pack_bags_native([b.features for b in bags], n_pad)
    scales = None
    if np.dtype(dtype) == np.int8:
        # int8-resident serving tier: per-row symmetric quantization at pack
        # time (pad rows are all-zero -> scale 0 -> dequant exactly 0)
        from moc_tpu.ops.quant import quantize_rows_host

        features, scales = quantize_rows_host(features)
    coords_list = []
    if with_coords:
        for b in bags:
            if b.coords is not None:
                cc = np.zeros((n_pad,) + b.coords.shape[1:], b.coords.dtype)
                n = min(b.n_patches, n_pad)
                cc[:n] = b.coords[:n]
                coords_list.append(cc)
            else:
                coords_list.append(None)
    labels = np.asarray([b.label if b.label is not None else -1 for b in bags], np.int32)
    n_patches = np.asarray([b.n_patches for b in bags], np.int32)
    coords = None
    if with_coords and any(c is not None for c in coords_list):
        if not all(c is not None for c in coords_list):
            # a silent batch-wide None here would detach coords far from
            # the one coord-less bag that caused it
            missing = [b.slide_id for b, c in zip(bags, coords_list)
                       if c is None]
            raise ValueError(
                f"with_coords=True but bags lack coords: {missing[:5]} "
                "(mixing h5 and coord-less pt bags in one batch)")
        coords = np.stack(coords_list)
    if not device_put:
        # host-resident batch: numpy leaves transfer lazily at each jit call
        # (bounds device memory to one in-flight chunk; the path for eval
        # splits larger than the HBM budget)
        return BagBatch(
            features=features.astype(np.dtype(dtype), copy=False),
            mask=mask, labels=labels, n_patches=n_patches, coords=coords,
            scales=scales,
        )
    return jax.device_put(BagBatch(
        features=jnp.asarray(features, dtype),
        mask=jnp.asarray(mask),
        labels=jnp.asarray(labels),
        n_patches=jnp.asarray(n_patches),
        coords=jnp.asarray(coords) if coords is not None else None,
        scales=jnp.asarray(scales) if scales is not None else None,
    ))


def bucketize(bags: Sequence[Bag], buckets: Sequence[int] = DEFAULT_BUCKETS) -> dict[int, list[Bag]]:
    """Group bags by their padded bucket size (one compile per bucket)."""
    out: dict[int, list[Bag]] = {}
    for b in bags:
        out.setdefault(bucket_size(b.n_patches, buckets), []).append(b)
    return out
