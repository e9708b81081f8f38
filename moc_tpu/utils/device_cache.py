"""Process-lifetime device-resident array cache.

Repeated sweep/serving invocations in one process re-ship the SAME feature
pool through the host->device link every call (the reference's
process-per-episode protocol re-reads features from disk each time,
``/root/reference/scripts/moc_train.sh:23-79``); on tunnel- or DCN-attached
hosts that transfer IS the wall-clock (BENCH_NOTES "Round 3 (final)": 268 MB
at 7-40 MB/s ≈ the whole warm draw). Keying by a content fingerprint of the
host bytes makes the cache safe by construction — mutated or different data
can never alias a stale device buffer — while identical corpora (the common
case: every shot/fold/draw of a sweep) reuse the committed arrays for free.

Hashing costs ~0.3 s/GB on one core (blake2b over the raw buffer), orders of
magnitude below the transfer it replaces. HBM held by the cache is bounded:
one entry — a new fingerprint evicts the previous pool. Disable with
``MOC_TPU_DEVICE_CACHE=0``.
"""

from __future__ import annotations

import hashlib
import os
import weakref

import numpy as np

_cache: dict[bytes, tuple] = {}
# id(arr) -> (weakref, digest): re-hashing an unchanged pool every draw costs
# ~0.45 s per 256 MB on this host's single core. Digests are memoized ONLY
# for arrays marked read-only (``flags.writeable == False`` — mutating one
# raises, so the content backing a memoized digest cannot change); the
# weakref guards id() reuse after garbage collection.
_digest_memo: dict[int, tuple] = {}


def _array_digest(a: np.ndarray) -> bytes:
    a = np.ascontiguousarray(a)
    memo_ok = isinstance(a, np.ndarray) and not a.flags.writeable
    if memo_ok:
        ent = _digest_memo.get(id(a))
        if ent is not None and ent[0]() is a:
            return ent[1]
    h = hashlib.blake2b(digest_size=16)
    h.update(repr((a.shape, a.dtype.str)).encode())
    h.update(memoryview(a).cast("B"))
    d = h.digest()
    if memo_ok:
        if len(_digest_memo) > 64:  # prune dead refs / bound the map
            for k in [k for k, (r, _) in _digest_memo.items() if r() is None]:
                del _digest_memo[k]
        _digest_memo[id(a)] = (weakref.ref(a), d)
    return d


def _fingerprint(arrays, extra: bytes) -> bytes:
    h = hashlib.blake2b(extra, digest_size=16)
    for a in arrays:
        h.update(_array_digest(a))
    return h.digest()


def cache_enabled() -> bool:
    return os.environ.get("MOC_TPU_DEVICE_CACHE", "1") != "0"


def device_put_cached(*arrays, extra: bytes = b""):
    """``jax.device_put`` each host array, reusing live device buffers when
    the content fingerprint matches the previous call.

    Returns ``(device_arrays, hit)``. ``extra`` salts the key (e.g. a
    placement/sharding tag) so equal bytes bound for different layouts
    don't collide. Buffers deleted on-device (donated/freed) miss cleanly.
    """
    import jax

    if not cache_enabled():
        return tuple(jax.device_put(a) for a in arrays), False
    key = _fingerprint(arrays, extra)
    hit = _cache.get(key)
    if hit is not None and not any(d.is_deleted() for d in hit):
        return hit, True
    put = tuple(jax.device_put(a) for a in arrays)
    _cache.clear()  # bound HBM: the newest pool evicts the previous one
    _cache[key] = put
    return put, False


def clear_device_cache() -> None:
    _cache.clear()
