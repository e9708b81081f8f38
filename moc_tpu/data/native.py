"""ctypes bindings for the native bag-packing runtime (``native/bagpack.cpp``).

Compiles on demand with g++ (cached next to the source), loads over a C ABI,
and degrades to the pure-numpy ``pack_bags`` path when no compiler is
available. ``pack_bags_native`` is a drop-in accelerator for
``moc_tpu.data.batching.pack_bags``'s host-side pad+stack step.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libbagpack.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "bagpack.cpp")

_lock = threading.Lock()
_lib: ctypes.CDLL | None | bool = None  # None=not tried, False=unavailable


def build_native(force: bool = False) -> str | None:
    """Compile ``bagpack.cpp`` → ``libbagpack.so``; returns the path or None.
    Rebuilds when the source is newer than the cached .so (new entry points
    would otherwise be missing symbols)."""
    if not os.path.exists(_SRC_PATH):
        return _SO_PATH if os.path.exists(_SO_PATH) else None
    if (os.path.exists(_SO_PATH) and not force
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH)):
        return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _SO_PATH, _SRC_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return _SO_PATH
    except (OSError, subprocess.SubprocessError):
        return None


def _load() -> ctypes.CDLL | None:
    global _lib
    with _lock:
        if _lib is None:
            path = build_native()
            if path is None:
                _lib = False
            else:
                lib = ctypes.CDLL(path)
                pp = ctypes.POINTER(ctypes.c_float)
                for name, src_t in (("pack_bags_f32", pp),
                                    ("pack_bags_f16", ctypes.POINTER(ctypes.c_uint16))):
                    fn = getattr(lib, name)
                    fn.restype = None
                    fn.argtypes = [
                        ctypes.POINTER(src_t), ctypes.POINTER(ctypes.c_int64),
                        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                        ctypes.POINTER(ctypes.c_float),
                        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                    ]
                i64p = ctypes.POINTER(ctypes.c_int64)
                gp = lib.gather_pack_f32
                gp.restype = None
                gp.argtypes = [ctypes.POINTER(pp), i64p, i64p, i64p,
                               ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                               pp, ctypes.c_int]
                qz = lib.quantize_rows_i8
                qz.restype = None
                qz.argtypes = [pp, ctypes.c_int64, ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_int8), pp, ctypes.c_int]
                _lib = lib
        return _lib or None


def native_available() -> bool:
    return _load() is not None


def pack_bags_native(
    features: Sequence[np.ndarray],
    n_pad: int,
    n_threads: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Pad+stack feature arrays → ``(features [B, n_pad, D] f32, mask [B,
    n_pad] bool)`` using the native kernel; numpy fallback otherwise."""
    b = len(features)
    if b == 0:
        return np.zeros((0, n_pad, 0), np.float32), np.zeros((0, n_pad), bool)
    d = features[0].shape[1]
    lib = _load()
    dtype = features[0].dtype
    if lib is None or dtype not in (np.float32, np.float16):
        out = np.zeros((b, n_pad, d), np.float32)
        mask = np.zeros((b, n_pad), bool)
        for i, f in enumerate(features):
            n = min(len(f), n_pad)
            out[i, :n] = f[:n]
            mask[i, :n] = True
        return out, mask

    arrays = [np.ascontiguousarray(f) for f in features]
    lengths = np.asarray([len(f) for f in arrays], np.int64)
    out = np.empty((b, n_pad, d), np.float32)
    mask = np.empty((b, n_pad), np.uint8)
    if dtype == np.float32:
        elem_t = ctypes.c_float
        fn = lib.pack_bags_f32
    else:
        elem_t = ctypes.c_uint16
        fn = lib.pack_bags_f16
    ptr_t = ctypes.POINTER(elem_t)
    ptrs = (ptr_t * b)(*[a.ctypes.data_as(ptr_t) for a in arrays])
    fn(
        ptrs,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, d, n_pad,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
    )
    return out, mask.astype(bool)


def quantize_rows_i8(x: np.ndarray, n_threads: int = 8
                     ) -> tuple[np.ndarray, np.ndarray] | None:
    """Native per-row symmetric int8 quantization of ``[..., N, D]`` f32
    features → ``(q int8, scales f32[..., N])``; None when the native lib is
    unavailable or the input isn't contiguous f32 (caller uses numpy).
    Bit-identical to the numpy formulation (half-to-even rounding; tested).
    """
    lib = _load()
    if lib is None or x.dtype != np.float32 or not x.flags.c_contiguous \
            or x.ndim < 2:
        return None
    dim = x.shape[-1]
    rows = int(np.prod(x.shape[:-1], dtype=np.int64))
    q = np.empty(x.shape, np.int8)
    scales = np.empty(x.shape[:-1], np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.quantize_rows_i8(
        x.ctypes.data_as(fp), rows, dim,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        scales.ctypes.data_as(fp), n_threads,
    )
    return q, scales


def gather_pack_f32(srcs: Sequence[np.ndarray], ncols: Sequence[int],
                    dst_row_off: Sequence[int], dst: np.ndarray,
                    n_threads: int = 8) -> bool:
    """Threaded sweep-stack gather: copy each contiguous f32 chunk
    ``srcs[i] [rows_i, ncols_i, D]`` into ``dst[dst_row_off[i]:, :, :]``
    (``dst [total_rows, n_pad, D]``), zero-filling the column tail per row.

    Returns False (caller must use the numpy path) when the native lib is
    unavailable or any chunk is non-contiguous/non-f32."""
    lib = _load()
    if lib is None or not srcs:
        return False
    if dst.dtype != np.float32 or not dst.flags.c_contiguous:
        return False
    for a in srcs:
        if a.dtype != np.float32 or not a.flags.c_contiguous:
            return False
    b = len(srcs)
    rows = np.asarray([a.shape[0] for a in srcs], np.int64)
    cols = np.asarray(ncols, np.int64)
    offs = np.asarray(dst_row_off, np.int64)
    ptr_t = ctypes.POINTER(ctypes.c_float)
    ptrs = (ptr_t * b)(*[a.ctypes.data_as(ptr_t) for a in srcs])
    i64 = ctypes.POINTER(ctypes.c_int64)
    lib.gather_pack_f32(
        ptrs, rows.ctypes.data_as(i64), cols.ctypes.data_as(i64),
        offs.ctypes.data_as(i64), b, dst.shape[1], dst.shape[2],
        dst.ctypes.data_as(ptr_t), n_threads,
    )
    return True
