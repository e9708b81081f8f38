"""Profiling and NaN-tripwire utilities.

The reference's observability is TensorBoard scalars plus CUDA-event
all-to-all timing inside the MoE layer (SURVEY.md §5.1). TPU-native
equivalents: ``jax.profiler`` traces (viewable in TensorBoard/XProf, with
per-collective timing already attributed by the runtime), named trace
annotations, and NaN tripwires replacing the reference's ``detect_nan``
helper (``utils/utils.py:20-25``).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace around a block:
    ``with trace('/tmp/tb'): step(...)`` → open in TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for trace timelines (collectives inside the region are
    attributed to it)."""
    return jax.profiler.TraceAnnotation(name)


def detect_nan(x, name: str = "tensor") -> bool:
    """Host-side NaN check (ref ``detect_nan``): returns True and prints if
    any element is non-finite."""
    import numpy as np

    bad = not np.all(np.isfinite(np.asarray(x)))
    if bad:
        print(f"[nan-tripwire] non-finite values in {name}")
    return bad


def assert_finite(x, name: str = "tensor"):
    """In-graph tripwire: raises under ``jax.debug_nans``-style checking via
    checkify-free error (debug callback)."""

    def cb(arr):
        import numpy as np

        if not np.all(np.isfinite(arr)):
            raise FloatingPointError(f"non-finite values in {name}")

    jax.debug.callback(cb, x)
    return x


def enable_nan_checks(enable: bool = True) -> None:
    """Global NaN debugging (the TPU replacement for sprinkled detect_nan
    calls): every jit computation re-runs eagerly on NaN production."""
    jax.config.update("jax_debug_nans", enable)
