"""Reliable device timing, including through remote-TPU tunnels.

On some PJRT transports (e.g. the axon remote-TPU tunnel used in this
environment) ``block_until_ready`` returns before device execution actually
completes — only fetching result bytes to the host synchronizes. ``device_time``
therefore times a *fetch* after K enqueued executions and uses the slope
between two K values, which cancels both the fixed tunnel latency and the
dispatch overhead:

    t(K) = latency + K · t_op   ⇒   t_op = (t(K2) − t(K1)) / (K2 − K1)

TPU devices execute enqueued programs in order, so fetching the last result
transitively waits on all earlier ones.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import numpy as np


def _run_k(fn: Callable, args: Sequence, k: int) -> float:
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn(*args)
    leaf = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(leaf.ravel()[:1])  # force full materialization + host fetch
    return time.perf_counter() - t0


def device_time(fn: Callable, *args, iters: int = 10, warmup: int = 2,
                repeats: int = 3, reduce: str = "best") -> float:
    """Seconds per call of ``fn(*args)`` (jitted), tunnel-latency corrected.

    ``reduce="best"`` (min over repeats) is right for micro-comparisons;
    ``"median"`` is right for reported headline numbers — the tunnel
    occasionally under-measures a repeat badly (4× throughput mirages were
    observed), and the minimum amplifies exactly those glitches."""
    for _ in range(warmup):
        _run_k(fn, args, 1)
    samples = []
    for _ in range(repeats):
        t1 = _run_k(fn, args, 1)
        tk = _run_k(fn, args, 1 + iters)
        samples.append(max((tk - t1) / iters, 1e-9))
    if reduce == "median":
        return float(np.median(samples))
    if reduce != "best":
        raise ValueError(f"unknown reduce {reduce!r} (use 'best' or 'median')")
    return min(samples)
