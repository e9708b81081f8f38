"""Summarize a jax.profiler trace: top ops by total device time.

Usage: python scripts/trace_summary.py /tmp/xprof_dir [top_n]

Reads the Chrome-trace JSON (``plugins/profile/*/**.trace.json.gz``) that
``jax.profiler.trace`` / the CLIs' ``--xprof DIR`` flag write, groups the
complete events by process/thread lane, and prints per-lane totals plus the
top-N event names by summed duration — enough to see which XLA ops dominate
a device program without TensorBoard.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def load_events(trace_dir: str) -> tuple[list[dict], dict]:
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                                 recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    names: dict = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", str(e["pid"]))
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    return [e for e in events if e.get("ph") == "X"], names


def main() -> None:
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    events, names = load_events(trace_dir)

    lane_total: dict = collections.Counter()
    op_total: dict = collections.defaultdict(float)
    op_count: dict = collections.Counter()
    for e in events:
        pid = e.get("pid")
        lane = f"{names.get(pid, pid)}/{names.get((pid, e.get('tid')), e.get('tid'))}"
        dur = e.get("dur", 0) / 1e3  # us -> ms
        lane_total[lane] += dur
        key = (lane, e.get("name", "?"))
        op_total[key] += dur
        op_count[key] += 1

    print("== lanes by total time (ms) ==")
    for lane, tot in sorted(lane_total.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {tot:10.1f}  {lane}")

    print(f"\n== top {top_n} events by total time ==")
    rows = sorted(op_total.items(), key=lambda kv: -kv[1])[:top_n]
    for (lane, name), tot in rows:
        n = op_count[(lane, name)]
        print(f"  {tot:9.1f} ms  x{n:<6d} avg {tot / n:8.3f} ms  "
              f"[{lane.split('/', 1)[0][:28]}] {name[:110]}")


if __name__ == "__main__":
    main()
