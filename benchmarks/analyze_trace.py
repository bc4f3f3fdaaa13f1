"""Summarize a jax.profiler trace: top device ops by total time.

Usage: python benchmarks/analyze_trace.py <trace_dir>
(trace_dir = the directory passed to Trainer.profile_epoch / utils.trace)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def load_events(trace_dir: str) -> list[dict]:
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    files: list[str] = []
    for p in pats:
        files.extend(glob.glob(p, recursive=True))
    events = []
    for f in files:
        opener = gzip.open if f.endswith(".gz") else open
        with opener(f, "rt") as fh:
            data = json.load(fh)
        events.extend(data.get("traceEvents", []))
    return events


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    events = load_events(sys.argv[1])
    if not events:
        print("no trace events found")
        return 1

    # Identify DEVICE tracks from the trace's process metadata — host-thread
    # events (python callables, TSL runtime spans) share the same "X" phase
    # and would otherwise inflate totals and misrank the table.
    device_pids: set = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = str(e.get("args", {}).get("name", ""))
            if any(k in pname for k in ("TPU", "GPU", "/device:", "XLA")):
                device_pids.add(e.get("pid"))

    # keep complete events ("X") on device tracks (XLA ops)
    by_name: dict[str, float] = collections.defaultdict(float)
    count: dict[str, int] = collections.defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith(("$", "process_", "thread_")):
            continue
        dur = float(e["dur"])  # microseconds
        by_name[name] += dur
        count[name] += 1
        total += dur
    if not device_pids:
        print("(no device process metadata found; summing ALL trace tracks)")

    print(f"{'total_us':>12} {'calls':>7} {'%':>6}  op")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur:12.0f} {count[name]:7d} {100 * dur / total:6.2f}  {name[:100]}")
    print(f"\nsum of op durations: {total / 1e3:.1f} ms across {len(by_name)} distinct ops")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
