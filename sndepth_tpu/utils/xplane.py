"""XProf trace summarization: per-op device time from a captured trace.

The reference has no profiling at all (survey §5 — wall-clock prints only,
`/root/reference/models/baseline.py:1209-1212`). Here, traces captured with
:func:`sndepth_tpu.utils.profiling.capture_trace` are parsed into a per-op
device-time table so hot spots are measured, not guessed. This matters
doubly on this environment's remote-TPU runtime, where host-side timing is
untrustworthy (see CLAUDE.md "Benchmark traps") — the device plane of the
trace is the only ground truth.

Usage:
    python -m sndepth_tpu.utils.xplane /tmp/my_trace_dir [--top 30]
or:
    from sndepth_tpu.utils.xplane import summarize_trace
    rows = summarize_trace(log_dir)      # [(op_name, total_us, count), ...]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Any


def _latest_trace_json(log_dir: str) -> str:
    pats = [os.path.join(log_dir, "plugins", "profile", "*", "*.trace.json.gz"),
            os.path.join(log_dir, "*.trace.json.gz")]
    hits: list[str] = []
    for p in pats:
        hits.extend(glob.glob(p))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    return max(hits, key=os.path.getmtime)


def load_trace_events(log_dir: str) -> list[dict[str, Any]]:
    path = _latest_trace_json(log_dir)
    with gzip.open(path, "rt") as f:
        return json.load(f)["traceEvents"]


def summarize_trace(log_dir: str, line: str = "XLA Ops"):
    """Aggregate device-plane events into (name, total_us, count) rows.

    ``line`` selects the trace line: "XLA Ops" for per-HLO-op timings,
    "XLA Modules" for whole-executable timings. Only events from
    ``/device:*`` processes are counted (host python frames are noise).
    """
    evs = load_trace_events(log_dir)
    device_pids = set()
    line_tids = {}
    for e in evs:
        if e.get("ph") == "M":
            if e.get("name") == "process_name" and \
                    e["args"]["name"].startswith("/device:"):
                device_pids.add(e["pid"])
            elif e.get("name") == "thread_name":
                line_tids[(e["pid"], e["tid"])] = e["args"]["name"]

    total = collections.defaultdict(float)
    count = collections.defaultdict(int)
    for e in evs:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        if line_tids.get((e["pid"], e["tid"])) != line:
            continue
        total[e["name"]] += e.get("dur", 0.0)
        count[e["name"]] += 1
    rows = [(name, total[name], count[name]) for name in total]
    rows.sort(key=lambda r: -r[1])
    return rows


def op_details(log_dir: str, op_name: str) -> list[str]:
    """Return the long_name (HLO text) of every device event matching op."""
    evs = load_trace_events(log_dir)
    out = []
    for e in evs:
        if e.get("ph") == "X" and e.get("name") == op_name:
            ln = e.get("args", {}).get("long_name")
            if ln and ln not in out:
                out.append(ln)
    return out


def print_summary(log_dir: str, top: int = 30, line: str = "XLA Ops") -> None:
    rows = summarize_trace(log_dir, line=line)
    grand = sum(r[1] for r in rows)
    print(f"{'op':<60} {'total_ms':>10} {'count':>7} {'%':>6}")
    for name, us, n in rows[:top]:
        print(f"{name[:60]:<60} {us / 1e3:>10.3f} {n:>7} "
              f"{100.0 * us / grand if grand else 0:>5.1f}%")
    print(f"{'TOTAL':<60} {grand / 1e3:>10.3f}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--line", default="XLA Ops")
    ap.add_argument("--detail", default=None,
                    help="print HLO long_name(s) for this op")
    args = ap.parse_args()
    if args.detail:
        for ln in op_details(args.log_dir, args.detail):
            print(ln)
            print("-" * 80)
    else:
        print_summary(args.log_dir, top=args.top, line=args.line)
