"""Attribute device time in a saved XProf trace to source lines.

Usage: python tools/line_attrib.py /tmp/trace_dir [--steps N] [--top N]

Each "XLA Ops" device event embeds its HLO long_name, whose metadata
carries op_name + source_file/source_line. Groups per-step device time
by source location (and prints the op-name stem for context) so a trace
answers "which line of OUR code does this 5 ms fusion come from".
Fusions credit the location of their root instruction's metadata.
"""
import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sndepth_tpu.utils.xplane import load_trace_events

ap = argparse.ArgumentParser()
ap.add_argument("trace_dir")
ap.add_argument("--steps", type=int, default=3)
ap.add_argument("--top", type=int, default=50)
ap.add_argument("--hlo", default="", help="optimized-HLO text dump; used "
                "to resolve op metadata when trace long_names lack it")
a = ap.parse_args()

hlo_meta = {}
if a.hlo:
    # Map instruction name -> its metadata={...} string. Covers both
    # '%name = ...' defs and fusion roots.
    name_re = re.compile(r"^\s+(?:ROOT )?%([\w.\-]+) = .*?"
                         r"(metadata=\{[^}]*\})", re.M)
    with open(a.hlo) as f:
        txt = f.read()
    for m in name_re.finditer(txt):
        hlo_meta[m.group(1)] = m.group(2)

evs = load_trace_events(a.trace_dir)
device_pids, line_tids = set(), {}
for e in evs:
    if e.get("ph") == "M":
        if (e.get("name") == "process_name"
                and e["args"]["name"].startswith("/device:")):
            device_pids.add(e["pid"])
        elif e.get("name") == "thread_name":
            line_tids[(e["pid"], e["tid"])] = e["args"]["name"]

meta_re = re.compile(
    r'op_name="([^"]*)"(?:[^}]*?source_file="?([^" ]+)"?'
    r'[^}]*?source_line=(\d+))?')

tot = collections.defaultdict(float)
long_names = {}
for e in evs:
    if e.get("ph") != "X" or e["pid"] not in device_pids:
        continue
    if line_tids.get((e["pid"], e["tid"])) != "XLA Ops":
        continue
    tot[e["name"]] += e.get("dur", 0.0)
    ln = e.get("args", {}).get("long_name")
    if ln:
        long_names.setdefault(e["name"], ln)

by_loc = collections.defaultdict(float)
loc_ops = collections.defaultdict(collections.Counter)
for name, us in tot.items():
    ln = long_names.get(name, "")
    if name in hlo_meta and "op_name=" not in (ln or ""):
        ln = (ln or "") + " " + hlo_meta[name]
    m = meta_re.search(ln or "")
    if m and m.group(2):
        sf = m.group(2)
        sf = "/".join(sf.split("/")[-2:])
        loc = f"{sf}:{m.group(3)}"
        opn = m.group(1)
    elif m:
        loc = "(no-source) " + m.group(1)[:80]
        opn = m.group(1)
    else:
        loc = "(no-metadata) " + name.split(".")[0]
        opn = name
    by_loc[loc] += us
    # keep the op-name tail (the most specific module path segment)
    loc_ops[loc][opn.split("/")[-1][:40] + " :: " + name] += us

print(f"== per-step ms by source line (/{a.steps}) ==")
for loc, us in sorted(by_loc.items(), key=lambda kv: -kv[1])[:a.top]:
    ops = "; ".join(f"{o}={u/1e3/a.steps:.2f}"
                    for o, u in loc_ops[loc].most_common(3))
    print(f"  {us/1e3/a.steps:8.2f}  {loc}")
    print(f"            {ops}")
print(f"  {sum(by_loc.values())/1e3/a.steps:8.2f}  TOTAL")
