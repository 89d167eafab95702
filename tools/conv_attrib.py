"""Attribute device time in a saved XProf trace to conv shapes.

Usage: python tools/conv_attrib.py /tmp/trace_dir [--steps N]

Joins each "XLA Ops" device event with its embedded HLO long_name and
buckets time into conv (by operand shapes), pallas custom-calls, and the
rest. Times printed are per-step (total / --steps)."""
import argparse, collections, re, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sndepth_tpu.utils.xplane import load_trace_events

ap = argparse.ArgumentParser()
ap.add_argument("trace_dir")
ap.add_argument("--steps", type=int, default=3)
ap.add_argument("--top", type=int, default=40)
a = ap.parse_args()

evs = load_trace_events(a.trace_dir)
device_pids, line_tids = set(), {}
for e in evs:
    if e.get("ph") == "M":
        if e.get("name") == "process_name" and e["args"]["name"].startswith("/device:"):
            device_pids.add(e["pid"])
        elif e.get("name") == "thread_name":
            line_tids[(e["pid"], e["tid"])] = e["args"]["name"]

# one representative long_name per op name
long_names = {}
tot = collections.defaultdict(float)
for e in evs:
    if e.get("ph") != "X" or e["pid"] not in device_pids: continue
    if line_tids.get((e["pid"], e["tid"])) != "XLA Ops": continue
    tot[e["name"]] += e.get("dur", 0.0)
    ln = e.get("args", {}).get("long_name")
    if ln: long_names.setdefault(e["name"], ln)

conv_re = re.compile(r"convolution\(|%convolution")
shape_re = re.compile(r"(bf16|f32)\[([\d,]+)\]\{[\d,]*\}\s+(?:%)?convolution")

def classify(name, ln):
    if ln is None: return ("unknown:" + name.split(".")[0], None)
    if "custom-call" in ln and ("tpu_custom_call" in ln or "Mosaic" in ln):
        return ("pallas", None)
    if conv_re.search(ln):
        # pull the convolution output shape and window from the long name
        m = re.search(r"convolution\(.*", ln)
        return ("conv", ln)
    for k in ("reduce-window", "scatter", "gather", "sort", "transpose",
              "reduce(", "copy(", "reverse(", "dynamic-slice", "dot("):
        if k in ln: return (k.rstrip("("), None)
    return ("elementwise/other", None)

groups = collections.defaultdict(float)
conv_rows = collections.defaultdict(float)
conv_info = {}
for name, us in tot.items():
    ln = long_names.get(name)
    g, extra = classify(name, ln)
    groups[g] += us
    if g == "conv":
        # key by the convolution instruction signature inside the fusion
        mm = re.findall(r"[%\w.\-]*convolution[\w.\-]*\s*=\s*(\S+)\[([\d,]+)\][^ ]* convolution\(([^)]*)\)[^\\n]*?window=\{([^}]*)\}[^\\n]*?dim_labels=(\S+)", ln)
        if mm:
            key = "; ".join(f"{d}[{s}] win={w} {dl}" for d, s, _, w, dl in mm[:2])
        else:
            key = (ln[:140]).replace("\n", " ")
        conv_rows[key] += us
        conv_info[key] = name

steps = a.steps
print(f"== groups (per-step ms, /{steps}) ==")
for g, us in sorted(groups.items(), key=lambda kv: -kv[1]):
    print(f"  {us/1e3/steps:8.2f}  {g}")
print(f"  {sum(groups.values())/1e3/steps:8.2f}  TOTAL")
print("== conv breakdown ==")
for k, us in sorted(conv_rows.items(), key=lambda kv: -kv[1])[:a.top]:
    print(f"  {us/1e3/steps:8.2f}  {conv_info[k]:<16} {k[:160]}")
